// Stochastic geometric-acoustics RIR synthesizer (native engine).
//
// Plays the role RLRAudioPropagation (the C++ bidirectional ray tracer
// embedded in habitat-sim) plays for the reference platform
// (SoundSpaces2.md; soundspaces/continuous_simulator.py:115-126): generate
// room impulse responses from scene geometry with configurable ray counts,
// frequency-band absorption and binaural spatialization — here as an
// offline bank builder producing the HBM-resident RIR tensors the TPU
// environment consumes.
//
// Model (2.5-D, matched to the platform's grid scenes):
//  - scene geometry = walkable-cell occupancy grid (walls at free->blocked
//    transitions), ceiling/floor as statistical extra absorption;
//  - per-CELL material classes: an optional uint8 material-id grid indexes
//    a table of (absorption[4], scattering, transmission[4]) coefficients —
//    the role of the reference's per-category material JSON
//    (scripts/mp3d_acoustic_properties.py:12-414 feeding the tracer via
//    mp3d_material_config.json);
//  - direct path: distance delay, 1/r attenuation, Woodworth ITD + sin ILD
//    per ear, per 90-degree heading;
//  - early + late field: energy rays marched from the source through the
//    grid (DDA), specular reflection with per-band absorption and
//    scattering jitter at wall hits; energy deposited when a ray passes
//    within the receiver radius, at time = path_length / c;
//  - TRANSMISSION (the reference default-enables it,
//    continuous_simulator.py:125 `acousticsConfig.transmission = True`):
//    at a wall hit the surviving (1-a) energy splits t : (1-t) between a
//    ray continuing straight through the occluder and the specular
//    reflection, resolved by unbiased Russian roulette on mean(t);
//  - first-order edge DIFFRACTION: convex occupancy corners are diffracting
//    edges; for shadowed (source, receiver) pairs every corner with clear
//    line-of-sight legs contributes a delayed arrival attenuated by an
//    exponential-in-deflection-angle shadow factor, stronger at high bands
//    (the UTD shadow-zone shape the reference engine models);
//  - per-band energy envelopes -> pressure via sqrt(E) * band-filtered
//    noise with deterministic per-(source,receiver) phase;
//  - AMBISONICS channel layout (SoundSpaces2.md ChannelLayoutType table):
//    rays accumulate direction-weighted energy; synthesis emits ACN/SN3D
//    spherical-harmonic IRs (order 1 or 2) whose W/X/Y envelopes follow the
//    per-sample intensity direction — decoded to binaural by
//    tools/ambisonic.py (the AmbisonicBinauralizer path).
//
// Parallelism: a std::thread pool over receivers (the reference binauralizes
// with 160 host threads, scripts/ambisonic_to_binaural.py:43).
//
// C ABI (ctypes): synth_rir_bank(...) fills [4, n_nodes, n_sources, 2, len];
// synth_ambisonic_bank(...) fills [n_nodes, n_sources, (order+1)^2, len].

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr float kSpeedOfSound = 343.0f;
constexpr int kNumBands = 4;  // matches the reference tracer's 4 bands
constexpr int kMaxDiffractionPaths = 4;
constexpr int kMaxTransmissionMarch = 256;  // wall-interior steps before kill

struct Material {
  float absorption[kNumBands];
  float scattering;
  float transmission[kNumBands];
  float t_mean;  // mean(transmission), the roulette probability
};

struct Config {
  int sampling_rate;
  int rir_len;
  int num_rays;
  int max_bounces;
  float grid_size;       // meters per occupancy cell
  float receiver_radius; // meters
  float air_absorption;  // per-meter broadband loss
  float ema_a;           // envelope shot-noise smoother, fixed 5 ms in TIME
                         // (a per-sample constant would floor the decay
                         // rate at low sampling rates and corrupt RT60)
  uint64_t seed;
  bool enable_transmission;
  bool enable_diffraction;
  const Material* materials;  // [n_materials]
  int n_materials;
};

struct Grid {
  const uint8_t* occ;  // [h][w], 1 = walkable
  const uint8_t* mat;  // [h][w] material ids, may be null (-> material 0)
  int h, w;
  bool walkable(int gz, int gx) const {
    if (gz < 0 || gz >= h || gx < 0 || gx >= w) return false;
    return occ[gz * w + gx] != 0;
  }
  bool walkable_at(float x, float z, float cell) const {
    // round(), matching how occupancy_from_graph assigns nodes to cells
    // (cell = round((x - x0)/g)); floor() would misread walkable poses up
    // to half a cell below the grid origin as walls and drop their
    // direct path in continuous-pose tracing
    return walkable((int)std::lround(z / cell), (int)std::lround(x / cell));
  }
  int material_at(float x, float z, float cell, int n_mat) const {
    if (!mat) return 0;
    int gz = (int)std::lround(z / cell), gx = (int)std::lround(x / cell);
    if (gz < 0 || gz >= h || gx < 0 || gx >= w) return 0;
    int m = mat[gz * w + gx];
    return m < n_mat ? m : 0;
  }
};

struct BandEnergy {
  std::vector<float> e[kNumBands];  // energy per output sample
  // broadband direction-of-arrival accumulators (for ambisonic synthesis):
  // ex/ey/ez sum energy * unit-DOA so ex/etot is the per-sample mean
  // direction (ez is the vertical component, used by the 3-D paths only).
  std::vector<float> ex, ey, ez, etot;
  bool directional;
  explicit BandEnergy(int len, bool dir = false) : directional(dir) {
    for (auto& v : e) v.assign(len, 0.0f);
    if (dir) {
      ex.assign(len, 0.0f);
      ey.assign(len, 0.0f);
      ez.assign(len, 0.0f);
      etot.assign(len, 0.0f);
    }
  }
  void deposit(int n, const float* band_e, float doax, float doay,
               float doaz = 0.0f) {
    float tot = 0.0f;
    for (int b = 0; b < kNumBands; ++b) {
      e[b][n] += band_e[b];
      tot += band_e[b];
    }
    if (directional) {
      ex[n] += tot * doax;
      ey[n] += tot * doay;
      ez[n] += tot * doaz;
      etot[n] += tot;
    }
  }
};

// Deterministic per-ray RNG.
struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s << 13; s ^= s >> 7; s ^= s << 17; return s;
  }
  float uniform() { return (next() >> 11) * (1.0f / 9007199254740992.0f); }
  float range(float a, float b) { return a + (b - a) * uniform(); }
};

// March one energy ray through the grid, depositing band energy at the
// receiver. 2-D DDA against the occupancy grid.
// Returns true iff the ray deposited any energy at the receiver (the stat
// behind getRayEfficiency()).
bool trace_ray(const Grid& grid, const Config& cfg, float sx, float sz,
               float rx, float rz, float dirx, float dirz, XorShift& rng,
               BandEnergy& out) {
  float x = sx, z = sz;
  float dx = dirx, dz = dirz;
  float path = 0.0f;
  float energy[kNumBands];
  for (int b = 0; b < kNumBands; ++b) energy[b] = 1.0f / cfg.num_rays;

  const float step = cfg.grid_size * 0.25f;
  const float max_path = cfg.rir_len * kSpeedOfSound / cfg.sampling_rate;
  int bounces = 0;
  bool deposited = false;

  while (path < max_path && bounces <= cfg.max_bounces) {
    float nx = x + dx * step, nz = z + dz * step;
    if (!grid.walkable_at(nx, nz, cfg.grid_size)) {
      const Material& m =
          cfg.materials[grid.material_at(nx, nz, cfg.grid_size,
                                         cfg.n_materials)];
      // transmission roulette: the surviving (1-a) energy splits
      // t : (1-t) between the through-wall ray and the reflection;
      // choosing one branch with p = mean(t) and reweighting keeps the
      // estimator unbiased per band.
      if (cfg.enable_transmission && m.t_mean > 0.0f &&
          rng.uniform() < m.t_mean) {
        for (int b = 0; b < kNumBands; ++b)
          energy[b] *= (1.0f - m.absorption[b]) * m.transmission[b] / m.t_mean;
        // march straight through the occluder until free space again
        int guard = 0;
        while (!grid.walkable_at(nx, nz, cfg.grid_size)) {
          nx += dx * step; nz += dz * step; path += step;
          if (++guard >= kMaxTransmissionMarch || path >= max_path)
            return deposited;  // absorbed inside a thick wall
        }
        x = nx; z = nz; path += step;
        ++bounces;
        continue;
      }
      // wall hit: reflect about the blocked axis, apply absorption/scatter
      bool bx = !grid.walkable_at(nx, z, cfg.grid_size);
      bool bz = !grid.walkable_at(x, nz, cfg.grid_size);
      if (bx || !bz) dx = -dx;
      if (bz || !bx) dz = -dz;
      if (rng.uniform() < m.scattering) {
        float ang = rng.range(0.0f, 6.2831853f);
        dx = std::cos(ang); dz = std::sin(ang);
      }
      float refl = 1.0f;
      if (cfg.enable_transmission && m.t_mean > 0.0f)
        refl = 1.0f / (1.0f - m.t_mean);  // roulette reweight
      for (int b = 0; b < kNumBands; ++b) {
        float keep = (1.0f - m.absorption[b]);
        if (cfg.enable_transmission)
          keep *= (1.0f - m.transmission[b]) * refl;
        energy[b] *= keep;
      }
      ++bounces;
      continue;
    }
    x = nx; z = nz; path += step;

    float ddx = x - rx, ddz = z - rz;
    if (ddx * ddx + ddz * ddz < cfg.receiver_radius * cfg.receiver_radius) {
      float t = path / kSpeedOfSound;
      int n = (int)(t * cfg.sampling_rate);
      if (n >= 0 && n < cfg.rir_len) {
        float air = std::exp(-cfg.air_absorption * path);
        float dep[kNumBands];
        for (int b = 0; b < kNumBands; ++b) dep[b] = energy[b] * air;
        out.deposit(n, dep, -dx, -dz);  // DOA points back along the ray
        deposited = true;
      }
    }
  }
  return deposited;
}

bool direct_path_clear(const Grid& grid, const Config& cfg, float rx,
                       float rz, float sx, float sz) {
  const float ddx = sx - rx, ddz = sz - rz;
  const float dist = std::sqrt(ddx * ddx + ddz * ddz);
  int steps = (int)(dist / (cfg.grid_size * 0.25f));
  for (int i = 1; i < steps; ++i) {
    float t = (float)i / steps;
    if (!grid.walkable_at(rx + ddx * t, rz + ddz * t, cfg.grid_size))
      return false;
  }
  return true;
}

// ------------------------------------------------------------- diffraction

struct Corner {
  float x, z;  // nudged slightly into free space off the convex edge
};

// Convex corners of the blocked regions: occupancy-lattice points where
// exactly one of the four adjacent cells is non-walkable. These are the
// diffracting edges of the 2.5-D scene.
std::vector<Corner> find_corners(const Grid& grid, float cell) {
  std::vector<Corner> out;
  for (int jz = -1; jz < grid.h; ++jz) {
    for (int jx = -1; jx < grid.w; ++jx) {
      int blocked = 0, bz = 0, bx = 0;
      for (int dz = 0; dz < 2; ++dz)
        for (int dx = 0; dx < 2; ++dx)
          if (!grid.walkable(jz + dz, jx + dx)) {
            ++blocked; bz = jz + dz; bx = jx + dx;
          }
      if (blocked != 1) continue;
      float cx = (jx + 0.5f) * cell, cz = (jz + 0.5f) * cell;
      // nudge away from the blocked cell's center so LoS legs don't graze it
      float ox = cx - bx * cell, oz = cz - bz * cell;
      float n = std::sqrt(ox * ox + oz * oz) + 1e-9f;
      out.push_back({cx + ox / n * cell * 0.3f, cz + oz / n * cell * 0.3f});
    }
  }
  return out;
}

// First-order shadow-zone diffraction: for an occluded (source, receiver)
// pair, each convex corner with clear legs contributes energy at
// t = (|s-c| + |c-r|)/c, attenuated exponentially in the deflection angle
// and more steeply at high frequencies (low bands bend around edges). The
// kMaxDiffractionPaths strongest corners are kept.
void add_diffraction(const Grid& grid, const Config& cfg,
                     const std::vector<Corner>& corners, float sx, float sz,
                     float rx, float rz, BandEnergy& acc) {
  struct Cand {
    float e0;       // broadband energy score for ranking
    float d1, d2, theta, doax, doay;
  };
  std::vector<Cand> cands;
  for (const Corner& c : corners) {
    float d1x = c.x - sx, d1z = c.z - sz;
    float d2x = rx - c.x, d2z = rz - c.z;
    float d1 = std::sqrt(d1x * d1x + d1z * d1z);
    float d2 = std::sqrt(d2x * d2x + d2z * d2z);
    if (d1 < 1e-4f || d2 < 1e-4f) continue;
    if (!direct_path_clear(grid, cfg, sx, sz, c.x, c.z)) continue;
    if (!direct_path_clear(grid, cfg, c.x, c.z, rx, rz)) continue;
    float dot = (d1x * d2x + d1z * d2z) / (d1 * d2);
    dot = std::max(-1.0f, std::min(1.0f, dot));
    float theta = std::acos(dot);  // deflection into the shadow, [0, pi]
    float amp = 1.0f / (d1 + d2) * std::exp(-theta);
    cands.push_back({amp * amp, d1, d2, theta, -d2x / d2, -d2z / d2});
  }
  if (cands.empty()) return;
  std::sort(cands.begin(), cands.end(),
            [](const Cand& a, const Cand& b) { return a.e0 > b.e0; });
  if ((int)cands.size() > kMaxDiffractionPaths)
    cands.resize(kMaxDiffractionPaths);
  // per-band shadow steepness: high bands hug the edge (diffract less)
  static const float kBandSteep[kNumBands] = {0.7f, 1.1f, 1.8f, 2.8f};
  for (const Cand& cd : cands) {
    float t = (cd.d1 + cd.d2) / kSpeedOfSound;
    int n = (int)(t * cfg.sampling_rate);
    if (n < 0 || n >= cfg.rir_len) continue;
    float air = std::exp(-cfg.air_absorption * (cd.d1 + cd.d2));
    float dep[kNumBands];
    for (int b = 0; b < kNumBands; ++b) {
      float a = std::exp(-kBandSteep[b] * cd.theta) / (cd.d1 + cd.d2);
      dep[b] = a * a * air;
    }
    acc.deposit(n, dep, cd.doax, cd.doay);
  }
}

// Band-limited noise carrier: deterministic white noise shaped by a cheap
// 2nd-order band emphasis (center frequencies 125*4^b-ish scaled by sr).
void band_noise(int band, int len, int sampling_rate, uint64_t seed,
                std::vector<float>& out) {
  XorShift rng(seed * 1315423911ull + band * 2654435761ull + 17);
  out.resize(len);
  // one-pole bandpass-ish shaping via twin EMA difference
  float f_lo = 0.02f + 0.11f * band;  // normalized corner pair per band
  float f_hi = std::min(0.49f, f_lo * 2.5f);
  float a_lo = std::exp(-6.2831853f * f_lo);
  float a_hi = std::exp(-6.2831853f * f_hi);
  float lo = 0.0f, hi = 0.0f;
  for (int n = 0; n < len; ++n) {
    float white = rng.uniform() * 2.0f - 1.0f;
    lo = a_lo * lo + (1 - a_lo) * white;
    hi = a_hi * hi + (1 - a_hi) * white;
    out[n] = hi - lo;
  }
  // normalize RMS
  double rms = 1e-12;
  for (float v : out) rms += (double)v * v;
  float g = (float)(1.0 / std::sqrt(rms / len));
  for (float& v : out) v *= g;
}

// Shared scene context for one synthesis job.
struct SceneCtx {
  Grid grid;
  std::vector<Corner> corners;  // empty unless diffraction enabled
};

void stochastic_field(const SceneCtx& sc, const Config& cfg, float sx,
                      float sz, float rx, float rz, uint64_t salt,
                      BandEnergy& acc) {
  for (int r = 0; r < cfg.num_rays; ++r) {
    // independent per-ray stream: rays are order-independent and a ray's
    // trajectory is unaffected by what other rays hit (keeps the field
    // identical across scenes until a ray itself reaches differing
    // geometry — the property the image-source causality test pins down)
    XorShift ray_rng(cfg.seed ^ salt ^
                     (0x9e3779b97f4a7c15ull * (uint64_t)(r + 1)));
    float ang = 6.2831853f * (r + ray_rng.uniform()) / cfg.num_rays;
    trace_ray(sc.grid, cfg, sx, sz, rx, rz, std::cos(ang), std::sin(ang),
              ray_rng, acc);
  }
  if (cfg.enable_diffraction &&
      !direct_path_clear(sc.grid, cfg, rx, rz, sx, sz))
    add_diffraction(sc.grid, cfg, sc.corners, sx, sz, rx, rz, acc);
}

void synth_one(const SceneCtx& sc, const Config& cfg, const float* points,
               int n_nodes, int receiver, const int32_t* sources,
               int n_sources, float* out /* [4][n_sources][2][len] */) {
  const Grid& grid = sc.grid;
  const float rx = points[receiver * 3 + 0];
  const float rz = points[receiver * 3 + 2];
  const int len = cfg.rir_len;

  std::vector<float> carrier;
  std::vector<float> envelope(len);

  for (int si = 0; si < n_sources; ++si) {
    const int src = sources[si];
    const float sx = points[src * 3 + 0];
    const float sz = points[src * 3 + 2];

    BandEnergy acc(len);
    stochastic_field(sc, cfg, sx, sz, rx, rz,
                     (uint64_t)(receiver * 73856093 + src * 19349663), acc);

    // diffuse pressure tail = sum over bands of sqrt(smoothed energy)*noise
    std::vector<float> diffuse(len, 0.0f);
    for (int b = 0; b < kNumBands; ++b) {
      // short moving average smooths ray shot noise
      float ema = 0.0f;
      const float a = cfg.ema_a;
      for (int n = 0; n < len; ++n) {
        ema = a * ema + (1 - a) * acc.e[b][n];
        envelope[n] = std::sqrt(std::max(ema, 0.0f));
      }
      band_noise(b, len, cfg.sampling_rate,
                 cfg.seed ^ (uint64_t)(receiver * 31 + src * 7 + b), carrier);
      for (int n = 0; n < len; ++n) diffuse[n] += envelope[n] * carrier[n];
    }

    // direct path + binaural per heading
    const float ddx = sx - rx, ddz = sz - rz;
    const float dist = std::max(std::sqrt(ddx * ddx + ddz * ddz),
                                cfg.grid_size * 0.5f);
    const float src_dir = std::atan2(ddz, ddx);
    const bool occluded = !direct_path_clear(grid, cfg, rx, rz, sx, sz);

    for (int ai = 0; ai < 4; ++ai) {
      // azimuth index ai corresponds to rotation -90*ai (simulator.py:568-573);
      // orientation angle = 270 + 90*ai degrees in mesh frame
      const float orient = (270.0f + 90.0f * ai) * 0.01745329252f;
      const float rel = src_dir - orient;
      const float itd = 0.09f / kSpeedOfSound * std::sin(rel);
      const float ild = 0.5f + 0.4f * std::sin(rel);

      for (int ch = 0; ch < 2; ++ch) {
        float* dst = out + ((size_t)ai * n_sources + si) * 2 * len +
                     (size_t)ch * len;
        const float ear_gain = (ch == 0) ? (1.0f - ild) : ild;
        const float ear_itd = (ch == 0) ? -itd * 0.5f : itd * 0.5f;
        // diffuse field is ear-decorrelated only by gain here
        for (int n = 0; n < len; ++n) dst[n] = 0.7f * diffuse[n];
        if (!occluded) {
          const float delay = dist / kSpeedOfSound + ear_itd;
          const int n0 = (int)std::lround(delay * cfg.sampling_rate);
          if (n0 >= 0 && n0 < len) dst[n0] += ear_gain / dist;
        }
      }
    }
  }
}

// One RIR at an arbitrary continuous pose (receiver x, z, heading) and
// source position — the per-step SS2.0 path (the reference re-renders a
// fresh RIR each step, continuous_simulator.py:370-426). Binaural uses the
// CONTINUOUS heading rather than the bank's four quantized azimuths.
void trace_one_pose(const SceneCtx& sc, const Config& cfg, float rx, float rz,
                    float heading, float sx, float sz,
                    float* out /* [2][len] */) {
  const Grid& grid = sc.grid;
  const int len = cfg.rir_len;

  BandEnergy acc(len);
  const uint64_t pose_salt =
      (uint64_t)(int64_t)std::lround(rx * 512.0f) * 73856093ull ^
      (uint64_t)(int64_t)std::lround(rz * 512.0f) * 19349663ull ^
      (uint64_t)(int64_t)std::lround(sx * 512.0f) * 83492791ull ^
      (uint64_t)(int64_t)std::lround(sz * 512.0f);
  stochastic_field(sc, cfg, sx, sz, rx, rz, pose_salt, acc);

  std::vector<float> carrier;
  std::vector<float> envelope(len);
  std::vector<float> diffuse(len, 0.0f);
  for (int b = 0; b < kNumBands; ++b) {
    float ema = 0.0f;
    const float a = cfg.ema_a;
    for (int n = 0; n < len; ++n) {
      ema = a * ema + (1 - a) * acc.e[b][n];
      envelope[n] = std::sqrt(std::max(ema, 0.0f));
    }
    band_noise(b, len, cfg.sampling_rate, cfg.seed ^ (pose_salt + b),
               carrier);
    for (int n = 0; n < len; ++n) diffuse[n] += envelope[n] * carrier[n];
  }

  const float ddx = sx - rx, ddz = sz - rz;
  const float dist =
      std::max(std::sqrt(ddx * ddx + ddz * ddz), cfg.grid_size * 0.5f);
  const float src_dir = std::atan2(ddz, ddx);
  const bool occluded = !direct_path_clear(grid, cfg, rx, rz, sx, sz);

  const float rel = src_dir - heading;
  const float itd = 0.09f / kSpeedOfSound * std::sin(rel);
  const float ild = 0.5f + 0.4f * std::sin(rel);
  for (int ch = 0; ch < 2; ++ch) {
    float* dst = out + (size_t)ch * len;
    const float ear_gain = (ch == 0) ? (1.0f - ild) : ild;
    const float ear_itd = (ch == 0) ? -itd * 0.5f : itd * 0.5f;
    for (int n = 0; n < len; ++n) dst[n] = 0.7f * diffuse[n];
    if (!occluded) {
      const float delay = dist / kSpeedOfSound + ear_itd;
      const int n0 = (int)std::lround(delay * cfg.sampling_rate);
      if (n0 >= 0 && n0 < len) dst[n0] += ear_gain / dist;
    }
  }
}

// -------------------------------------------------------------- ambisonics

// Real spherical harmonics, ACN channel order, SN3D normalization, at
// elevation 0 (the 2.5-D field lives in the horizontal plane):
//   order 0: W = 1
//   order 1: Y = sin(az), Z = 0, X = cos(az)
//   order 2: V = (sqrt3/2) sin 2az, T = 0, R = -1/2, S = 0,
//            U = (sqrt3/2) cos 2az
// `r` in [0, 1] scales the directional channels (0 = fully diffuse field).
inline void sh_gains(float cosaz, float sinaz, float r, int order,
                     float* g /* [(order+1)^2] */) {
  g[0] = 1.0f;
  if (order >= 1) {
    g[1] = r * sinaz;
    g[2] = 0.0f;
    g[3] = r * cosaz;
  }
  if (order >= 2) {
    float s2 = 2.0f * cosaz * sinaz;
    float c2 = cosaz * cosaz - sinaz * sinaz;
    g[4] = r * 0.8660254f * s2;
    g[5] = 0.0f;
    g[6] = -0.5f;  // horizontal confinement signature, az-independent
    g[7] = 0.0f;
    g[8] = r * 0.8660254f * c2;
  }
}

// One ambisonic RIR [(order+1)^2][len] for (receiver node, source node):
// SIRR-style synthesis — the W envelope is sqrt(total band energy), the
// directional channels follow the per-sample intensity direction scaled by
// the directionality ratio |sum E*doa| / sum E, all sharing the band noise
// carrier so the channels stay coherent for matrix decoding.
void synth_ambisonic_one(const SceneCtx& sc, const Config& cfg,
                         const float* points, int receiver,
                         const int32_t* sources, int n_sources, int order,
                         float* out /* [n_sources][n_sh][len] */) {
  const int n_sh = (order + 1) * (order + 1);
  const float rx = points[receiver * 3 + 0];
  const float rz = points[receiver * 3 + 2];
  const int len = cfg.rir_len;

  std::vector<float> carrier;
  std::vector<float> wenv(len), dirx(len), diry(len), dirr(len);
  float g[9];

  for (int si = 0; si < n_sources; ++si) {
    const int src = sources[si];
    const float sx = points[src * 3 + 0];
    const float sz = points[src * 3 + 2];

    BandEnergy acc(len, /*directional=*/true);
    stochastic_field(sc, cfg, sx, sz, rx, rz,
                     (uint64_t)(receiver * 73856093 + src * 19349663), acc);

    // per-sample smoothed mean DOA + directionality ratio
    const float a = cfg.ema_a;
    float emx = 0.0f, emy = 0.0f, emt = 0.0f;
    for (int n = 0; n < len; ++n) {
      emx = a * emx + (1 - a) * acc.ex[n];
      emy = a * emy + (1 - a) * acc.ey[n];
      emt = a * emt + (1 - a) * acc.etot[n];
      float mag = std::sqrt(emx * emx + emy * emy);
      if (emt > 1e-20f && mag > 1e-20f) {
        dirx[n] = emx / mag;
        diry[n] = emy / mag;
        dirr[n] = std::min(mag / emt, 1.0f);
      } else {
        dirx[n] = 1.0f; diry[n] = 0.0f; dirr[n] = 0.0f;
      }
    }

    float* dst0 = out + (size_t)si * n_sh * len;
    std::memset(dst0, 0, sizeof(float) * (size_t)n_sh * len);

    for (int b = 0; b < kNumBands; ++b) {
      float ema = 0.0f;
      for (int n = 0; n < len; ++n) {
        ema = a * ema + (1 - a) * acc.e[b][n];
        wenv[n] = std::sqrt(std::max(ema, 0.0f));
      }
      band_noise(b, len, cfg.sampling_rate,
                 cfg.seed ^ (uint64_t)(receiver * 31 + src * 7 + b), carrier);
      for (int n = 0; n < len; ++n) {
        const float p = wenv[n] * carrier[n];
        sh_gains(dirx[n], diry[n], dirr[n], order, g);
        for (int c = 0; c < n_sh; ++c) dst0[(size_t)c * len + n] += p * g[c];
      }
    }

    // direct path: exact SH encoding of the arrival direction
    const float ddx = sx - rx, ddz = sz - rz;
    const float dist =
        std::max(std::sqrt(ddx * ddx + ddz * ddz), cfg.grid_size * 0.5f);
    if (direct_path_clear(sc.grid, cfg, rx, rz, sx, sz)) {
      const int n0 =
          (int)std::lround(dist / kSpeedOfSound * cfg.sampling_rate);
      if (n0 >= 0 && n0 < len) {
        sh_gains(ddx / dist, ddz / dist, 1.0f, order, g);
        for (int c = 0; c < n_sh; ++c)
          dst0[(size_t)c * len + n0] += g[c] / dist;
      }
    }
  }
}

// ------------------------------------------------------------------- 3-D
// Full vertical dimension (the reference engine is a 3-D bidirectional
// tracer — SoundSpaces2.md:3-5; source heights matter throughout the
// reference: the +1.5 m goal offset at simulator.py:390 and the dataset
// height offsets at utils.py:15-39). Walls stay vertical extrusions of the
// occupancy grid; floor and ceiling become per-cell height surfaces (the
// heightfields tools/mesh_metadata.py rasterizes) with their OWN material
// rows; rays march in 3-D and reflect off all six boundary kinds; the
// spherical-harmonic encode gains real elevation.

struct Scene3 {
  Grid grid;
  const float* floor_y;  // [h][w] per-cell floor height, may be null
  const float* ceil_y;   // [h][w] per-cell ceiling height, may be null
  float floor_default, ceil_default;
  int floor_mat, ceil_mat;  // material-table rows for the two surfaces
  std::vector<Corner> corners;

  float floor_at(float x, float z, float cell) const {
    if (!floor_y) return floor_default;
    int gz = (int)std::lround(z / cell), gx = (int)std::lround(x / cell);
    gz = std::max(0, std::min(grid.h - 1, gz));
    gx = std::max(0, std::min(grid.w - 1, gx));
    return floor_y[gz * grid.w + gx];
  }
  float ceil_at(float x, float z, float cell) const {
    if (!ceil_y) return ceil_default;
    int gz = (int)std::lround(z / cell), gx = (int)std::lround(x / cell);
    gz = std::max(0, std::min(grid.h - 1, gz));
    gx = std::max(0, std::min(grid.w - 1, gx));
    return ceil_y[gz * grid.w + gx];
  }
};

// March one energy ray through the 3-D scene. Horizontal wall logic matches
// trace_ray; floor/ceiling hits reflect the vertical component with the
// surface's own material (cosine-weighted diffuse bounce on scatter).
bool trace_ray3(const Scene3& sc, const Config& cfg, float sx, float sy,
                float sz, float rx, float ry, float rz, float dx, float dy,
                float dz, XorShift& rng, BandEnergy& out) {
  const Grid& grid = sc.grid;
  float x = sx, y = sy, z = sz;
  float path = 0.0f;
  float energy[kNumBands];
  for (int b = 0; b < kNumBands; ++b) energy[b] = 1.0f / cfg.num_rays;

  const float step = cfg.grid_size * 0.25f;
  const float max_path = cfg.rir_len * kSpeedOfSound / cfg.sampling_rate;
  const float r2 = cfg.receiver_radius * cfg.receiver_radius;
  int bounces = 0;
  bool deposited = false;

  while (path < max_path && bounces <= cfg.max_bounces) {
    float nx = x + dx * step, ny = y + dy * step, nz = z + dz * step;
    if (!grid.walkable_at(nx, nz, cfg.grid_size)) {
      const Material& m =
          cfg.materials[grid.material_at(nx, nz, cfg.grid_size,
                                         cfg.n_materials)];
      if (cfg.enable_transmission && m.t_mean > 0.0f &&
          rng.uniform() < m.t_mean) {
        for (int b = 0; b < kNumBands; ++b)
          energy[b] *= (1.0f - m.absorption[b]) * m.transmission[b] / m.t_mean;
        int guard = 0;
        while (!grid.walkable_at(nx, nz, cfg.grid_size)) {
          nx += dx * step; ny += dy * step; nz += dz * step; path += step;
          if (++guard >= kMaxTransmissionMarch || path >= max_path)
            return deposited;
        }
        x = nx; y = ny; z = nz; path += step;
        ++bounces;
        continue;
      }
      bool bx = !grid.walkable_at(nx, z, cfg.grid_size);
      bool bz = !grid.walkable_at(x, nz, cfg.grid_size);
      if (bx || !bz) dx = -dx;
      if (bz || !bx) dz = -dz;
      if (rng.uniform() < m.scattering) {
        // scatter on the full sphere (walls are tall diffusers here)
        float caz = rng.range(0.0f, 6.2831853f);
        float cel = rng.range(-1.0f, 1.0f);
        float se = std::sqrt(std::max(0.0f, 1.0f - cel * cel));
        dx = se * std::cos(caz); dy = cel; dz = se * std::sin(caz);
      }
      float refl = 1.0f;
      if (cfg.enable_transmission && m.t_mean > 0.0f)
        refl = 1.0f / (1.0f - m.t_mean);
      for (int b = 0; b < kNumBands; ++b) {
        float keep = (1.0f - m.absorption[b]);
        if (cfg.enable_transmission)
          keep *= (1.0f - m.transmission[b]) * refl;
        energy[b] *= keep;
      }
      ++bounces;
      continue;
    }
    const float fl = sc.floor_at(nx, nz, cfg.grid_size);
    const float cl = sc.ceil_at(nx, nz, cfg.grid_size);
    if (ny < fl || ny > cl) {
      const bool is_floor = ny < fl;
      const Material& m =
          cfg.materials[is_floor ? sc.floor_mat : sc.ceil_mat];
      // reflect back to the side the ray currently occupies so the surface
      // is never crossed (a source outside the floor/ceiling slab stays
      // sealed off; ledges reflect an already-rising ray upward)
      float away;
      if (is_floor)
        away = (y >= fl) ? 1.0f : -1.0f;
      else
        away = (y <= cl) ? -1.0f : 1.0f;
      dy = away * std::fabs(dy);
      if (rng.uniform() < m.scattering) {
        // cosine-weighted diffuse bounce off the horizontal surface
        float u = rng.uniform();
        float cv = std::sqrt(u);  // |vertical| component
        float se = std::sqrt(std::max(0.0f, 1.0f - cv * cv));
        float caz = rng.range(0.0f, 6.2831853f);
        dx = se * std::cos(caz);
        dy = away * cv;
        dz = se * std::sin(caz);
      }
      for (int b = 0; b < kNumBands; ++b)
        energy[b] *= (1.0f - m.absorption[b]);
      ++bounces;
      continue;
    }
    x = nx; y = ny; z = nz; path += step;

    float ddx = x - rx, ddy = y - ry, ddz = z - rz;
    if (ddx * ddx + ddy * ddy + ddz * ddz < r2) {
      float t = path / kSpeedOfSound;
      int n = (int)(t * cfg.sampling_rate);
      if (n >= 0 && n < cfg.rir_len) {
        float air = std::exp(-cfg.air_absorption * path);
        float dep[kNumBands];
        for (int b = 0; b < kNumBands; ++b) dep[b] = energy[b] * air;
        out.deposit(n, dep, -dx, -dz, -dy);  // DOA back along the ray
        deposited = true;
      }
    }
  }
  return deposited;
}

// 3-D line-of-sight: the segment must stay in walkable cells AND between
// the local floor and ceiling surfaces at every sample point.
bool direct_path_clear3(const Scene3& sc, const Config& cfg, float rx,
                        float ry, float rz, float sx, float sy, float sz) {
  const float ddx = sx - rx, ddy = sy - ry, ddz = sz - rz;
  const float dist = std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz);
  int steps = (int)(dist / (cfg.grid_size * 0.25f));
  for (int i = 1; i < steps; ++i) {
    float t = (float)i / steps;
    float px = rx + ddx * t, py = ry + ddy * t, pz = rz + ddz * t;
    if (!sc.grid.walkable_at(px, pz, cfg.grid_size)) return false;
    if (py < sc.floor_at(px, pz, cfg.grid_size) ||
        py > sc.ceil_at(px, pz, cfg.grid_size))
      return false;
  }
  return true;
}

// First-order diffraction over vertical edges with the height difference
// unfolded into the bent path: the shortest source->edge->receiver path
// touching a vertical line has length hypot(d1 + d2, sy - ry) (straight
// line in the unfolded plane), crossing the edge at the interpolated
// height. Leg clearance is checked in 3-D at that height.
void add_diffraction3(const Scene3& sc, const Config& cfg, float sx, float sy,
                      float sz, float rx, float ry, float rz,
                      BandEnergy& acc) {
  struct Cand {
    float e0;
    float len3, theta, doax, doay, doaz;
  };
  std::vector<Cand> cands;
  const float dy_sr = sy - ry;
  for (const Corner& c : sc.corners) {
    float d1x = c.x - sx, d1z = c.z - sz;
    float d2x = rx - c.x, d2z = rz - c.z;
    float d1 = std::sqrt(d1x * d1x + d1z * d1z);
    float d2 = std::sqrt(d2x * d2x + d2z * d2z);
    if (d1 < 1e-4f || d2 < 1e-4f) continue;
    // edge crossing height: linear interpolation along the unfolded path
    float cy = sy + (ry - sy) * (d1 / (d1 + d2));
    if (!direct_path_clear3(sc, cfg, sx, sy, sz, c.x, cy, c.z)) continue;
    if (!direct_path_clear3(sc, cfg, c.x, cy, c.z, rx, ry, rz)) continue;
    float dot = (d1x * d2x + d1z * d2z) / (d1 * d2);
    dot = std::max(-1.0f, std::min(1.0f, dot));
    float theta = std::acos(dot);
    float len3 = std::sqrt((d1 + d2) * (d1 + d2) + dy_sr * dy_sr);
    float amp = 1.0f / len3 * std::exp(-theta);
    // DOA: from the corner (at crossing height) toward the receiver
    float l2 = std::sqrt(d2 * d2 + (cy - ry) * (cy - ry)) + 1e-9f;
    cands.push_back({amp * amp, len3, theta, -d2x / l2, -d2z / l2,
                     -(ry - cy) / l2});
  }
  if (cands.empty()) return;
  std::sort(cands.begin(), cands.end(),
            [](const Cand& a, const Cand& b) { return a.e0 > b.e0; });
  if ((int)cands.size() > kMaxDiffractionPaths)
    cands.resize(kMaxDiffractionPaths);
  static const float kBandSteep[kNumBands] = {0.7f, 1.1f, 1.8f, 2.8f};
  for (const Cand& cd : cands) {
    float t = cd.len3 / kSpeedOfSound;
    int n = (int)(t * cfg.sampling_rate);
    if (n < 0 || n >= cfg.rir_len) continue;
    float air = std::exp(-cfg.air_absorption * cd.len3);
    float dep[kNumBands];
    for (int b = 0; b < kNumBands; ++b) {
      float a = std::exp(-kBandSteep[b] * cd.theta) / cd.len3;
      dep[b] = a * a * air;
    }
    acc.deposit(n, dep, cd.doax, cd.doay, cd.doaz);
  }
}

// Stratified-uniform sphere directions: cos(elevation) stratified over the
// ray index, golden-ratio azimuth rotation + jitter.
void stochastic_field3(const Scene3& sc, const Config& cfg, float sx,
                       float sy, float sz, float rx, float ry, float rz,
                       uint64_t salt, BandEnergy& acc) {
  for (int r = 0; r < cfg.num_rays; ++r) {
    XorShift ray_rng(cfg.seed ^ salt ^
                     (0x9e3779b97f4a7c15ull * (uint64_t)(r + 1)));
    float cel = 1.0f - 2.0f * (r + ray_rng.uniform()) / cfg.num_rays;
    float se = std::sqrt(std::max(0.0f, 1.0f - cel * cel));
    float az = 6.2831853f * (r * 0.61803398875f + ray_rng.uniform());
    trace_ray3(sc, cfg, sx, sy, sz, rx, ry, rz, se * std::cos(az), cel,
               se * std::sin(az), ray_rng, acc);
  }
  if (cfg.enable_diffraction &&
      !direct_path_clear3(sc, cfg, rx, ry, rz, sx, sy, sz))
    add_diffraction3(sc, cfg, sx, sy, sz, rx, ry, rz, acc);
}

// Real spherical harmonics with elevation, ACN order, SN3D normalization.
// Ambisonic frame: x_amb = +x (az 0), y_amb = +z (az 90 deg), z_amb = up.
// `r` in [0, 1] scales every directional channel (0 = isotropic diffuse).
inline void sh_gains3(float xa, float ya, float za, float r, int order,
                      float* g /* [(order+1)^2] */) {
  g[0] = 1.0f;
  if (order >= 1) {
    g[1] = r * ya;
    g[2] = r * za;
    g[3] = r * xa;
  }
  if (order >= 2) {
    g[4] = r * 1.7320508f * xa * ya;
    g[5] = r * 1.7320508f * ya * za;
    g[6] = r * (1.5f * za * za - 0.5f);
    g[7] = r * 1.7320508f * xa * za;
    g[8] = r * 0.8660254f * (xa * xa - ya * ya);
  }
}

// Shared diffuse-pressure synthesis: smoothed band envelopes * band noise.
void diffuse_pressure(const Config& cfg, const BandEnergy& acc,
                      uint64_t noise_seed, std::vector<float>& diffuse) {
  const int len = cfg.rir_len;
  diffuse.assign(len, 0.0f);
  std::vector<float> carrier;
  std::vector<float> envelope(len);
  for (int b = 0; b < kNumBands; ++b) {
    float ema = 0.0f;
    const float a = cfg.ema_a;
    for (int n = 0; n < len; ++n) {
      ema = a * ema + (1 - a) * acc.e[b][n];
      envelope[n] = std::sqrt(std::max(ema, 0.0f));
    }
    band_noise(b, len, cfg.sampling_rate, noise_seed + b, carrier);
    for (int n = 0; n < len; ++n) diffuse[n] += envelope[n] * carrier[n];
  }
}

// Binaural synthesis at one 3-D receiver pose: elevation shortens the
// horizontal ITD/ILD cues (cos(el) projection of the Woodworth model) and
// the direct arrival uses the true 3-D distance.
void binaural_from_field3(const Scene3& sc, const Config& cfg,
                          const BandEnergy& acc, uint64_t noise_seed,
                          float rx, float ry, float rz, float heading,
                          float sx, float sy, float sz,
                          float* out /* [2][len] */) {
  const int len = cfg.rir_len;
  std::vector<float> diffuse;
  diffuse_pressure(cfg, acc, noise_seed, diffuse);

  const float ddx = sx - rx, ddy = sy - ry, ddz = sz - rz;
  const float dh = std::sqrt(ddx * ddx + ddz * ddz);
  const float dist = std::max(std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz),
                              cfg.grid_size * 0.5f);
  const float src_dir = std::atan2(ddz, ddx);
  const float cos_el = dh / std::max(dist, 1e-6f);
  const bool occluded =
      !direct_path_clear3(sc, cfg, rx, ry, rz, sx, sy, sz);

  const float rel = src_dir - heading;
  const float itd = 0.09f / kSpeedOfSound * std::sin(rel) * cos_el;
  const float ild = 0.5f + 0.4f * std::sin(rel) * cos_el;
  for (int ch = 0; ch < 2; ++ch) {
    float* dst = out + (size_t)ch * len;
    const float ear_gain = (ch == 0) ? (1.0f - ild) : ild;
    const float ear_itd = (ch == 0) ? -itd * 0.5f : itd * 0.5f;
    for (int n = 0; n < len; ++n) dst[n] = 0.7f * diffuse[n];
    if (!occluded) {
      const float delay = dist / kSpeedOfSound + ear_itd;
      const int n0 = (int)std::lround(delay * cfg.sampling_rate);
      if (n0 >= 0 && n0 < len) dst[n0] += ear_gain / dist;
    }
  }
}

void synth_one3(const Scene3& sc, const Config& cfg, const float* points,
                int receiver, const float* src_pos, int n_sources,
                float* out /* [4][n_sources][2][len] */) {
  const float rx = points[receiver * 3 + 0];
  const float ry = points[receiver * 3 + 1];
  const float rz = points[receiver * 3 + 2];
  const int len = cfg.rir_len;

  for (int si = 0; si < n_sources; ++si) {
    const float sx = src_pos[si * 3 + 0];
    const float sy = src_pos[si * 3 + 1];
    const float sz = src_pos[si * 3 + 2];

    BandEnergy acc(len);
    stochastic_field3(sc, cfg, sx, sy, sz, rx, ry, rz,
                      (uint64_t)(receiver * 73856093 + si * 19349663), acc);
    std::vector<float> diffuse;
    diffuse_pressure(cfg, acc,
                     cfg.seed ^ (uint64_t)(receiver * 31 + si * 7), diffuse);

    const float ddx = sx - rx, ddy = sy - ry, ddz = sz - rz;
    const float dh = std::sqrt(ddx * ddx + ddz * ddz);
    const float dist = std::max(
        std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz), cfg.grid_size * 0.5f);
    const float src_dir = std::atan2(ddz, ddx);
    const float cos_el = dh / std::max(dist, 1e-6f);
    const bool occluded =
        !direct_path_clear3(sc, cfg, rx, ry, rz, sx, sy, sz);

    for (int ai = 0; ai < 4; ++ai) {
      // azimuth index ai = rotation -90*ai (simulator.py:568-573);
      // elevation shortens the horizontal ITD/ILD cues (cos(el) projection
      // of the Woodworth model), the delay uses the true 3-D distance
      const float orient = (270.0f + 90.0f * ai) * 0.01745329252f;
      const float rel = src_dir - orient;
      const float itd = 0.09f / kSpeedOfSound * std::sin(rel) * cos_el;
      const float ild = 0.5f + 0.4f * std::sin(rel) * cos_el;

      for (int ch = 0; ch < 2; ++ch) {
        float* dst = out + ((size_t)ai * n_sources + si) * 2 * len +
                     (size_t)ch * len;
        const float ear_gain = (ch == 0) ? (1.0f - ild) : ild;
        const float ear_itd = (ch == 0) ? -itd * 0.5f : itd * 0.5f;
        for (int n = 0; n < len; ++n) dst[n] = 0.7f * diffuse[n];
        if (!occluded) {
          const float delay = dist / kSpeedOfSound + ear_itd;
          const int n0 = (int)std::lround(delay * cfg.sampling_rate);
          if (n0 >= 0 && n0 < len) dst[n0] += ear_gain / dist;
        }
      }
    }
  }
}

void synth_ambisonic_one3(const Scene3& sc, const Config& cfg,
                          const float* points, int receiver,
                          const float* src_pos, int n_sources, int order,
                          float* out /* [n_sources][n_sh][len] */) {
  const int n_sh = (order + 1) * (order + 1);
  const float rx = points[receiver * 3 + 0];
  const float ry = points[receiver * 3 + 1];
  const float rz = points[receiver * 3 + 2];
  const int len = cfg.rir_len;

  std::vector<float> carrier;
  std::vector<float> wenv(len), dirx(len), diry(len), dirz(len), dirr(len);
  float g[9];

  for (int si = 0; si < n_sources; ++si) {
    const float sx = src_pos[si * 3 + 0];
    const float sy = src_pos[si * 3 + 1];
    const float sz = src_pos[si * 3 + 2];

    BandEnergy acc(len, /*directional=*/true);
    stochastic_field3(sc, cfg, sx, sy, sz, rx, ry, rz,
                      (uint64_t)(receiver * 73856093 + si * 19349663), acc);

    // per-sample smoothed mean DOA (now with a vertical component) +
    // directionality ratio
    const float a = cfg.ema_a;
    float emx = 0.0f, emy = 0.0f, emz = 0.0f, emt = 0.0f;
    for (int n = 0; n < len; ++n) {
      emx = a * emx + (1 - a) * acc.ex[n];
      emy = a * emy + (1 - a) * acc.ey[n];
      emz = a * emz + (1 - a) * acc.ez[n];
      emt = a * emt + (1 - a) * acc.etot[n];
      float mag = std::sqrt(emx * emx + emy * emy + emz * emz);
      if (emt > 1e-20f && mag > 1e-20f) {
        dirx[n] = emx / mag;
        diry[n] = emy / mag;
        dirz[n] = emz / mag;
        dirr[n] = std::min(mag / emt, 1.0f);
      } else {
        dirx[n] = 1.0f; diry[n] = 0.0f; dirz[n] = 0.0f; dirr[n] = 0.0f;
      }
    }

    float* dst0 = out + (size_t)si * n_sh * len;
    std::memset(dst0, 0, sizeof(float) * (size_t)n_sh * len);

    for (int b = 0; b < kNumBands; ++b) {
      float ema = 0.0f;
      for (int n = 0; n < len; ++n) {
        ema = a * ema + (1 - a) * acc.e[b][n];
        wenv[n] = std::sqrt(std::max(ema, 0.0f));
      }
      band_noise(b, len, cfg.sampling_rate,
                 cfg.seed ^ (uint64_t)(receiver * 31 + si * 7 + b), carrier);
      for (int n = 0; n < len; ++n) {
        const float p = wenv[n] * carrier[n];
        sh_gains3(dirx[n], diry[n], dirz[n], dirr[n], order, g);
        for (int c = 0; c < n_sh; ++c) dst0[(size_t)c * len + n] += p * g[c];
      }
    }

    // direct path: exact 3-D SH encoding of the arrival direction
    const float ddx = sx - rx, ddy = sy - ry, ddz = sz - rz;
    const float dist =
        std::max(std::sqrt(ddx * ddx + ddy * ddy + ddz * ddz),
                 cfg.grid_size * 0.5f);
    if (direct_path_clear3(sc, cfg, rx, ry, rz, sx, sy, sz)) {
      const int n0 =
          (int)std::lround(dist / kSpeedOfSound * cfg.sampling_rate);
      if (n0 >= 0 && n0 < len) {
        sh_gains3(ddx / dist, ddz / dist, ddy / dist, 1.0f, order, g);
        for (int c = 0; c < n_sh; ++c)
          dst0[(size_t)c * len + n0] += g[c] / dist;
      }
    }
  }
}

Config make_config(int sampling_rate, int rir_len, int num_rays,
                   int max_bounces, float grid_size, float air_absorption,
                   uint64_t seed, const Material* materials, int n_materials,
                   bool transmission, bool diffraction) {
  Config cfg;
  cfg.sampling_rate = sampling_rate;
  cfg.rir_len = rir_len;
  // num_rays = 0 is legal: a direct-path-only trace (no stochastic field),
  // used by closed-form anchor tests; per-ray energy 1/num_rays is only
  // evaluated inside the ray loop, which doesn't run.
  cfg.num_rays = std::max(num_rays, 0);
  cfg.max_bounces = max_bounces;
  cfg.grid_size = grid_size;
  cfg.receiver_radius = grid_size * 0.6f;
  cfg.air_absorption = air_absorption;
  cfg.ema_a = std::exp(-1.0f / (0.005f * sampling_rate));
  cfg.seed = seed;
  cfg.enable_transmission = transmission;
  cfg.enable_diffraction = diffraction;
  cfg.materials = materials;
  cfg.n_materials = n_materials;
  return cfg;
}

// materials_flat: [n_mat][9] = absorption[4], scattering, transmission[4]
std::vector<Material> unpack_materials(const float* flat, int n_mat) {
  std::vector<Material> out(std::max(n_mat, 1));
  for (int i = 0; i < n_mat; ++i) {
    Material& m = out[i];
    for (int b = 0; b < kNumBands; ++b) m.absorption[b] = flat[i * 9 + b];
    m.scattering = flat[i * 9 + 4];
    float t_mean = 0.0f;
    for (int b = 0; b < kNumBands; ++b) {
      m.transmission[b] = flat[i * 9 + 5 + b];
      t_mean += m.transmission[b];
    }
    m.t_mean = t_mean / kNumBands;
  }
  return out;
}

SceneCtx make_scene(const uint8_t* occ, const uint8_t* mat_id, int h, int w,
                    float grid_size, bool diffraction) {
  SceneCtx sc;
  sc.grid = Grid{occ, mat_id, h, w};
  if (diffraction) sc.corners = find_corners(sc.grid, grid_size);
  return sc;
}

Scene3 make_scene3(const uint8_t* occ, const uint8_t* mat_id, int h, int w,
                   float grid_size, const float* floor_y, const float* ceil_y,
                   float floor_default, float ceil_default, int floor_mat,
                   int ceil_mat, int n_materials, bool diffraction) {
  Scene3 sc;
  sc.grid = Grid{occ, mat_id, h, w};
  sc.floor_y = floor_y;
  sc.ceil_y = ceil_y;
  sc.floor_default = floor_default;
  sc.ceil_default = ceil_default;
  sc.floor_mat = std::max(0, std::min(floor_mat, n_materials - 1));
  sc.ceil_mat = std::max(0, std::min(ceil_mat, n_materials - 1));
  if (diffraction) sc.corners = find_corners(sc.grid, grid_size);
  return sc;
}

void run_pool(int n_items, int num_threads,
              const std::function<void(int)>& fn) {
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_items) return;
      fn(i);
    }
  };
  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  nt = std::max(1, std::min(nt, n_items));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

}  // namespace

extern "C" {

// out: float32 [4, n_nodes, n_sources, 2, rir_len]
// points: float32 [n_nodes, 3]; occupancy: uint8 [grid_h, grid_w]
// mat_id: uint8 [grid_h, grid_w] or null (all cells -> material 0)
// materials: float32 [n_materials, 9] = absorption[4], scattering,
//            transmission[4]
int synth_rir_bank_v2(const float* points, int n_nodes,
                      const int32_t* sources, int n_sources,
                      const uint8_t* occupancy, const uint8_t* mat_id,
                      int grid_h, int grid_w, float grid_size,
                      int sampling_rate, int rir_len, int num_rays,
                      int max_bounces, const float* materials,
                      int n_materials, float air_absorption,
                      int enable_transmission, int enable_diffraction,
                      uint64_t seed, int num_threads, float* out) {
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  SceneCtx sc = make_scene(occupancy, mat_id, grid_h, grid_w, grid_size,
                           cfg.enable_diffraction);
  const size_t per_receiver = (size_t)4 * n_sources * 2 * rir_len;
  std::memset(out, 0, sizeof(float) * per_receiver * n_nodes);

  run_pool(n_nodes, num_threads, [&](int r) {
    // per-receiver view: out is [4, n_nodes, n_sources, 2, len]; the
    // per-receiver slice is strided over the leading azimuth axis, so
    // synth_one writes into a compact scratch then scatters.
    std::vector<float> scratch(per_receiver);
    synth_one(sc, cfg, points, n_nodes, r, sources, n_sources,
              scratch.data());
    for (int ai = 0; ai < 4; ++ai) {
      float* dst =
          out + (((size_t)ai * n_nodes + r) * n_sources) * 2 * rir_len;
      const float* src =
          scratch.data() + ((size_t)ai * n_sources) * 2 * rir_len;
      std::memcpy(dst, src, sizeof(float) * (size_t)n_sources * 2 * rir_len);
    }
  });
  return 0;
}

// Ambisonic bank: out float32 [n_nodes, n_sources, (order+1)^2, rir_len],
// ACN/SN3D channel order — tools/ambisonic.py::decode_rir_bank turns it
// into the 4-heading binaural bank (the reference's AmbisonicBinauralizer
// batch job, scripts/ambisonic_to_binaural.py).
int synth_ambisonic_bank(const float* points, int n_nodes,
                         const int32_t* sources, int n_sources,
                         const uint8_t* occupancy, const uint8_t* mat_id,
                         int grid_h, int grid_w, float grid_size,
                         int sampling_rate, int rir_len, int num_rays,
                         int max_bounces, const float* materials,
                         int n_materials, float air_absorption,
                         int enable_transmission, int enable_diffraction,
                         int ambisonic_order, uint64_t seed, int num_threads,
                         float* out) {
  if (ambisonic_order < 1 || ambisonic_order > 2) return -1;
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  SceneCtx sc = make_scene(occupancy, mat_id, grid_h, grid_w, grid_size,
                           cfg.enable_diffraction);
  const int n_sh = (ambisonic_order + 1) * (ambisonic_order + 1);
  run_pool(n_nodes, num_threads, [&](int r) {
    synth_ambisonic_one(sc, cfg, points, r, sources, n_sources,
                        ambisonic_order,
                        out + (size_t)r * n_sources * n_sh * rir_len);
  });
  return 0;
}

// v1 ABI (uniform material, no transmission/diffraction) — kept stable for
// existing callers; absorption: float32 [4].
int synth_rir_bank(const float* points, int n_nodes, const int32_t* sources,
                   int n_sources, const uint8_t* occupancy, int grid_h,
                   int grid_w, float grid_size, int sampling_rate,
                   int rir_len, int num_rays, int max_bounces,
                   const float* absorption, float scattering,
                   float air_absorption, uint64_t seed, int num_threads,
                   float* out) {
  float flat[9] = {absorption[0], absorption[1], absorption[2],
                   absorption[3], scattering, 0, 0, 0, 0};
  return synth_rir_bank_v2(points, n_nodes, sources, n_sources, occupancy,
                           nullptr, grid_h, grid_w, grid_size, sampling_rate,
                           rir_len, num_rays, max_bounces, flat, 1,
                           air_absorption, 0, 0, seed, num_threads, out);
}

// Per-step batched tracing at continuous poses (SS2.0's fresh-RIR-per-step).
// recv_xzh: float32 [batch, 3] = (x, z, heading rad); src_xz: [batch, 2];
// out: float32 [batch, 2, rir_len]. Threaded over the batch.
int trace_rirs_v2(const float* recv_xzh, int batch, const float* src_xz,
                  const uint8_t* occupancy, const uint8_t* mat_id,
                  int grid_h, int grid_w, float grid_size, int sampling_rate,
                  int rir_len, int num_rays, int max_bounces,
                  const float* materials, int n_materials,
                  float air_absorption, int enable_transmission,
                  int enable_diffraction, uint64_t seed, int num_threads,
                  float* out) {
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  SceneCtx sc = make_scene(occupancy, mat_id, grid_h, grid_w, grid_size,
                           cfg.enable_diffraction);
  run_pool(batch, num_threads, [&](int i) {
    trace_one_pose(sc, cfg, recv_xzh[i * 3 + 0], recv_xzh[i * 3 + 1],
                   recv_xzh[i * 3 + 2], src_xz[i * 2 + 0], src_xz[i * 2 + 1],
                   out + (size_t)i * 2 * rir_len);
  });
  return 0;
}

int trace_rirs(const float* recv_xzh, int batch, const float* src_xz,
               const uint8_t* occupancy, int grid_h, int grid_w,
               float grid_size, int sampling_rate, int rir_len, int num_rays,
               int max_bounces, const float* absorption, float scattering,
               float air_absorption, uint64_t seed, int num_threads,
               float* out) {
  float flat[9] = {absorption[0], absorption[1], absorption[2],
                   absorption[3], scattering, 0, 0, 0, 0};
  return trace_rirs_v2(recv_xzh, batch, src_xz, occupancy, nullptr, grid_h,
                       grid_w, grid_size, sampling_rate, rir_len, num_rays,
                       max_bounces, flat, 1, air_absorption, 0, 0, seed,
                       num_threads, out);
}

// ------------------------------------------------------ 3-D C ABI (ctypes)

// 3-D binaural bank. points: float32 [n_nodes, 3] RECEIVER EAR positions
// (x, y, z) with any ear-height offset already applied; src_pos: float32
// [n_sources, 3] (the caller applies the reference's +1.5 m goal offset,
// simulator.py:390). floor_y/ceil_y: float32 [grid_h, grid_w] per-cell
// surface heights (tools/mesh_metadata.py heightfields) or null for flat
// floor_default/ceil_default planes. floor_mat/ceil_mat index the material
// table. out: float32 [4, n_nodes, n_sources, 2, rir_len].
int synth_rir_bank_3d(const float* points, int n_nodes, const float* src_pos,
                      int n_sources, const uint8_t* occupancy,
                      const uint8_t* mat_id, int grid_h, int grid_w,
                      float grid_size, const float* floor_y,
                      const float* ceil_y, float floor_default,
                      float ceil_default, int floor_mat, int ceil_mat,
                      int sampling_rate, int rir_len, int num_rays,
                      int max_bounces, const float* materials,
                      int n_materials, float air_absorption,
                      int enable_transmission, int enable_diffraction,
                      uint64_t seed, int num_threads, float* out) {
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  Scene3 sc = make_scene3(occupancy, mat_id, grid_h, grid_w, grid_size,
                          floor_y, ceil_y, floor_default, ceil_default,
                          floor_mat, ceil_mat, (int)mats.size(),
                          cfg.enable_diffraction);
  const size_t per_receiver = (size_t)4 * n_sources * 2 * rir_len;
  std::memset(out, 0, sizeof(float) * per_receiver * n_nodes);
  run_pool(n_nodes, num_threads, [&](int r) {
    std::vector<float> scratch(per_receiver);
    synth_one3(sc, cfg, points, r, src_pos, n_sources, scratch.data());
    for (int ai = 0; ai < 4; ++ai) {
      float* dst =
          out + (((size_t)ai * n_nodes + r) * n_sources) * 2 * rir_len;
      const float* src =
          scratch.data() + ((size_t)ai * n_sources) * 2 * rir_len;
      std::memcpy(dst, src, sizeof(float) * (size_t)n_sources * 2 * rir_len);
    }
  });
  return 0;
}

// 3-D ambisonic bank with elevation-dependent SH encoding.
// out: float32 [n_nodes, n_sources, (order+1)^2, rir_len], ACN/SN3D.
int synth_ambisonic_bank_3d(const float* points, int n_nodes,
                            const float* src_pos, int n_sources,
                            const uint8_t* occupancy, const uint8_t* mat_id,
                            int grid_h, int grid_w, float grid_size,
                            const float* floor_y, const float* ceil_y,
                            float floor_default, float ceil_default,
                            int floor_mat, int ceil_mat, int sampling_rate,
                            int rir_len, int num_rays, int max_bounces,
                            const float* materials, int n_materials,
                            float air_absorption, int enable_transmission,
                            int enable_diffraction, int ambisonic_order,
                            uint64_t seed, int num_threads, float* out) {
  if (ambisonic_order < 1 || ambisonic_order > 2) return -1;
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  Scene3 sc = make_scene3(occupancy, mat_id, grid_h, grid_w, grid_size,
                          floor_y, ceil_y, floor_default, ceil_default,
                          floor_mat, ceil_mat, (int)mats.size(),
                          cfg.enable_diffraction);
  const int n_sh = (ambisonic_order + 1) * (ambisonic_order + 1);
  run_pool(n_nodes, num_threads, [&](int r) {
    synth_ambisonic_one3(sc, cfg, points, r, src_pos, n_sources,
                         ambisonic_order,
                         out + (size_t)r * n_sources * n_sh * rir_len);
  });
  return 0;
}

// Per-step batched 3-D tracing at continuous poses.
// recv_xyzh: float32 [batch, 4] = (x, y, z, heading rad) ear positions;
// src_xyz: float32 [batch, 3]; out: float32 [batch, 2, rir_len].
int trace_rirs_3d(const float* recv_xyzh, int batch, const float* src_xyz,
                  const uint8_t* occupancy, const uint8_t* mat_id,
                  int grid_h, int grid_w, float grid_size,
                  const float* floor_y, const float* ceil_y,
                  float floor_default, float ceil_default, int floor_mat,
                  int ceil_mat, int sampling_rate, int rir_len, int num_rays,
                  int max_bounces, const float* materials, int n_materials,
                  float air_absorption, int enable_transmission,
                  int enable_diffraction, uint64_t seed, int num_threads,
                  float* out) {
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  Scene3 sc = make_scene3(occupancy, mat_id, grid_h, grid_w, grid_size,
                          floor_y, ceil_y, floor_default, ceil_default,
                          floor_mat, ceil_mat, (int)mats.size(),
                          cfg.enable_diffraction);
  run_pool(batch, num_threads, [&](int i) {
    const float rx = recv_xyzh[i * 4 + 0];
    const float ry = recv_xyzh[i * 4 + 1];
    const float rz = recv_xyzh[i * 4 + 2];
    const float heading = recv_xyzh[i * 4 + 3];
    const float sx = src_xyz[i * 3 + 0];
    const float sy = src_xyz[i * 3 + 1];
    const float sz = src_xyz[i * 3 + 2];
    const uint64_t pose_salt =
        (uint64_t)(int64_t)std::lround(rx * 512.0f) * 73856093ull ^
        (uint64_t)(int64_t)std::lround(rz * 512.0f) * 19349663ull ^
        (uint64_t)(int64_t)std::lround(sx * 512.0f) * 83492791ull ^
        (uint64_t)(int64_t)std::lround(sz * 512.0f);
    BandEnergy acc(cfg.rir_len);
    stochastic_field3(sc, cfg, sx, sy, sz, rx, ry, rz, pose_salt, acc);
    binaural_from_field3(sc, cfg, acc, cfg.seed ^ pose_salt, rx, ry, rz,
                         heading, sx, sy, sz,
                         out + (size_t)i * 2 * cfg.rir_len);
  });
  return 0;
}

// Temporal-coherence variant of trace_rirs_3d — the analog of the
// reference engine's temporalCoherence setting (SoundSpaces2.md config
// table, ~10x ray reduction for continuous motion; the reference enables
// it for its continuous simulator, continuous_simulator.py:115-126).
//
// The stochastic energy field accumulated at the previous pose is cached
// per batch item (state_e, caller-owned). When the (receiver, source)
// pose moved less than max_delta since the cached trace, only
// refresh_rays fresh rays are traced (each carrying energy 1/refresh_rays
// so the partial field is an unbiased full-field estimate) and blended
// into the cache with weight w = refresh_rays/num_rays — an exponential
// moving average whose steady-state effective ray count matches a full
// num_rays retrace while costing ~num_rays/refresh_rays less per call.
// The direct arrival, ITD/ILD cues, occlusion test and diffraction are
// recomputed exactly at the NEW pose every call (only the diffuse field
// lags, bounded by max_delta), matching the reference semantics where
// temporal coherence smooths the late field under small motion.
//
// state_e: float32 [batch][kNumBands][rir_len], zero-init by the caller;
// state_pose: float32 [batch][7] = (rx,ry,rz,sx,sy,sz,valid), zero-init;
// frame_idx: monotonically increasing call counter — salts each refresh
// ray set so successive partial traces explore fresh directions.
int trace_rirs_3d_coherent(
    const float* recv_xyzh, int batch, const float* src_xyz,
    const uint8_t* occupancy, const uint8_t* mat_id, int grid_h,
    int grid_w, float grid_size, const float* floor_y, const float* ceil_y,
    float floor_default, float ceil_default, int floor_mat, int ceil_mat,
    int sampling_rate, int rir_len, int num_rays, int max_bounces,
    const float* materials, int n_materials, float air_absorption,
    int enable_transmission, int enable_diffraction, uint64_t seed,
    int num_threads, int refresh_rays, float max_delta, uint64_t frame_idx,
    float* state_e, float* state_pose, float* out) {
  auto mats = unpack_materials(materials, n_materials);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(),
                           (int)mats.size(), enable_transmission != 0,
                           enable_diffraction != 0);
  Scene3 sc = make_scene3(occupancy, mat_id, grid_h, grid_w, grid_size,
                          floor_y, ceil_y, floor_default, ceil_default,
                          floor_mat, ceil_mat, (int)mats.size(),
                          cfg.enable_diffraction);
  const int refresh = std::max(1, std::min(refresh_rays, cfg.num_rays));
  run_pool(batch, num_threads, [&](int i) {
    const float rx = recv_xyzh[i * 4 + 0];
    const float ry = recv_xyzh[i * 4 + 1];
    const float rz = recv_xyzh[i * 4 + 2];
    const float heading = recv_xyzh[i * 4 + 3];
    const float sx = src_xyz[i * 3 + 0];
    const float sy = src_xyz[i * 3 + 1];
    const float sz = src_xyz[i * 3 + 2];
    const uint64_t pose_salt =
        (uint64_t)(int64_t)std::lround(rx * 512.0f) * 73856093ull ^
        (uint64_t)(int64_t)std::lround(rz * 512.0f) * 19349663ull ^
        (uint64_t)(int64_t)std::lround(sx * 512.0f) * 83492791ull ^
        (uint64_t)(int64_t)std::lround(sz * 512.0f);
    float* sp = state_pose + (size_t)i * 7;
    float* se = state_e + (size_t)i * kNumBands * cfg.rir_len;
    const float drx = rx - sp[0], dry = ry - sp[1], drz = rz - sp[2];
    const float dsx = sx - sp[3], dsy = sy - sp[4], dsz = sz - sp[5];
    const float recv_d = std::sqrt(drx * drx + dry * dry + drz * drz);
    const float src_d = std::sqrt(dsx * dsx + dsy * dsy + dsz * dsz);
    const bool reuse = sp[6] > 0.5f && recv_d <= max_delta &&
                       src_d <= max_delta && refresh < cfg.num_rays;
    BandEnergy acc(cfg.rir_len);
    if (!reuse) {
      // cold start / teleport: full retrace, identical to trace_rirs_3d
      stochastic_field3(sc, cfg, sx, sy, sz, rx, ry, rz, pose_salt, acc);
      for (int b = 0; b < kNumBands; ++b)
        std::copy(acc.e[b].begin(), acc.e[b].end(),
                  se + (size_t)b * cfg.rir_len);
    } else {
      Config cfgK = cfg;
      cfgK.num_rays = refresh;  // per-ray energy 1/refresh: unbiased
      stochastic_field3(
          sc, cfgK, sx, sy, sz, rx, ry, rz,
          pose_salt ^ (0xd1b54a32d192ed03ull * (frame_idx + 1)), acc);
      const float w = (float)refresh / (float)cfg.num_rays;
      for (int b = 0; b < kNumBands; ++b) {
        float* cache = se + (size_t)b * cfg.rir_len;
        for (int n = 0; n < cfg.rir_len; ++n) {
          cache[n] = (1.0f - w) * cache[n] + w * acc.e[b][n];
          acc.e[b][n] = cache[n];
        }
      }
    }
    sp[0] = rx; sp[1] = ry; sp[2] = rz;
    sp[3] = sx; sp[4] = sy; sp[5] = sz; sp[6] = 1.0f;
    // noise seed fixed per item (not per pose): the carrier stays stable
    // across frames so coherent motion yields coherent audio
    binaural_from_field3(sc, cfg, acc,
                         cfg.seed ^ (0x9e3779b97f4a7c15ull * (uint64_t)i),
                         rx, ry, rz, heading, sx, sy, sz,
                         out + (size_t)i * 2 * cfg.rir_len);
  });
  return 0;
}

// Physical sanity probes — the AudioSensor's sourceIsVisible() /
// getRayEfficiency() surface (SoundSpaces2 quick tutorial notebook).
// recv_xz: float32 [batch, 2]; src_xz: float32 [batch, 2];
// out: float32 [batch, 2] = (ray_efficiency in [0,1], source_visible 0/1).
int ray_stats(const float* recv_xz, int batch, const float* src_xz,
              const uint8_t* occupancy, int grid_h, int grid_w,
              float grid_size, int sampling_rate, int rir_len, int num_rays,
              int max_bounces, const float* absorption, float scattering,
              float air_absorption, uint64_t seed, int num_threads,
              float* out) {
  float flat[9] = {absorption[0], absorption[1], absorption[2],
                   absorption[3], scattering, 0, 0, 0, 0};
  auto mats = unpack_materials(flat, 1);
  Config cfg = make_config(sampling_rate, rir_len, num_rays, max_bounces,
                           grid_size, air_absorption, seed, mats.data(), 1,
                           false, false);
  Grid grid{occupancy, nullptr, grid_h, grid_w};
  run_pool(batch, num_threads, [&](int i) {
    const float rx = recv_xz[i * 2 + 0], rz = recv_xz[i * 2 + 1];
    const float sx = src_xz[i * 2 + 0], sz = src_xz[i * 2 + 1];
    BandEnergy acc(cfg.rir_len);
    const uint64_t salt = (uint64_t)(i * 2654435761u + 1);
    int hit = 0;
    for (int r = 0; r < cfg.num_rays; ++r) {
      XorShift ray_rng(cfg.seed ^ salt ^
                       (0x9e3779b97f4a7c15ull * (uint64_t)(r + 1)));
      float ang = 6.2831853f * (r + ray_rng.uniform()) / cfg.num_rays;
      if (trace_ray(grid, cfg, sx, sz, rx, rz, std::cos(ang), std::sin(ang),
                    ray_rng, acc))
        ++hit;
    }
    out[i * 2 + 0] = cfg.num_rays > 0 ? (float)hit / cfg.num_rays : 0.0f;
    out[i * 2 + 1] =
        direct_path_clear(grid, cfg, rx, rz, sx, sz) ? 1.f : 0.f;
  });
  return 0;
}

}  // extern "C"
