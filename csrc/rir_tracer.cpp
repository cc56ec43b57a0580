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
//  - direct path: distance delay, 1/r attenuation, Woodworth ITD + sin ILD
//    per ear, per 90-degree heading;
//  - early + late field: energy rays marched from the source through the
//    grid (DDA), specular reflection with per-band absorption and
//    scattering jitter at wall hits; energy deposited when a ray passes
//    within the receiver radius, at time = path_length / c;
//  - per-band energy envelopes -> pressure via sqrt(E) * band-filtered
//    noise with deterministic per-(source,receiver) phase.
//
// Parallelism: a std::thread pool over receivers (the reference binauralizes
// with 160 host threads, scripts/ambisonic_to_binaural.py:43).
//
// C ABI (ctypes): synth_rir_bank(...) fills [4, n_nodes, n_sources, 2, len].

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

namespace {

constexpr float kSpeedOfSound = 343.0f;
constexpr int kNumBands = 4;  // matches the reference tracer's 4 bands

struct Config {
  int sampling_rate;
  int rir_len;
  int num_rays;
  int max_bounces;
  float grid_size;       // meters per occupancy cell
  float receiver_radius; // meters
  float absorption[kNumBands]; // wall absorption per band
  float scattering;      // fraction of diffuse reflection
  float air_absorption;  // per-meter broadband loss
  uint64_t seed;
};

struct Grid {
  const uint8_t* occ; // [h][w], 1 = walkable
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
};

struct BandEnergy {
  std::vector<float> e[kNumBands]; // energy per output sample
  explicit BandEnergy(int len) {
    for (auto& v : e) v.assign(len, 0.0f);
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
      // wall hit: reflect about the blocked axis, apply absorption/scatter
      bool bx = !grid.walkable_at(nx, z, cfg.grid_size);
      bool bz = !grid.walkable_at(x, nz, cfg.grid_size);
      if (bx || !bz) dx = -dx;
      if (bz || !bx) dz = -dz;
      if (rng.uniform() < cfg.scattering) {
        float ang = rng.range(0.0f, 6.2831853f);
        dx = std::cos(ang); dz = std::sin(ang);
      }
      for (int b = 0; b < kNumBands; ++b)
        energy[b] *= (1.0f - cfg.absorption[b]);
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
        for (int b = 0; b < kNumBands; ++b)
          out.e[b][n] += energy[b] * air;
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

void synth_one(const Grid& grid, const Config& cfg, const float* points,
               int n_nodes, int receiver, const int32_t* sources,
               int n_sources, float* out /* [4][n_sources][2][len] */) {
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
    XorShift ray_rng(cfg.seed ^ (uint64_t)(receiver * 73856093 + src * 19349663));
    for (int r = 0; r < cfg.num_rays; ++r) {
      float ang = 6.2831853f * (r + ray_rng.uniform()) / cfg.num_rays;
      trace_ray(grid, cfg, sx, sz, rx, rz, std::cos(ang), std::sin(ang),
                ray_rng, acc);
    }

    // diffuse pressure tail = sum over bands of sqrt(smoothed energy)*noise
    std::vector<float> diffuse(len, 0.0f);
    for (int b = 0; b < kNumBands; ++b) {
      // short moving average smooths ray shot noise
      float ema = 0.0f;
      const float a = 0.995f;
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
    const bool occluded = [&] {
      // simple LoS check
      int steps = (int)(dist / (cfg.grid_size * 0.25f));
      for (int i = 1; i < steps; ++i) {
        float t = (float)i / steps;
        if (!grid.walkable_at(rx + ddx * t, rz + ddz * t, cfg.grid_size))
          return true;
      }
      return false;
    }();

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
void trace_one_pose(const Grid& grid, const Config& cfg, float rx, float rz,
                    float heading, float sx, float sz,
                    float* out /* [2][len] */) {
  const int len = cfg.rir_len;

  BandEnergy acc(len);
  const uint64_t pose_salt =
      (uint64_t)(int64_t)std::lround(rx * 512.0f) * 73856093ull ^
      (uint64_t)(int64_t)std::lround(rz * 512.0f) * 19349663ull ^
      (uint64_t)(int64_t)std::lround(sx * 512.0f) * 83492791ull ^
      (uint64_t)(int64_t)std::lround(sz * 512.0f);
  XorShift ray_rng(cfg.seed ^ pose_salt);
  for (int r = 0; r < cfg.num_rays; ++r) {
    float ang = 6.2831853f * (r + ray_rng.uniform()) / cfg.num_rays;
    trace_ray(grid, cfg, sx, sz, rx, rz, std::cos(ang), std::sin(ang),
              ray_rng, acc);
  }

  std::vector<float> carrier;
  std::vector<float> envelope(len);
  std::vector<float> diffuse(len, 0.0f);
  for (int b = 0; b < kNumBands; ++b) {
    float ema = 0.0f;
    const float a = 0.995f;
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

}  // namespace

extern "C" {

// out: float32 [4, n_nodes, n_sources, 2, rir_len]
// points: float32 [n_nodes, 3]; occupancy: uint8 [grid_h, grid_w]
// absorption: float32 [4]
int synth_rir_bank(const float* points, int n_nodes, const int32_t* sources,
                   int n_sources, const uint8_t* occupancy, int grid_h,
                   int grid_w, float grid_size, int sampling_rate,
                   int rir_len, int num_rays, int max_bounces,
                   const float* absorption, float scattering,
                   float air_absorption, uint64_t seed, int num_threads,
                   float* out) {
  Config cfg;
  cfg.sampling_rate = sampling_rate;
  cfg.rir_len = rir_len;
  cfg.num_rays = std::max(num_rays, 1);
  cfg.max_bounces = max_bounces;
  cfg.grid_size = grid_size;
  cfg.receiver_radius = grid_size * 0.6f;
  for (int b = 0; b < kNumBands; ++b) cfg.absorption[b] = absorption[b];
  cfg.scattering = scattering;
  cfg.air_absorption = air_absorption;
  cfg.seed = seed;

  Grid grid{occupancy, grid_h, grid_w};
  const size_t per_receiver = (size_t)4 * n_sources * 2 * rir_len;
  std::memset(out, 0, sizeof(float) * per_receiver * n_nodes);

  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int r = next.fetch_add(1);
      if (r >= n_nodes) return;
      // per-receiver view: out is [4, n_nodes, n_sources, 2, len]; the
      // per-receiver slice is strided over the leading azimuth axis, so
      // synth_one writes into a compact scratch then scatters.
      std::vector<float> scratch(per_receiver);
      synth_one(grid, cfg, points, n_nodes, r, sources, n_sources,
                scratch.data());
      for (int ai = 0; ai < 4; ++ai) {
        float* dst = out + (((size_t)ai * n_nodes + r) * n_sources) * 2 * rir_len;
        const float* src = scratch.data() + ((size_t)ai * n_sources) * 2 * rir_len;
        std::memcpy(dst, src, sizeof(float) * (size_t)n_sources * 2 * rir_len);
      }
    }
  };

  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  nt = std::max(1, std::min(nt, n_nodes));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// Per-step batched tracing at continuous poses (SS2.0's fresh-RIR-per-step).
// recv_xzh: float32 [batch, 3] = (x, z, heading rad); src_xz: [batch, 2];
// out: float32 [batch, 2, rir_len]. Threaded over the batch.
int trace_rirs(const float* recv_xzh, int batch, const float* src_xz,
               const uint8_t* occupancy, int grid_h, int grid_w,
               float grid_size, int sampling_rate, int rir_len, int num_rays,
               int max_bounces, const float* absorption, float scattering,
               float air_absorption, uint64_t seed, int num_threads,
               float* out) {
  Config cfg;
  cfg.sampling_rate = sampling_rate;
  cfg.rir_len = rir_len;
  cfg.num_rays = std::max(num_rays, 1);
  cfg.max_bounces = max_bounces;
  cfg.grid_size = grid_size;
  cfg.receiver_radius = grid_size * 0.6f;
  for (int b = 0; b < kNumBands; ++b) cfg.absorption[b] = absorption[b];
  cfg.scattering = scattering;
  cfg.air_absorption = air_absorption;
  cfg.seed = seed;

  Grid grid{occupancy, grid_h, grid_w};
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      trace_one_pose(grid, cfg, recv_xzh[i * 3 + 0], recv_xzh[i * 3 + 1],
                     recv_xzh[i * 3 + 2], src_xz[i * 2 + 0],
                     src_xz[i * 2 + 1], out + (size_t)i * 2 * rir_len);
    }
  };
  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  nt = std::max(1, std::min(nt, batch));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

// Physical sanity probes — the AudioSensor's sourceIsVisible() /
// getRayEfficiency() surface (SoundSpaces2 quick tutorial notebook).
// recv_xz: float32 [batch, 2]; src_xz: [batch, 2];
// out: float32 [batch, 2] = (ray_efficiency in [0,1], source_visible 0/1).
int ray_stats(const float* recv_xz, int batch, const float* src_xz,
              const uint8_t* occupancy, int grid_h, int grid_w,
              float grid_size, int sampling_rate, int rir_len, int num_rays,
              int max_bounces, const float* absorption, float scattering,
              float air_absorption, uint64_t seed, int num_threads,
              float* out) {
  Config cfg;
  cfg.sampling_rate = sampling_rate;
  cfg.rir_len = rir_len;
  cfg.num_rays = std::max(num_rays, 1);
  cfg.max_bounces = max_bounces;
  cfg.grid_size = grid_size;
  cfg.receiver_radius = grid_size * 0.6f;
  for (int b = 0; b < kNumBands; ++b) cfg.absorption[b] = absorption[b];
  cfg.scattering = scattering;
  cfg.air_absorption = air_absorption;
  cfg.seed = seed;

  Grid grid{occupancy, grid_h, grid_w};
  std::atomic<int> next{0};
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch) return;
      const float rx = recv_xz[i * 2 + 0], rz = recv_xz[i * 2 + 1];
      const float sx = src_xz[i * 2 + 0], sz = src_xz[i * 2 + 1];
      BandEnergy acc(cfg.rir_len);
      XorShift ray_rng(cfg.seed ^ (uint64_t)(i * 2654435761u + 1));
      int hit = 0;
      for (int r = 0; r < cfg.num_rays; ++r) {
        float ang = 6.2831853f * (r + ray_rng.uniform()) / cfg.num_rays;
        if (trace_ray(grid, cfg, sx, sz, rx, rz, std::cos(ang),
                      std::sin(ang), ray_rng, acc))
          ++hit;
      }
      out[i * 2 + 0] = (float)hit / cfg.num_rays;
      out[i * 2 + 1] = direct_path_clear(grid, cfg, rx, rz, sx, sz) ? 1.f : 0.f;
    }
  };
  int nt = num_threads > 0 ? num_threads
                           : (int)std::thread::hardware_concurrency();
  nt = std::max(1, std::min(nt, batch));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int i = 0; i < nt; ++i) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
