"""Parametric geometric-acoustics RIR synthesis, fully on device.

The reference's continuous sim gets a fresh RIR per step from the
RLRAudioPropagation C++ ray tracer (soundspaces/continuous_simulator.py:
115-126; 4 frequency bands, configurable materials). This repo's native
tracer (csrc/rir_tracer.cpp) fills that role via host callback — but host
callbacks don't run over every TPU attachment, and a Monte-Carlo tracer is
the wrong shape for an accelerator anyway. This module is the TPU-native
alternative: a closed-form parametric synthesizer in the spirit of FAST-RIR
(arxiv 2110.04057) and differentiable-FDN rendering (arxiv 2510.00238) —
every component is a fixed-shape elementwise/one-hot construction, so it
jits, vmaps over envs, differentiates, and runs entirely in HBM:

- direct path: distance delay + Woodworth ITD + sinusoidal ILD, matching
  the conventions of scene/synthetic.synth_rir_bank so parametric and bank
  modes are drop-in interchangeable;
- early reflections: first-order image sources over the scene's bounding
  shoebox (4 walls + floor + ceiling), each with its own bearing-dependent
  binauralization and sqrt(1 - absorption) reflection loss;
- late tail: 4 frequency bands (the ray tracer's band count) of STATIC
  band-limited noise tables, each decaying at exp(-6.908 t / RT60_b) with
  per-band RT60 from Sabine's formula over the shoebox geometry and the
  material absorption spectrum (tools/materials.py). Static tables make
  consecutive steps temporally coherent (the reference's temporalCoherence
  role); a per-episode circular shift decorrelates episodes.

No lax.scan at audio rate, no FFTs: the synthesis cost is a handful of
[L]-length elementwise passes — microseconds per pose on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SPEED_OF_SOUND = 343.0

# 4-band split matching the ray tracer's band count; edges in Hz
DEFAULT_BAND_EDGES = (0.0, 176.0, 775.0, 3408.0, 1e9)


@functools.lru_cache(maxsize=8)
def band_noise_tables(
    rir_len: int, sampling_rate: int, seed: int = 0,
    band_edges: tuple = DEFAULT_BAND_EDGES,
) -> np.ndarray:
    """[4, 2*rir_len] float32 unit-variance band-limited noise (doubled
    length so a per-episode circular shift is a single dynamic slice).
    Computed host-side once per (length, rate); shipped as a constant."""
    n_bands = len(band_edges) - 1
    rng = np.random.default_rng(seed)
    n = 2 * rir_len
    freqs = np.fft.rfftfreq(n, 1.0 / sampling_rate)
    out = np.zeros((n_bands, n), np.float32)
    for b in range(n_bands):
        spec = (
            rng.standard_normal(len(freqs)) + 1j * rng.standard_normal(len(freqs))
        )
        mask = (freqs >= band_edges[b]) & (freqs < band_edges[b + 1])
        spec = np.where(mask, spec, 0.0)
        x = np.fft.irfft(spec, n=n)
        std = x.std()
        if std > 1e-12:
            x = x / std
        out[b] = x.astype(np.float32)
    return out


def sabine_rt60(
    bbox_size: jax.Array,  # [3] room extents (x, y, z) in meters
    absorption: jax.Array,  # [B] per-band mean surface absorption
) -> jax.Array:
    """Per-band RT60 = 0.161 V / (S * alpha_b) (Sabine), clipped to a sane
    range. bbox extents clamp to >= 1 m so degenerate scenes stay finite."""
    ext = jnp.maximum(bbox_size, 1.0)
    volume = ext[0] * ext[1] * ext[2]
    surface = 2.0 * (
        ext[0] * ext[1] + ext[1] * ext[2] + ext[0] * ext[2]
    )
    rt = 0.161 * volume / (surface * jnp.maximum(absorption, 1e-3))
    return jnp.clip(rt, 0.05, 4.0)


def _binaural_impulse(
    t_idx: jax.Array,  # [L] iota
    dist: jax.Array,
    bearing: jax.Array,  # source bearing relative to heading (radians)
    gain: jax.Array,
    sampling_rate: int,
) -> jax.Array:
    """One broadband arrival as a 2-channel one-hot with ITD/ILD
    (synthetic.synth_rir_bank:55-63 conventions)."""
    itd = 0.09 / SPEED_OF_SOUND * jnp.sin(bearing)
    ild = 0.5 + 0.4 * jnp.sin(bearing)  # right-ear gain
    delay = dist / SPEED_OF_SOUND
    out = []
    for ear_gain, ear_itd in ((1.0 - ild, -itd / 2), (ild, itd / 2)):
        d_samp = jnp.round(
            (delay + ear_itd) * sampling_rate
        ).astype(jnp.int32)
        d_samp = jnp.clip(d_samp, 0, t_idx.shape[0] - 1)
        out.append((t_idx == d_samp) * (gain * ear_gain))
    return jnp.stack(out)  # [2, L]


@functools.partial(
    jax.jit,
    static_argnames=("sampling_rate", "rir_len", "num_reflections"),
)
def parametric_binaural_rir(
    x: jax.Array,
    z: jax.Array,
    heading: jax.Array,  # forward = (cos h, sin h) in the (x, z) plane
    src_x: jax.Array,
    src_z: jax.Array,
    noise: jax.Array,  # [B, 2L] band noise (band_noise_tables)
    rt60: jax.Array,  # [B] per-band RT60 seconds
    bbox_min: jax.Array,  # [2] scene (x, z) minimum
    bbox_max: jax.Array,  # [2]
    shift: jax.Array,  # int32 per-episode decorrelation shift in [0, L)
    sampling_rate: int,
    rir_len: int,
    room_height: float = 3.0,
    wall_absorption: float = 0.3,
    tail_gain: float = 0.05,
    num_reflections: int = 6,
) -> jax.Array:
    """Binaural RIR [2, rir_len] float32 at an exact continuous pose."""
    t_idx = jnp.arange(rir_len, dtype=jnp.int32)
    t = t_idx.astype(jnp.float32) / sampling_rate
    grid_floor = 0.25

    dx, dz = src_x - x, src_z - z
    dist = jnp.maximum(jnp.sqrt(dx * dx + dz * dz), grid_floor)
    bearing = jnp.arctan2(dz, dx) - heading
    rir = _binaural_impulse(t_idx, dist, bearing, 1.0 / dist, sampling_rate)

    # first-order image sources over the bounding shoebox: 4 walls mirror
    # (x or z), floor/ceiling mirror the height axis (receiver and source
    # both at ~1.5 m like the reference's source offset)
    h_src, h_rec = 1.5, 1.5
    rho = jnp.sqrt(jnp.maximum(1.0 - wall_absorption, 0.0))
    images = [
        (2.0 * bbox_min[0] - src_x, src_z, 0.0),
        (2.0 * bbox_max[0] - src_x, src_z, 0.0),
        (src_x, 2.0 * bbox_min[1] - src_z, 0.0),
        (src_x, 2.0 * bbox_max[1] - src_z, 0.0),
        (src_x, src_z, -(h_src + h_rec)),             # floor bounce
        (src_x, src_z, 2.0 * room_height - h_src - h_rec),  # ceiling
    ]
    for ix, iz, dy in images[:num_reflections]:
        ddx, ddz = ix - x, iz - z
        d = jnp.maximum(
            jnp.sqrt(ddx * ddx + ddz * ddz + dy * dy), grid_floor
        )
        b = jnp.arctan2(ddz, ddx) - heading
        rir = rir + _binaural_impulse(t_idx, d, b, rho / d, sampling_rate)

    # per-band decaying diffuse tail from the static noise tables
    delay = dist / SPEED_OF_SOUND
    onset = jnp.round(delay * sampling_rate).astype(jnp.int32)
    l = rir_len
    start = (shift % l).astype(jnp.int32)
    tail = jnp.zeros((l,), jnp.float32)
    for b in range(noise.shape[0]):
        n_b = jax.lax.dynamic_slice_in_dim(noise[b], start * (b + 1) % l, l)
        decay = jnp.exp(
            -6.908 * jnp.maximum(t - delay, 0.0) / jnp.maximum(rt60[b], 0.05)
        )
        tail = tail + n_b * decay
    tail = tail * (t_idx >= onset) * (tail_gain / dist)
    # diffuse field: equal in both ears (decorrelated enough via bands)
    return rir + 0.7 * tail[None, :]
