"""Acoustic analysis utilities — the SS2.0 tutorial-notebook surface.

The reference's quick tutorial (examples/soundspaces2_quick_tutorial.ipynb)
probes the rendered acoustics three ways: `audio_sensor.sourceIsVisible()`,
`audio_sensor.getRayEfficiency()` and an RT60 reverberation-time measurement
via pyroomacoustics. TPU-native equivalents:

- `measure_rt60` — batched Schroeder backward-integration RT60 in pure JAX
  (jit/vmap-able, runs on device over whole RIR banks at once);
- `source_is_visible` — line-of-sight test over the scene occupancy grid
  (jit/vmap-able), the geometric content of sourceIsVisible();
- ray efficiency — `PoseTracer.ray_stats` (tools/rir_synth.py) asks the
  native C++ tracer what fraction of indirect rays reached the receiver,
  the content of getRayEfficiency().
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("sampling_rate", "decay_db"))
def measure_rt60(
    rir: jax.Array,  # [..., L] impulse response(s)
    sampling_rate: int,
    decay_db: int = 30,
) -> jax.Array:
    """Reverberation time via Schroeder backward integration.

    Least-squares-fits the Schroeder energy-decay curve over its -5 dB to
    -(5 + decay_db) dB region and extrapolates the fitted slope to the 60 dB
    decay time (the T30 estimate pyroomacoustics' measure_rt60 computes in
    the reference tutorial; a masked linear regression, still jit/vmap-able,
    rather than two threshold-crossing samples — robust on noisy or
    early-energy-light RIRs). Returns seconds, shape rir.shape[:-1].
    """
    energy = rir.astype(jnp.float32) ** 2
    # Schroeder integral: E(t) = sum_{u>=t} e(u), descending cumsum
    sch = jnp.cumsum(energy[..., ::-1], axis=-1)[..., ::-1]
    db = 10.0 * jnp.log10(jnp.maximum(sch, 1e-20))
    db = db - db[..., :1]  # 0 dB at t=0
    t = jnp.arange(rir.shape[-1], dtype=jnp.float32)
    # masked least squares of db ~ a + b*t over the -5..-(5+decay_db) window
    mask = (db <= -5.0) & (db >= -5.0 - decay_db)
    w = mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w, axis=-1), 2.0)
    st = jnp.sum(w * t, axis=-1)
    sd = jnp.sum(w * db, axis=-1)
    stt = jnp.sum(w * t * t, axis=-1)
    std = jnp.sum(w * t * db, axis=-1)
    denom = n * stt - st * st
    slope = (n * std - st * sd) / jnp.where(denom > 0, denom, 1.0)  # dB/sample
    slope = jnp.minimum(slope, -1e-12)  # decay curves are non-increasing
    rt60 = -60.0 / slope
    # no decay window at all (all-zero / truncated RIRs that never reach
    # -5 dB): the fit is vacuous — return NaN instead of an absurd ~1e13 s
    # that would silently dominate any averaged statistic
    valid = jnp.sum(w, axis=-1) >= 2.0
    return jnp.where(valid, rt60 / sampling_rate, jnp.nan)


@jax.jit
def source_is_visible(
    occupancy: jax.Array,  # [Gz, Gx] walkable grid (1 = free)
    listener_xz: jax.Array,  # [2] grid-cell coordinates (x, z), float
    source_xz: jax.Array,  # [2] grid-cell coordinates (x, z), float
) -> jax.Array:
    """Line-of-sight over the occupancy grid: True iff every sample along
    the segment listener->source lies in walkable cells (the geometric
    content of audio_sensor.sourceIsVisible(); the native tracer's
    direct_path_clear uses the same quarter-cell stepping).

    Coordinates are in occupancy-cell units (world / grid resolution).
    jit/vmap-able; a fixed 4-samples-per-cell marching resolution keeps the
    shape static.
    """
    d = source_xz - listener_xz
    dist = jnp.sqrt(jnp.sum(d * d))
    max_steps = 4 * (occupancy.shape[0] + occupancy.shape[1])
    steps = jnp.clip(jnp.int32(dist * 4.0), 1, max_steps)
    ts = jnp.arange(1, max_steps) / steps.astype(jnp.float32)
    valid = ts < 1.0
    pts = listener_xz[None, :] + ts[:, None] * d[None, :]
    xi = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0,
                  occupancy.shape[1] - 1)
    zi = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0,
                  occupancy.shape[0] - 1)
    free = occupancy[zi, xi] > 0.5
    return jnp.all(free | ~valid)


def world_to_cells(
    points_xz: np.ndarray, origin_xz: np.ndarray, resolution: float
) -> np.ndarray:
    """World (x, z) -> occupancy-cell coordinates for source_is_visible."""
    return (np.asarray(points_xz, np.float32) - np.asarray(origin_xz)) / (
        resolution
    )


def scene_world_to_cells(scene, points_xz: np.ndarray) -> np.ndarray:
    """World (x, z) -> cell coordinates of a DeviceScene's occupancy grid,
    anchored through node_grid_xz (the per-node cell coords the grid was
    built with) so the conversion matches env/structs._occupancy_grid
    exactly — including its half-cell interior offset."""
    pts = np.asarray(scene.points)
    node_xz = np.asarray(scene.node_grid_xz, np.float32)
    res = float(scene.egomap_resolution)
    q = np.atleast_2d(np.asarray(points_xz, np.float32))
    d2 = (pts[None, :, 0] - q[:, :1]) ** 2 + (pts[None, :, 2] - q[:, 1:2]) ** 2
    n = np.argmin(d2, axis=1)
    anchor = node_xz[n]  # [B, 2] cell coords of the nearest node
    off = (q - np.stack([pts[n, 0], pts[n, 2]], axis=1)) / res
    return anchor + off
