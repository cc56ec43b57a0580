"""Acoustic analysis tools (the SS2.0 tutorial-notebook surface):
Schroeder RT60, occupancy line-of-sight, native ray efficiency."""

import numpy as np
import pytest

import jax.numpy as jnp

from soundspaces_tpu.tools.acoustics import (
    measure_rt60,
    source_is_visible,
    world_to_cells,
)


def test_rt60_of_exponential_decay(rng):
    """A synthetic exponential-decay IR with known T60 is recovered."""
    sr = 16000
    for t60_true in (0.3, 0.6):
        t = np.arange(sr) / sr
        env = 10.0 ** (-3.0 * t / t60_true)  # -60 dB at t60_true
        ir = (env * rng.standard_normal(sr)).astype(np.float32)
        rt = float(measure_rt60(jnp.asarray(ir), sr))
        assert abs(rt - t60_true) / t60_true < 0.15, (t60_true, rt)


def test_rt60_batched_shapes(rng):
    irs = rng.standard_normal((3, 2, 4000)).astype(np.float32) * np.exp(
        -np.arange(4000) / 800
    )
    rt = measure_rt60(jnp.asarray(irs), 16000)
    assert rt.shape == (3, 2)
    assert np.isfinite(np.asarray(rt)).all()


def test_source_visibility_wall():
    """Free corridor -> visible; a wall between -> occluded."""
    occ = np.ones((20, 20), np.float32)
    a, b = jnp.asarray([2.0, 10.0]), jnp.asarray([17.0, 10.0])
    assert bool(source_is_visible(jnp.asarray(occ), a, b))
    occ[:, 9:11] = 0.0  # full-height wall
    assert not bool(source_is_visible(jnp.asarray(occ), a, b))
    # points on the same side remain mutually visible
    c = jnp.asarray([5.0, 4.0])
    assert bool(source_is_visible(jnp.asarray(occ), a, c))


def test_world_to_cells_roundtrip():
    pts = np.array([[1.0, 2.0], [3.5, -0.5]])
    cells = world_to_cells(pts, np.array([-1.0, -1.0]), 0.5)
    np.testing.assert_allclose(cells, [[4.0, 6.0], [9.0, 1.0]])


def test_native_ray_stats():
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.tools.rir_synth import (
        PoseTracer,
        native_tracer_available,
    )

    if not native_tracer_available():
        pytest.skip("no native toolchain")
    sr = 4000
    assets = make_synthetic_assets(
        num_nodes_hint=24, sampling_rate=sr, rir_max_len=1000, image_size=8,
        num_sounds=1, max_secs=2, seed=41,
    )
    g = assets.graph
    tracer = PoseTracer(g, sr, 1000, num_rays=200, num_threads=2)
    # receiver near the source: efficiency high, direct path clear
    p0 = g.points[0]
    near = np.array([[p0[0] + 0.1, p0[2]]], np.float32)
    src = np.array([[p0[0], p0[2]]], np.float32)
    stats = tracer.ray_stats(near, src)
    assert stats.shape == (1, 2)
    assert 0.0 <= stats[0, 0] <= 1.0
    assert stats[0, 0] > 0.2  # most rays find a receiver 0.1 m away
    assert stats[0, 1] == 1.0
