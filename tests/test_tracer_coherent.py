"""Temporal-coherence ray reuse in the native 3-D tracer — the analog of
the reference engine's temporalCoherence config (SoundSpaces2.md config
table: ~10x ray reduction for continuous motion; the reference's
continuous simulator enables it at continuous_simulator.py:115-126).

Checks: (1) a cold-start coherent call traces the full ray budget and its
band-energy envelope matches the plain tracer's; (2) under small-step
motion the cached-field blend stays within tolerance of a full retrace at
the same pose; (3) a teleport beyond max_delta forces a clean full
retrace; (4) the refresh path traces ~refresh_rays/num_rays of the rays
and is measurably faster (the speedup is printed for the record)."""

import time

import numpy as np
import pytest

from soundspaces_tpu.tools.rir_synth import (
    CoherentPoseTracer3D,
    PoseTracer3D,
    native_tracer_available,
)
from tests.test_tracer_acoustics import open_room

pytestmark = pytest.mark.skipif(
    not native_tracer_available(), reason="native tracer build unavailable"
)

SR = 16000
LEN = 1600


def envelope(ir: np.ndarray, win: int = 400) -> np.ndarray:
    """Smoothed energy envelope (25 ms bins, both ears summed) — coarse
    enough that the per-env noise-carrier realization (intentionally
    different between the two modes) averages out."""
    e = (np.asarray(ir, np.float64) ** 2).sum(axis=0)
    n = (len(e) // win) * win
    return e[:n].reshape(-1, win).sum(axis=1)


def env_close(a, b, rtol):
    ea, eb = envelope(a), envelope(b)
    scale = max(ea.max(), eb.max())
    return np.abs(ea - eb).max() <= rtol * scale


def make_tracers(num_rays=600, refresh=60, max_delta=0.6, seed=11):
    g = open_room(17)
    kw = dict(sampling_rate=SR, rir_max_len=LEN, num_rays=num_rays,
              max_bounces=30, num_threads=1, seed=seed,
              floor_default=0.0, ceil_default=3.0)
    return (
        PoseTracer3D(g, **kw),
        CoherentPoseTracer3D(g, refresh_rays=refresh, max_delta=max_delta,
                             **kw),
    )


RECV0 = np.array([[2.0, 1.5, 2.0, 0.0]], np.float32)
SRC = np.array([[6.0, 1.5, 6.0]], np.float32)


def test_cold_start_matches_full_trace():
    full, coh = make_tracers()
    a = full(RECV0.copy(), SRC.copy())[0]
    b = coh(RECV0.copy(), SRC.copy())[0]
    # same ray set, same deposits: only the diffuse noise carrier differs
    # (coherent mode keeps it fixed per env for frame-to-frame stability),
    # so compare the smoothed energy envelopes
    assert env_close(a, b, rtol=0.15)


def test_small_motion_tracks_full_retrace():
    full, coh = make_tracers()
    recv = RECV0.copy()
    coh(recv.copy(), SRC.copy())  # warm the cache
    for _ in range(8):
        recv[0, 0] += 0.1  # 0.1 m steps toward the source
        b = coh(recv.copy(), SRC.copy())[0]
    a = full(recv.copy(), SRC.copy())[0]
    # the lagging diffuse field is bounded by max_delta; direct path is
    # exact, so the envelope must stay close to a from-scratch trace
    assert env_close(a, b, rtol=0.35)
    # and the direct arrival must be at the NEW pose's exact 3-D delay
    d = np.linalg.norm(recv[0, :3] - SRC[0])
    n0 = int(round(d / 343.0 * SR))
    peak = int(np.abs(b).sum(axis=0).argmax())
    assert abs(peak - n0) <= 2


def test_teleport_forces_full_retrace():
    full, coh = make_tracers()
    coh(RECV0.copy(), SRC.copy())
    far = np.array([[7.0, 1.5, 2.5, 0.0]], np.float32)  # >> max_delta
    b = coh(far.copy(), SRC.copy())[0]
    a = full(far.copy(), SRC.copy())[0]
    assert env_close(a, b, rtol=0.15)
    assert float(coh._state_pose[0, 6]) == 1.0


def test_reset_invalidates_cache():
    _, coh = make_tracers()
    coh(RECV0.copy(), SRC.copy())
    assert float(coh._state_pose[0, 6]) == 1.0
    coh.reset()
    assert float(coh._state_pose[0, 6]) == 0.0


def test_continuous_env_tracer3d_coherent_mode():
    """rir_source='tracer3d_coherent' end-to-end: the continuous env's
    per-step fresh-RIR host callback served by the coherent tracer (small
    step deltas reuse the cached field; auto-reset teleports exceed
    max_delta and force a clean retrace)."""
    import jax
    import jax.numpy as jnp

    from soundspaces_tpu.env import DeviceScene, make_episode_bank
    from soundspaces_tpu.env.continuous import (
        ContinuousAudioNavEnv,
        ContinuousConfig,
    )
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.tools.rir_synth import HorizontalPoseAdapter

    sr = 4000
    assets = make_synthetic_assets(
        num_nodes_hint=24, sampling_rate=sr, rir_max_len=1000, image_size=8,
        num_sounds=1, max_secs=2, seed=41,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 8, seed=42, min_geodesic_hops=3)
    adapter = HorizontalPoseAdapter(
        CoherentPoseTracer3D(
            assets.graph, sr, 1000, num_rays=80, refresh_rays=8,
            max_delta=0.6, num_threads=2, room_height=3.0,
        ),
        receiver_height=1.5, source_height=1.5,
    )
    env = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal", "spectrogram"),
                         rir_source="tracer3d_coherent", use_crossfade=True),
        scene, episodes, num_envs=2, tracer=adapter,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    ag = np.asarray(obs["audiogoal"])
    assert ag.shape == (2, 2, sr) and np.isfinite(ag).all()
    assert (np.abs(ag).max(axis=(1, 2)) > 0).all()
    for _ in range(3):
        state, obs, _, _, _ = env.step(state, jnp.ones((2,), jnp.int32))
        assert np.isfinite(np.asarray(obs["audiogoal"])).all()
    # the cache warmed for both envs
    inner = adapter.tracer
    assert inner._state_pose is not None
    assert (inner._state_pose[:, 6] == 1.0).all()


def test_distractor_uses_separate_cache_slot():
    """Goal and distractor renders of the same step must not share the
    per-env cache (alternating sources would either defeat the reuse or
    blend two sources' fields); the env routes the distractor through
    slot 1 and passes its auto-reset mask as `fresh`."""
    import jax
    import jax.numpy as jnp

    from soundspaces_tpu.env import DeviceScene, make_episode_bank
    from soundspaces_tpu.env.continuous import (
        ContinuousAudioNavEnv,
        ContinuousConfig,
    )
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.tools.rir_synth import HorizontalPoseAdapter

    sr = 4000
    assets = make_synthetic_assets(
        num_nodes_hint=24, sampling_rate=sr, rir_max_len=1000, image_size=8,
        num_sounds=2, max_secs=2, seed=41,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(
        assets, 8, seed=42, min_geodesic_hops=3, with_distractors=True,
    )
    inner = CoherentPoseTracer3D(
        assets.graph, sr, 1000, num_rays=60, refresh_rays=6,
        num_threads=2, room_height=3.0,
    )
    env = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal",),
                         rir_source="tracer3d_coherent",
                         has_distractor_sound=True, use_crossfade=True),
        scene, episodes, num_envs=2,
        tracer=HorizontalPoseAdapter(inner, 1.5, 1.5),
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    for _ in range(2):
        state, obs, _, _, _ = env.step(state, jnp.ones((2,), jnp.int32))
    assert np.isfinite(np.asarray(obs["audiogoal"])).all()
    assert sorted(inner._state.keys()) == [0, 1]
    # both slots warmed, and their cached sources differ (goal vs distractor)
    p0, p1 = inner._state[0][1], inner._state[1][1]
    assert (p0[:, 6] == 1.0).all() and (p1[:, 6] == 1.0).all()
    assert not np.allclose(p0[:, 3:6], p1[:, 3:6])


def test_refresh_path_is_faster():
    full, coh = make_tracers(num_rays=2000, refresh=200)
    recv = RECV0.copy()
    coh(recv.copy(), SRC.copy())  # cold start outside the timing
    n = 6
    t0 = time.perf_counter()
    for _ in range(n):
        recv[0, 0] += 0.05
        coh(recv.copy(), SRC.copy())
    t_coh = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        full(recv.copy(), SRC.copy())
    t_full = time.perf_counter() - t0
    print(f"coherent speedup at 2000 rays / 200 refresh: "
          f"{t_full / t_coh:.1f}x ({t_full / n * 1e3:.1f} ms -> "
          f"{t_coh / n * 1e3:.1f} ms/call)")
    # 10% of the rays: expect ~10x less trace work; allow generous slack
    # for the fixed per-call synthesis cost
    assert t_coh * 2.5 < t_full
