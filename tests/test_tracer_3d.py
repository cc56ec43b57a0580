"""3-D propagation in the native tracer: source/receiver heights,
floor/ceiling reflections with their own material rows, and
elevation-dependent spherical-harmonic encoding — the vertical dimension of
the reference engine (SoundSpaces2.md:3-5 — a 3-D bidirectional tracer;
source heights matter throughout the reference: the +1.5 m goal offset at
simulator.py:390 and the dataset height offsets at utils.py:15-39).

Anchors are closed-form where possible: the direct-arrival delay must move
with source height exactly as the 3-D Euclidean distance does, and the
reverberation-time sweep in a closed box must track the 3-D Eyring model
T60 = 0.163 V / (-S ln(1 - a)) — external physics, alongside the 2-D sweep
of test_tracer_acoustics.py."""

import numpy as np
import pytest

from soundspaces_tpu.scene import SceneGraph
from soundspaces_tpu.tools.rir_synth import (
    PoseTracer3D,
    heightfields_from_graph,
    native_tracer_available,
    synth_ambisonic_bank_native_3d,
    synth_rir_bank_native_3d,
)
from tests.test_tracer_acoustics import graph_from_mask, open_room, rir_energy

pytestmark = pytest.mark.skipif(
    not native_tracer_available(), reason="native tracer build unavailable"
)

GS = 0.5
C = 343.0


def first_arrival(ir: np.ndarray, thresh_frac: float = 0.25) -> int:
    """Sample index of the first deposit within thresh_frac of the peak."""
    mag = np.abs(np.asarray(ir, np.float64))
    if mag.ndim > 1:
        mag = mag.sum(axis=tuple(range(mag.ndim - 1)))
    return int(np.flatnonzero(mag >= thresh_frac * mag.max())[0])


# ------------------------------------------------------------ source height

def test_direct_arrival_shifts_with_source_height():
    """Raising the source raises the 3-D path length: the direct-arrival
    delay must track sqrt(d^2 + dy^2)/c, not the horizontal d/c the 2.5-D
    engine was hardwired to (the reference's +1.5 m offset is audible as
    exactly this delay/level change, simulator.py:390)."""
    g = open_room(17)
    sr = 16000
    d = 4.0
    tr = PoseTracer3D(g, sampling_rate=sr, rir_max_len=1600, num_rays=0,
                      max_bounces=0, num_threads=1, seed=3,
                      floor_default=0.0, ceil_default=30.0)
    recv = np.array([[1.0, 1.5, 4.0, 0.0]], np.float32)
    arrivals, peaks = [], []
    for dy in (0.0, 1.5, 3.0):
        ir = tr(np.array(recv), np.array([[1.0 + d, 1.5 + dy, 4.0]],
                                         np.float32))[0]
        n0 = first_arrival(ir)
        want = int(round(np.hypot(d, dy) / C * sr))
        assert abs(n0 - want) <= 2, (dy, n0, want)
        arrivals.append(n0)
        peaks.append(float(np.abs(ir).max()))
    assert arrivals[0] < arrivals[1] < arrivals[2]
    # 1/r level: higher source = longer path = quieter direct peak
    assert peaks[0] > peaks[1] > peaks[2]


def test_receiver_above_ceiling_is_occluded():
    """A source lifted above the ceiling surface loses its direct path
    (the 3-D visibility check spans the vertical axis)."""
    g = open_room(13)
    sr = 8000
    tr = PoseTracer3D(g, sampling_rate=sr, rir_max_len=1200, num_rays=0,
                      max_bounces=0, num_threads=1, seed=3,
                      floor_default=0.0, ceil_default=3.0)
    recv = np.array([[1.0, 1.5, 3.0, 0.0]], np.float32)
    below = tr(np.array(recv), np.array([[4.0, 2.5, 3.0]], np.float32))[0]
    above = tr(np.array(recv), np.array([[4.0, 4.5, 3.0]], np.float32))[0]
    assert np.abs(below).max() > 0.0
    assert np.abs(above).max() == 0.0


# ------------------------------------------------------------ floor/ceiling

def test_floor_ceiling_materials_shape_the_tail():
    """Floor and ceiling get their OWN material rows: an absorptive ceiling
    (acoustic tile) kills the late field relative to a concrete one, with
    wall materials held fixed."""
    g = open_room(13)
    sr = 8000
    recv = np.array([[1.0, 1.5, 1.0, 0.0]], np.float32)
    src = np.array([[5.0, 1.5, 5.0]], np.float32)

    def tail(ceil_material):
        tr = PoseTracer3D(
            g, sampling_rate=sr, rir_max_len=4000, num_rays=400,
            max_bounces=80, num_threads=2, seed=5, air_absorption=0.0,
            materials=["concrete", "acoustic_tile"],
            floor_default=0.0, ceil_default=3.0,
            floor_material=0, ceil_material=ceil_material,
        )
        return rir_energy(tr(np.array(recv), np.array(src))[0][:, 1200:])

    assert tail(0) > 5.0 * tail(1)


def test_first_floor_reflection_is_causal():
    """Vertical image-source causality, isolated by the same difference
    trick as the 2-D test: the tracer is deterministic in (pose, seed), so
    the RIR with the floor at 0 minus the RIR with the floor dropped far
    below differs EXACTLY by the floor interactions — rays evolve bitwise
    identically until one of them crosses y = 0. That difference must be
    silent before the floor-bounce image-source path and ring after it."""
    g = open_room(41)
    sr = 16000
    rx = rz = 10.0
    d = 3.0
    common = dict(sampling_rate=sr, rir_max_len=2000, num_rays=2000,
                  max_bounces=4, num_threads=4, seed=7, air_absorption=0.0,
                  ceil_default=60.0)
    recv = np.array([[rx, 1.5, rz, 0.0]], np.float32)
    src = np.array([[rx + d, 1.5, rz]], np.float32)
    ir_floor = PoseTracer3D(g, floor_default=0.0, **common)(
        np.array(recv), np.array(src))[0]
    ir_deep = PoseTracer3D(g, floor_default=-60.0, **common)(
        np.array(recv), np.array(src))[0]
    diff = ir_floor - ir_deep

    d_image = np.hypot(d, 2 * 1.5)  # reflect the source through the floor
    margin = 0.6 * GS + 0.25 * GS   # receiver radius + DDA step quantization
    n_img = int((d_image - margin) / C * sr)
    assert n_img > int((d + margin) / C * sr) + 4
    assert np.abs(diff[:, :n_img]).max() == 0.0  # causal: no floor energy yet
    assert np.abs(diff[:, n_img:]).max() > 0.0   # the floor bounce rings


def test_heightfields_from_graph_follow_node_elevation():
    """Graph node elevations become the per-cell floor heightfield (the
    mesh_metadata rasterization contract) and shift the local ceiling."""
    n = 5
    pts = np.array([(i * GS, 0.6 if i > 2 else 0.0, j * GS)
                    for i in range(n) for j in range(n)], np.float32)
    edges = [(i * n + j, (i + 1) * n + j) for i in range(n - 1)
             for j in range(n)]
    edges += [(i * n + j, i * n + j + 1) for i in range(n)
              for j in range(n - 1)]
    g = SceneGraph.from_edges(pts, np.array(edges, np.int64), GS)
    floor, ceil = heightfields_from_graph(g, room_height=3.0)
    assert floor.shape == (5, 5)
    assert floor[0, 0] == 0.0 and floor[0, 4] == np.float32(0.6)
    np.testing.assert_allclose(ceil - floor, 3.0)


# ----------------------------------------------------------------- 3-D Eyring

def test_eyring_rt60_3d_sweep():
    """Reverberation time vs absorption in a closed box against the 3-D
    Eyring model T60 = 0.163 V / (-S ln(1-a)) (the companion of the 2-D
    sweep in test_tracer_acoustics.py — same Schroeder fit)."""
    from tests.test_tracer_acoustics import schroeder_rt60

    n = 17
    g = open_room(n)
    sr = 8000
    L = n * GS       # 8.5 m square footprint
    H = 3.0
    V = L * L * H
    S = 2 * L * L + 4 * L * H
    recv = np.array([[2.0, 1.5, 2.0, 0.0]], np.float32)
    src = np.array([[5.5, 1.5, 5.0]], np.float32)
    got, want = [], []
    for a in (0.5, 0.8):
        tr = PoseTracer3D(g, sampling_rate=sr, rir_max_len=6000,
                          num_rays=1500, max_bounces=160, num_threads=4,
                          seed=21, air_absorption=0.0, scattering=1.0,
                          absorption=(a, a, a, a),
                          materials=[{"absorption": [a] * 4,
                                      "scattering": 1.0}],
                          floor_default=0.0, ceil_default=H)
        ir = tr(np.array(recv), np.array(src))[0]
        got.append(schroeder_rt60(ir, sr))
        want.append(0.163 * V / (S * -np.log(1.0 - a)))
    assert got[0] > got[1]  # less absorption rings longer
    for g_t, w_t in zip(got, want):
        assert 0.5 * w_t < g_t < 2.0 * w_t, (g_t, w_t)


# ------------------------------------------------------------ elevation SH

def test_ambisonic_elevation_encoding():
    """A source straight above the receiver encodes into the Z harmonic
    (ACN 2) with X/Y silent; a horizontal source leaves Z silent — the
    elevation-dependent SH encode the 2.5-D engine hardwired to zero."""
    g = open_room(13)
    sr = 8000
    goals = np.array([84], np.int32)  # node (6, 6) of the 13x13 grid
    # receiver node directly under the source node: same cell, source
    # lifted by the reference offset; pick the co-located node
    bank = synth_ambisonic_bank_native_3d(
        g, goals, sr, 1200, order=2, num_rays=0, num_threads=2, seed=9,
        receiver_height=0.0, source_height=1.5, room_height=30.0,
        floor_default=0.0, ceil_default=30.0,
    )
    assert bank.shape == (g.num_nodes, 1, 9, 1200)
    ir_up = bank[84, 0]  # receiver at the source's own node, 1.5 m below
    n0 = int(round(1.5 / C * sr))
    w, y, z, x = ir_up[0, n0], ir_up[1, n0], ir_up[2, n0], ir_up[3, n0]
    assert w > 0 and abs(z - w) < 0.05 * w       # Z == W * sin(90 deg)
    assert abs(x) < 0.1 * w and abs(y) < 0.1 * w
    # order-2 R = (3 sin^2(el) - 1)/2 = +1 at el=90 (vs -1/2 horizontal)
    assert abs(ir_up[6, n0] - w) < 0.1 * w

    # a same-height source 4 cells away: Z stays silent at its arrival
    src_pt = g.points[84]
    recv_id = int(np.flatnonzero(
        (np.abs(g.points[:, 0] - (src_pt[0] - 4 * GS)) < 1e-4)
        & (np.abs(g.points[:, 2] - src_pt[2]) < 1e-4)
    )[0])
    bank_h = synth_ambisonic_bank_native_3d(
        g, goals, sr, 1200, order=2, num_rays=0, num_threads=2, seed=9,
        receiver_height=1.5, source_height=1.5, room_height=30.0,
        floor_default=0.0, ceil_default=30.0,
    )
    ir_h = bank_h[recv_id, 0]
    nh = int(round(4 * GS / C * sr))
    wh, xh = ir_h[0, nh], ir_h[3, nh]
    assert wh > 0 and abs(xh - wh) < 0.05 * wh   # X == W at az 0, el 0
    assert abs(ir_h[2, nh]) < 0.1 * wh           # Z silent

    # the stochastic field also carries elevation: floor/ceiling bounces
    # light up the Z harmonic the 2.5-D engine hardwired to zero
    bank_rays = synth_ambisonic_bank_native_3d(
        g, goals, sr, 1200, order=2, num_rays=200, num_threads=2, seed=9,
        receiver_height=1.5, source_height=1.5, room_height=3.0,
    )
    assert np.abs(bank_rays[recv_id, 0, 2]).sum() > 0.0


def test_binaural_bank_3d_layout_and_height_offsets():
    """The 3-D bank keeps the [4, N, G, 2, L] contract and its direct
    arrival sits at the 3-D distance implied by the reference's +1.5 m
    source offset over the receiver-ear height."""
    g = open_room(9)
    sr = 8000
    goals = np.array([40], np.int32)  # node (4, 4)
    bank = synth_rir_bank_native_3d(
        g, goals, sr, 1200, num_rays=0, num_threads=2, seed=1,
        receiver_height=1.5, source_height=1.5, room_height=3.0,
    )
    assert bank.shape == (4, g.num_nodes, 1, 2, 1200)
    src_pt = g.points[40]
    recv_id = int(np.flatnonzero(
        (np.abs(g.points[:, 0] - (src_pt[0] - 4 * GS)) < 1e-4)
        & (np.abs(g.points[:, 2] - src_pt[2]) < 1e-4)
    )[0])
    # same ear/source heights -> purely horizontal direct path
    n0 = first_arrival(bank[0, recv_id, 0])
    assert abs(n0 - int(round(4 * GS / C * sr))) <= 2

    bank_hi = synth_rir_bank_native_3d(
        g, goals, sr, 1200, num_rays=0, num_threads=2, seed=1,
        receiver_height=0.0, source_height=1.5, room_height=3.0,
    )
    n_hi = first_arrival(bank_hi[0, recv_id, 0])
    want = int(round(np.hypot(4 * GS, 1.5) / C * sr))
    assert abs(n_hi - want) <= 2
    assert n_hi > n0


# ----------------------------------------------------- continuous rir_source

def test_continuous_tracer3d_mode():
    """rir_source='tracer3d': the SS2.0 per-step fresh-RIR path served by
    the 3-D engine through the HorizontalPoseAdapter — planar poses are
    lifted by the floor heightfield + the reference's 1.5 m ear/source
    offsets (continuous_simulator.py:341), so the direct arrival moves to
    the 3-D distance when the ear and source heights differ."""
    import jax
    import jax.numpy as jnp

    from soundspaces_tpu.env import DeviceScene, make_episode_bank
    from soundspaces_tpu.env.continuous import (
        ContinuousAudioNavEnv,
        ContinuousConfig,
    )
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.tools.rir_synth import (
        HorizontalPoseAdapter,
        PoseTracer,
        PoseTracer3D,
    )

    sr = 4000
    assets = make_synthetic_assets(
        num_nodes_hint=24, sampling_rate=sr, rir_max_len=1000, image_size=8,
        num_sounds=1, max_secs=2, seed=41,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 8, seed=42, min_geodesic_hops=3)
    adapter = HorizontalPoseAdapter(
        PoseTracer3D(assets.graph, sr, 1000, num_rays=60, num_threads=2,
                     room_height=3.0),
        receiver_height=1.5, source_height=1.5,
    )
    env = ContinuousAudioNavEnv(
        ContinuousConfig(sensors=("audiogoal", "spectrogram"),
                         rir_source="tracer3d", use_crossfade=True),
        scene, episodes, num_envs=2, tracer=adapter,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    ag = np.asarray(obs["audiogoal"])
    assert ag.shape == (2, 2, sr) and np.isfinite(ag).all()
    assert (np.abs(ag).max(axis=(1, 2)) > 0).all()
    state1, obs1, _, _, _ = env.step(state, jnp.ones((2,), jnp.int32))
    assert np.isfinite(np.asarray(obs1["audiogoal"])).all()

    # elevation geometry: with the ear at the floor and the source 1.5 m up,
    # the 3-D adapter's direct arrival lands at sqrt(d^2 + 1.5^2)/c while the
    # 2-D tracer (horizontal-plane engine) keeps it at d/c
    g = np.asarray(scene.points)
    goal = int(np.asarray(state.goal_node)[0])
    d_all = np.hypot(g[:, 0] - g[goal, 0], g[:, 2] - g[goal, 2])
    probe = int(np.argmax(d_all))
    d = float(d_all[probe])
    recv = np.array([[g[probe, 0], g[probe, 2], 0.0]], np.float32)
    src = np.array([[g[goal, 0], g[goal, 2]]], np.float32)
    low_ear = HorizontalPoseAdapter(
        PoseTracer3D(assets.graph, sr, 1000, num_rays=0, num_threads=1,
                     room_height=30.0),
        receiver_height=0.0, source_height=1.5,
    )
    ir3 = low_ear(recv, src)[0]
    n3 = first_arrival(ir3)
    want = int(round(np.hypot(d, 1.5) / C * sr))
    assert abs(n3 - want) <= 2, (n3, want)
    flat = PoseTracer(assets.graph, sr, 1000, num_rays=0, num_threads=1)
    n2 = first_arrival(flat(recv, src)[0])
    assert n3 > n2


def test_make_realistic_three_d_world_trains(tmp_path):
    """`make_realistic --three-d` traces the bank with the 3-D engine and
    the trained-on world loads end-to-end through the reference-format
    ingestion path (the same contract as the 2-D builder)."""
    import jax

    from soundspaces_tpu import trainers  # noqa: F401
    from soundspaces_tpu.builder import build_trainer
    from soundspaces_tpu.config import get_config
    from soundspaces_tpu.tools.make_realistic import build_world

    out = str(tmp_path / "w3d")
    summary = build_world(
        out, scene="tiny3", width=10, depth=10, num_goals=2,
        sampling_rate=4000, rir_max_len=600, num_rays=40,
        train_episodes=12, val_episodes=4, test_episodes=4,
        image_size=16, seed=0, three_d=True,
    )
    assert summary["rir_files"] == 4 * summary["num_nodes"] * 2
    cfg = get_config(
        "configs/realistic_audiogoal.yaml",
        [f"data.metadata_dir={out}/metadata/tiny3",
         f"data.binaural_rir_dir={out}/binaural_rirs/tiny3",
         f"data.source_sound_dir={out}/sounds/1s_all",
         f"data.scene_observation_file={out}/scene_observations/tiny3.pkl",
         f"data.episode_split_path={out}/datasets/audionav/tiny3/train/train.json.gz",
         f"data.eval_episode_split_path={out}/datasets/audionav/tiny3/val/val.json.gz",
         "data.sampling_rate=4000", "data.rir_max_len=600",
         "data.image_size=16",
         "trainer.num_envs=2", "trainer.num_updates=1",
         "trainer.log_interval=1", "ppo.num_steps=4"],
    )
    tr = build_trainer(cfg)
    logs = []
    tr.train(jax.random.PRNGKey(0), log_fn=lambda u, m: logs.append(m))
    assert logs and np.isfinite(logs[-1]["value_loss"])
