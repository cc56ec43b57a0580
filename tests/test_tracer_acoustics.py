"""Acoustic features of the native tracer: per-cell materials, transmission,
first-order edge diffraction, and the ambisonic channel layout — the feature
set of the reference engine's acoustics config
(soundspaces/continuous_simulator.py:115-126 sets transmission=True;
SoundSpaces2.md documents the config + ChannelLayoutType tables;
scripts/mp3d_acoustic_properties.py:12-414 supplies per-category materials).

Plus CLOSED-FORM anchors: causality of early reflections against the exact
image-source geometry, an Eyring reverberation-time sweep, and
direct-to-reverberant ratio vs distance — external physics, not
self-consistency (the reference validates its engine against published
benchmarks, SoundSpaces2.md)."""

import numpy as np
import pytest

from soundspaces_tpu.scene import SceneGraph
from soundspaces_tpu.tools.rir_synth import (
    PoseTracer,
    native_tracer_available,
    synth_ambisonic_bank_native,
    synth_rir_bank_native,
)

pytestmark = pytest.mark.skipif(
    not native_tracer_available(), reason="native tracer build unavailable"
)

GS = 0.5
C = 343.0


def graph_from_mask(mask: np.ndarray, grid_size: float = GS) -> SceneGraph:
    """SceneGraph whose walkable nodes are the True cells of mask [W, D]
    (x-index, z-index), mirroring SceneGraph.grid's layout."""
    w, d = mask.shape
    ids = -np.ones((w, d), np.int64)
    pts, edges = [], []
    for i in range(w):
        for j in range(d):
            if mask[i, j]:
                ids[i, j] = len(pts)
                pts.append((i * grid_size, 0.0, j * grid_size))
    for i in range(w):
        for j in range(d):
            if ids[i, j] < 0:
                continue
            if i + 1 < w and ids[i + 1, j] >= 0:
                edges.append((ids[i, j], ids[i + 1, j]))
            if j + 1 < d and ids[i, j + 1] >= 0:
                edges.append((ids[i, j], ids[i, j + 1]))
    return SceneGraph.from_edges(
        np.array(pts, np.float32), np.array(edges, np.int64), grid_size
    )


def two_rooms():
    """Two 5x11 rooms fully separated by a 1-cell wall column."""
    mask = np.ones((11, 11), bool)
    mask[5, :] = False
    return graph_from_mask(mask)


def l_world():
    """L-shaped corridor: source and receiver see each other only around a
    convex corner."""
    mask = np.zeros((13, 13), bool)
    mask[:, 0:3] = True    # vertical leg x=0..12, z=0..2
    mask[10:13, :] = True  # horizontal leg z=0..12 at x=10..12
    return graph_from_mask(mask)


def open_room(n=13):
    return graph_from_mask(np.ones((n, n), bool))


def rir_energy(x):
    return float((np.asarray(x, np.float64) ** 2).sum())


# ------------------------------------------------------------- transmission

def test_transmission_through_sealed_wall():
    """With transmission off, a receiver in a sealed neighboring room gets
    (near) zero energy; enabling it leaks energy through the wall, and more
    transmissive materials leak more
    (continuous_simulator.py:125 acousticsConfig.transmission = True)."""
    g = two_rooms()
    recv = np.array([[1.0, 2.5, 0.0]], np.float32)  # room A
    src = np.array([[4.5, 2.5]], np.float32)        # room B (x > wall at 2.5)
    # receiver x=1.0 and source x=4.5 are on opposite sides of the x=2.5 wall
    # few bounces: with many bounces almost every ray eventually leaks
    # regardless of t, washing out the coefficient's effect
    common = dict(sampling_rate=8000, rir_max_len=2000, num_rays=400,
                  max_bounces=4, num_threads=2, seed=11)

    def energy(t_coef):
        mats = [{"absorption": [0.1] * 4, "scattering": 0.3,
                 "transmission": t_coef}]
        tr = PoseTracer(g, materials=mats, transmission=t_coef > 0, **common)
        return rir_energy(tr(recv, src)[0])

    e_off = energy(0.0)
    e_low = energy(0.05)
    e_high = energy(0.3)
    assert e_off == 0.0  # sealed: no direct, no rays, no diffraction
    assert e_low > 0.0
    # higher t leaks more; the outer walls also transmit (rays escape the
    # domain and die), which damps the ratio below the single-hit t ratio
    assert e_high > 1.8 * e_low


def test_transmission_arrival_is_causal():
    """Through-wall energy cannot arrive before the straight-line flight
    time (the wall march adds path, never removes it)."""
    g = two_rooms()
    recv = np.array([[1.0, 2.5, 0.0]], np.float32)
    src = np.array([[4.5, 2.5]], np.float32)
    mats = [{"absorption": [0.1] * 4, "scattering": 0.3, "transmission": 0.3}]
    tr = PoseTracer(g, sampling_rate=8000, rir_max_len=2000, num_rays=400,
                    num_threads=2, seed=11, materials=mats, transmission=True)
    ir = tr(recv, src)[0]
    dist = 3.5  # |4.5 - 1.0|
    # deposits can lead by the receiver radius (0.6 * grid)
    n_min = int((dist - 0.6 * GS) / C * 8000)
    nz = np.flatnonzero(np.abs(ir).sum(axis=0) > 0)
    assert nz.size and nz[0] >= n_min


# -------------------------------------------------------------- diffraction

def test_diffraction_adds_early_shadow_arrival():
    """Around a convex corner, diffraction contributes energy near the
    bent-path flight time that the pure specular field lacks."""
    g = l_world()
    sr = 8000
    recv = np.array([[0.5, 1.0, 0.0]], np.float32)   # in the vertical leg
    src = np.array([[6.0, 5.5]], np.float32)         # in the horizontal leg
    common = dict(sampling_rate=sr, rir_max_len=2400, num_rays=300,
                  num_threads=2, seed=7)

    def early_energy(diffraction):
        tr = PoseTracer(g, diffraction=diffraction, **common)
        ir = tr(recv, src)[0]
        # bent path via the corner region near (x~4.75, z~1.25): length <= 9 m
        n_hi = int(9.0 / C * sr)
        return rir_energy(ir[:, :n_hi])

    e_on = early_energy(True)
    e_off = early_energy(False)
    assert e_on > 2.0 * max(e_off, 1e-12)


def test_diffraction_decays_with_shadow_depth():
    """Deeper into the geometric shadow, the diffracted arrival weakens
    (exponential-in-deflection shadow-zone attenuation)."""
    g = l_world()
    sr = 8000
    src = np.array([[6.0, 5.5]], np.float32)
    common = dict(sampling_rate=sr, rir_max_len=2400, num_rays=1,
                  max_bounces=0, num_threads=1, seed=7, diffraction=True)
    tr = PoseTracer(g, **common)  # num_rays=1: isolate the diffraction term
    shallow = np.array([[2.0, 1.0, 0.0]], np.float32)
    deep = np.array([[0.0, 0.5, 0.0]], np.float32)
    e_shallow = rir_energy(tr(shallow, src)[0])
    e_deep = rir_energy(tr(deep, src)[0])
    assert e_shallow > e_deep > 0.0


# ---------------------------------------------------------------- materials

def test_per_cell_materials_change_reverb():
    """A concrete room rings much longer than an acoustic-tile room — the
    per-category coefficients of tools.materials drive the tracer
    (mp3d_acoustic_properties.py material JSON role)."""
    g = open_room()
    recv = np.array([[1.0, 1.0, 0.0]], np.float32)
    src = np.array([[5.0, 5.0]], np.float32)
    common = dict(sampling_rate=8000, rir_max_len=4000, num_rays=300,
                  max_bounces=80, num_threads=2, seed=3, air_absorption=0.0)

    def tail_energy(material):
        tr = PoseTracer(g, materials=[material], **common)
        ir = tr(recv, src)[0]
        return rir_energy(ir[:, 1200:])  # > 150 ms

    assert tail_energy("concrete") > 10.0 * tail_energy("acoustic_tile")


def test_material_grid_is_spatial():
    """An absorptive wall panel between source and receiver rooms dampens
    the field vs the same panel being reflective — per-CELL assignment, not
    a global mean."""
    mask = np.ones((11, 11), bool)
    mask[5, 3:8] = False  # partial wall with openings at both ends
    g = graph_from_mask(mask)
    occ = np.ones((11, 11), np.uint8)
    occ[3:8, 5] = 0  # occupancy is [z][x] = mask.T
    mat_grid = np.zeros((11, 11), np.uint8)
    mat_grid[3:8, 5] = 1  # the wall cells get material 1
    recv = np.array([[1.0, 2.5, 0.0]], np.float32)
    src = np.array([[4.5, 2.5]], np.float32)
    common = dict(sampling_rate=8000, rir_max_len=2000, num_rays=400,
                  num_threads=2, seed=5)

    def energy(wall_material):
        tr = PoseTracer(g, materials=["concrete", wall_material],
                        material_grid=mat_grid, **common)
        return rir_energy(tr(recv, src)[0])

    assert energy("concrete") > 1.5 * energy("acoustic_tile")


# ---------------------------------------------------------------- ambisonics

def test_ambisonic_bank_layout_and_direction():
    """FOA ACN/SN3D: a line-of-sight source due +x of the receiver encodes
    into X ~ W and Y ~ 0 at the direct arrival; orders 1 and 2 produce
    (order+1)^2 channels (SoundSpaces2.md ChannelLayoutType table)."""
    g = open_room()
    goals = np.array([84], np.int32)  # node grid is 13x13: id 84 = (6, 6)
    sr = 8000
    bank = synth_ambisonic_bank_native(g, goals, sr, 1500, order=1,
                                       num_rays=200, num_threads=2, seed=9)
    assert bank.shape == (g.num_nodes, 1, 4, 1500)
    src_pt = g.points[84]
    # receiver due -x of the source -> source seen at +x (cos az = 1)
    recv_id = int(np.flatnonzero(
        (np.abs(g.points[:, 0] - (src_pt[0] - 4 * GS)) < 1e-4)
        & (np.abs(g.points[:, 2] - src_pt[2]) < 1e-4)
    )[0])
    ir = bank[recv_id, 0]
    n0 = int(round(4 * GS / C * sr))
    w, y, z, x = ir[0, n0], ir[1, n0], ir[2, n0], ir[3, n0]
    assert w > 0 and abs(x - w) < 0.05 * w  # X == W * cos(0)
    assert abs(y) < 0.1 * w and z == 0.0

    bank2 = synth_ambisonic_bank_native(g, goals, sr, 800, order=2,
                                        num_rays=50, num_threads=2, seed=9)
    assert bank2.shape == (g.num_nodes, 1, 9, 800)
    # elevation-0 field: the vertical harmonics stay silent
    assert np.abs(bank2[:, :, (2, 5, 7)]).max() == 0.0


def test_ambisonic_decode_round_trip_matches_side():
    """Closing the reference's ambisonic -> binaural loop on our own traced
    bank (scripts/ambisonic_to_binaural.py): a source to the agent's left
    decodes louder in the left channel than one to the right."""
    from soundspaces_tpu.tools.ambisonic import decode_rir_bank

    g = open_room()
    goals = np.array([84], np.int32)
    bank = synth_ambisonic_bank_native(g, goals, 8000, 1200, order=1,
                                       num_rays=150, num_threads=2, seed=2)
    binaural = decode_rir_bank(bank)  # [4 headings, N, 1, 2, L]
    assert binaural.shape == (4, g.num_nodes, 1, 2, 1200)
    src_pt = g.points[84]
    left_of = int(np.flatnonzero(
        (np.abs(g.points[:, 0] - src_pt[0]) < 1e-4)
        & (np.abs(g.points[:, 2] - (src_pt[2] + 3 * GS)) < 1e-4)
    )[0])
    ir_h0 = binaural[0, left_of, 0]
    l_e, r_e = rir_energy(ir_h0[0]), rir_energy(ir_h0[1])
    ir_h180 = binaural[2, left_of, 0]
    l2, r2 = rir_energy(ir_h180[0]), rir_energy(ir_h180[1])
    # turning 180 degrees must flip which ear is favored
    assert (l_e - r_e) * (l2 - r2) < 0


# ------------------------------------------------------- closed-form anchors

def test_no_energy_before_first_image_source():
    """Causality against the exact image-source geometry. The tracer is
    deterministic in (pose, seed), so the RIR traced in a 13x13 room minus
    the RIR traced in a 41x41 room (identical low walls, far-away high
    walls) isolates exactly the reflections off the small room's high
    walls: rays evolve bitwise-identically until they reach a high wall.
    That difference must be silent before the shortest image-source path
    over a high wall and ring after it. Wall planes sit half a cell outside
    the outermost cell centers."""
    n = 13
    sr = 16000
    rx, rz = 3.0, 3.0
    sx, sz = 4.5, 3.0
    common = dict(sampling_rate=sr, rir_max_len=3000, num_rays=600,
                  num_threads=2, seed=13, air_absorption=0.0)
    recv = np.array([[rx, rz, 0.0]], np.float32)
    src = np.array([[sx, sz]], np.float32)
    ir_small = PoseTracer(open_room(n), **common)(recv, src)[0]
    ir_big = PoseTracer(open_room(41), **common)(recv, src)[0]
    diff = ir_small - ir_big

    hi = (n - 0.5) * GS
    d_img = min(
        np.hypot((2 * hi - sx) - rx, sz - rz),   # image over the x=hi wall
        np.hypot(sx - rx, (2 * hi - sz) - rz),   # image over the z=hi wall
    )
    margin = 0.6 * GS + 0.25 * GS  # receiver radius + DDA step quantization
    n_img = int((d_img - margin) / C * sr)
    assert n_img > int(np.hypot(sx - rx, sz - rz) / C * sr) + 20
    assert np.abs(diff[:, :n_img]).max() == 0.0
    assert np.abs(diff[:, n_img:]).max() > 0.0


def schroeder_rt60(ir: np.ndarray, sr: int) -> float:
    """RT60 via the Schroeder backward integral, fit on the -5..-25 dB
    segment and extrapolated to -60 dB."""
    e = (np.asarray(ir, np.float64) ** 2).sum(axis=0)
    sch = np.cumsum(e[::-1])[::-1]
    sch = sch / sch[0]
    db = 10 * np.log10(np.maximum(sch, 1e-12))
    i5 = int(np.argmax(db <= -5.0))
    i25 = int(np.argmax(db <= -25.0))
    assert i25 > i5 > 0, "decay range too short"
    slope = (db[i25] - db[i5]) / ((i25 - i5) / sr)  # dB/s, negative
    return -60.0 / slope


def test_eyring_rt60_sweep():
    """Reverberation time vs wall absorption against the 2-D Eyring model:
    T60 = 13.82 * mfp / (c * -ln(1-a)), mfp = pi * Area / Perimeter. The
    stochastic tracer must land in a band around the closed form and order
    the sweep correctly (the reference anchors its engine the same way with
    a pyroomacoustics RT60 check, examples/soundspaces2_quick_tutorial)."""
    n = 17
    g = open_room(n)
    sr = 8000
    L = n * GS
    mfp = np.pi * (L * L) / (4 * L)
    recv = np.array([[2.0, 2.0, 0.0]], np.float32)
    src = np.array([[5.5, 5.0]], np.float32)
    got, want = [], []
    for a in (0.5, 0.8):
        tr = PoseTracer(g, sampling_rate=sr, rir_max_len=6000, num_rays=800,
                        max_bounces=120, num_threads=4, seed=21,
                        air_absorption=0.0, scattering=1.0,
                        absorption=(a, a, a, a))
        ir = tr(recv, src)[0]
        got.append(schroeder_rt60(ir, sr))
        want.append(13.82 * mfp / (C * -np.log(1.0 - a)))
    assert got[0] > got[1]  # less absorption rings longer
    for g_t, w_t in zip(got, want):
        assert 0.5 * w_t < g_t < 2.0 * w_t, (g_t, w_t)


def test_direct_to_reverberant_ratio_falls_with_distance():
    """DRR must fall monotonically with source distance (1/r direct vs a
    roughly constant reverberant field) — the textbook anchor."""
    n = 17
    g = open_room(n)
    sr = 8000
    tr = PoseTracer(g, sampling_rate=sr, rir_max_len=4000, num_rays=600,
                    max_bounces=80, num_threads=4, seed=17,
                    air_absorption=0.0)
    rx, rz = 1.0, 4.0
    drrs = []
    for d in (1.0, 3.0, 6.0):
        ir = tr(np.array([[rx, rz, 0.0]], np.float32),
                np.array([[rx + d, rz]], np.float32))[0]
        n0 = int(round(d / C * sr))
        w = int(0.004 * sr)
        direct = rir_energy(ir[:, max(n0 - w, 0):n0 + w])
        tail = rir_energy(ir[:, n0 + w:])
        drrs.append(direct / max(tail, 1e-12))
    assert drrs[0] > drrs[1] > drrs[2]
