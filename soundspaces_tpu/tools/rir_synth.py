"""ctypes bindings for the native C++ RIR ray tracer (csrc/rir_tracer.cpp).

The native engine fills the role of RLRAudioPropagation (SoundSpaces2.md):
offline synthesis of the binaural RIR banks the TPU environment consumes.
`synth_rir_bank_native` matches the array contract of
scene/synthetic.synth_rir_bank so the two are interchangeable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from soundspaces_tpu.scene.graph import SceneGraph

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "csrc", "rir_tracer.cpp")
_LIB = os.path.join(_REPO_ROOT, "csrc", "librir_tracer.so")

_lib = None


def build_native_tracer(force: bool = False) -> str:
    """Compile the shared library with g++ (no external deps)."""
    if force or not os.path.exists(_LIB) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-shared", "-fPIC",
                "-std=c++17", "-pthread", _SRC, "-o", _LIB,
            ],
            check=True,
        )
    return _LIB


def native_tracer_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is None:
        build_native_tracer()
        _lib = ctypes.CDLL(_LIB)
        _f32p = ctypes.POINTER(ctypes.c_float)
        _u8p = ctypes.POINTER(ctypes.c_uint8)
        _lib.synth_rir_bank_v2.restype = ctypes.c_int
        _lib.synth_rir_bank_v2.argtypes = [
            _f32p, ctypes.c_int,               # points, n_nodes
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,  # sources
            _u8p, _u8p, ctypes.c_int, ctypes.c_int,  # occ, mat_id, h, w
            ctypes.c_float,                    # grid_size
            ctypes.c_int, ctypes.c_int,        # sampling_rate, rir_len
            ctypes.c_int, ctypes.c_int,        # num_rays, max_bounces
            _f32p, ctypes.c_int,               # materials [n,9], n_materials
            ctypes.c_float,                    # air_absorption
            ctypes.c_int, ctypes.c_int,        # transmission, diffraction
            ctypes.c_uint64, ctypes.c_int,     # seed, num_threads
            _f32p,                             # out
        ]
        _lib.synth_ambisonic_bank.restype = ctypes.c_int
        _lib.synth_ambisonic_bank.argtypes = [
            _f32p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            _u8p, _u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int,
            ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int,                      # ambisonic_order
            ctypes.c_uint64, ctypes.c_int,
            _f32p,
        ]
        _lib.trace_rirs_v2.restype = ctypes.c_int
        _lib.trace_rirs_v2.argtypes = [
            _f32p, ctypes.c_int,               # recv_xzh, batch
            _f32p,                             # src_xz
            _u8p, _u8p, ctypes.c_int, ctypes.c_int,  # occ, mat_id, h, w
            ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_int,
            ctypes.c_float,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_int,
            _f32p,
        ]
        _lib.synth_rir_bank.restype = ctypes.c_int
        _lib.synth_rir_bank.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,  # points, n_nodes
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,  # sources, n_sources
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,  # occ
            ctypes.c_float,  # grid_size
            ctypes.c_int, ctypes.c_int,  # sampling_rate, rir_len
            ctypes.c_int, ctypes.c_int,  # num_rays, max_bounces
            ctypes.POINTER(ctypes.c_float),  # absorption[4]
            ctypes.c_float, ctypes.c_float,  # scattering, air_absorption
            ctypes.c_uint64, ctypes.c_int,  # seed, num_threads
            ctypes.POINTER(ctypes.c_float),  # out
        ]
        _lib.trace_rirs.restype = ctypes.c_int
        _lib.trace_rirs.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,  # recv_xzh, batch
            ctypes.POINTER(ctypes.c_float),  # src_xz
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,  # occ
            ctypes.c_float,  # grid_size
            ctypes.c_int, ctypes.c_int,  # sampling_rate, rir_len
            ctypes.c_int, ctypes.c_int,  # num_rays, max_bounces
            ctypes.POINTER(ctypes.c_float),  # absorption[4]
            ctypes.c_float, ctypes.c_float,  # scattering, air_absorption
            ctypes.c_uint64, ctypes.c_int,  # seed, num_threads
            ctypes.POINTER(ctypes.c_float),  # out
        ]
        # 3-D entry points (full vertical dimension: floor/ceiling
        # heightfields + material rows, elevation-aware SH/binaural)
        _common_3d_mid = [
            _u8p, _u8p, ctypes.c_int, ctypes.c_int,  # occ, mat_id, h, w
            ctypes.c_float,                    # grid_size
            _f32p, _f32p,                      # floor_y, ceil_y (or null)
            ctypes.c_float, ctypes.c_float,    # floor_default, ceil_default
            ctypes.c_int, ctypes.c_int,        # floor_mat, ceil_mat
            ctypes.c_int, ctypes.c_int,        # sampling_rate, rir_len
            ctypes.c_int, ctypes.c_int,        # num_rays, max_bounces
            _f32p, ctypes.c_int,               # materials [n,9], n_materials
            ctypes.c_float,                    # air_absorption
            ctypes.c_int, ctypes.c_int,        # transmission, diffraction
        ]
        _lib.synth_rir_bank_3d.restype = ctypes.c_int
        _lib.synth_rir_bank_3d.argtypes = (
            [_f32p, ctypes.c_int, _f32p, ctypes.c_int]  # points, src_pos
            + _common_3d_mid
            + [ctypes.c_uint64, ctypes.c_int, _f32p]    # seed, threads, out
        )
        _lib.synth_ambisonic_bank_3d.restype = ctypes.c_int
        _lib.synth_ambisonic_bank_3d.argtypes = (
            [_f32p, ctypes.c_int, _f32p, ctypes.c_int]
            + _common_3d_mid
            + [ctypes.c_int,                            # ambisonic_order
               ctypes.c_uint64, ctypes.c_int, _f32p]
        )
        _lib.trace_rirs_3d.restype = ctypes.c_int
        _lib.trace_rirs_3d.argtypes = (
            [_f32p, ctypes.c_int, _f32p]       # recv_xyzh, batch, src_xyz
            + _common_3d_mid
            + [ctypes.c_uint64, ctypes.c_int, _f32p]
        )
        _lib.trace_rirs_3d_coherent.restype = ctypes.c_int
        _lib.trace_rirs_3d_coherent.argtypes = (
            [_f32p, ctypes.c_int, _f32p]       # recv_xyzh, batch, src_xyz
            + _common_3d_mid
            + [ctypes.c_uint64, ctypes.c_int,  # seed, threads
               ctypes.c_int, ctypes.c_float,   # refresh_rays, max_delta
               ctypes.c_uint64,                # frame_idx
               _f32p, _f32p, _f32p]            # state_e, state_pose, out
        )
        _lib.ray_stats.restype = ctypes.c_int
        _lib.ray_stats.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,  # recv_xz, batch
            ctypes.POINTER(ctypes.c_float),  # src_xz
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,  # occ
            ctypes.c_float,  # grid_size
            ctypes.c_int, ctypes.c_int,  # sampling_rate, rir_len
            ctypes.c_int, ctypes.c_int,  # num_rays, max_bounces
            ctypes.POINTER(ctypes.c_float),  # absorption[4]
            ctypes.c_float, ctypes.c_float,  # scattering, air_absorption
            ctypes.c_uint64, ctypes.c_int,  # seed, num_threads
            ctypes.POINTER(ctypes.c_float),  # out [batch, 2]
        ]
    return _lib


def occupancy_from_graph(graph: SceneGraph) -> tuple[np.ndarray, np.ndarray]:
    """Walkable-cell grid (1 cell per graph node footprint) + origin."""
    pts = graph.points
    x0, z0 = pts[:, 0].min(), pts[:, 2].min()
    gx = np.round((pts[:, 0] - x0) / graph.grid_size).astype(np.int64)
    gz = np.round((pts[:, 2] - z0) / graph.grid_size).astype(np.int64)
    occ = np.zeros((gz.max() + 1, gx.max() + 1), np.uint8)
    occ[gz, gx] = 1
    return occ, np.array([x0, z0], np.float32)


def pack_materials(materials) -> np.ndarray:
    """Material table -> the tracer's flat [n, 9] float32 layout:
    absorption[4], scattering, transmission[4] per row (the per-category
    coefficient shape of the reference's material JSON,
    scripts/mp3d_acoustic_properties.py:12-414). Entries are material names
    from tools.materials.MATERIAL_COEFFICIENTS or dicts of the same shape."""
    from soundspaces_tpu.tools.materials import MATERIAL_COEFFICIENTS

    rows = []
    for m in materials:
        if isinstance(m, str):
            m = MATERIAL_COEFFICIENTS[m]
        absorp = list(m["absorption"])
        scat = float(m.get("scattering", 0.3))
        trans = m.get("transmission", 0.0)
        if np.isscalar(trans):
            trans = [float(trans)] * 4
        rows.append(absorp + [scat] + list(trans))
    return np.asarray(rows, np.float32).reshape(len(rows), 9)


def _material_args(
    absorption, scattering, materials, material_grid, occ
):
    """Resolve (materials_flat [n,9], mat_id grid or None) from either the
    v1 uniform coefficients or an explicit per-cell material assignment."""
    if materials is None:
        flat = np.concatenate(
            [np.asarray(absorption, np.float32),
             np.asarray([scattering, 0, 0, 0, 0], np.float32)]
        ).reshape(1, 9)
        return flat, None
    flat = pack_materials(materials)
    if material_grid is None:
        mat_id = None
    else:
        mat_id = np.ascontiguousarray(material_grid, np.uint8)
        assert mat_id.shape == occ.shape, (mat_id.shape, occ.shape)
        assert mat_id.max(initial=0) < len(flat)
    return flat, mat_id


def _mat_ptr(mat_id):
    if mat_id is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_uint8))
    return mat_id.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def synth_rir_bank_native(
    graph: SceneGraph,
    goal_nodes: np.ndarray,
    sampling_rate: int,
    rir_max_len: int,
    num_rays: int = 500,
    max_bounces: int = 40,
    absorption: tuple[float, float, float, float] = (0.08, 0.1, 0.14, 0.2),
    scattering: float = 0.3,
    air_absorption: float = 0.005,
    seed: int = 0,
    num_threads: int = 0,
    materials=None,
    material_grid: np.ndarray | None = None,
    transmission: bool = False,
    diffraction: bool = False,
) -> np.ndarray:
    """Binaural RIRs [4, N, G, 2, rir_max_len] float32 traced natively.
    Defaults mirror the reference's sim config (indirectRayCount=500,
    continuous_simulator.py:123). `materials` (names/dicts, see
    pack_materials) + `material_grid` (uint8 [h, w] cell->material id)
    enable per-surface coefficients; `transmission`/`diffraction` mirror
    the reference engine's acoustics config flags
    (continuous_simulator.py:115-126)."""
    lib = _load()
    occ, origin = occupancy_from_graph(graph)
    pts = graph.points.astype(np.float32).copy()
    pts[:, 0] -= origin[0]
    pts[:, 2] -= origin[1]
    sources = np.asarray(goal_nodes, np.int32)
    out = np.zeros(
        (4, graph.num_nodes, len(sources), 2, rir_max_len), np.float32
    )
    flat, mat_id = _material_args(
        absorption, scattering, materials, material_grid, occ
    )
    ret = lib.synth_rir_bank_v2(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        graph.num_nodes,
        sources.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(sources),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _mat_ptr(mat_id),
        occ.shape[0],
        occ.shape[1],
        ctypes.c_float(graph.grid_size),
        sampling_rate,
        rir_max_len,
        num_rays,
        max_bounces,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(flat),
        ctypes.c_float(air_absorption),
        int(transmission),
        int(diffraction),
        ctypes.c_uint64(seed),
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert ret == 0
    return out


def synth_ambisonic_bank_native(
    graph: SceneGraph,
    goal_nodes: np.ndarray,
    sampling_rate: int,
    rir_max_len: int,
    order: int = 1,
    num_rays: int = 500,
    max_bounces: int = 40,
    absorption: tuple[float, float, float, float] = (0.08, 0.1, 0.14, 0.2),
    scattering: float = 0.3,
    air_absorption: float = 0.005,
    seed: int = 0,
    num_threads: int = 0,
    materials=None,
    material_grid: np.ndarray | None = None,
    transmission: bool = False,
    diffraction: bool = False,
) -> np.ndarray:
    """Ambisonic RIR bank [N, G, (order+1)^2, rir_max_len] float32, ACN/SN3D
    channel order — the reference engine's Ambisonics ChannelLayoutType
    (SoundSpaces2.md config table). Feed to tools.ambisonic.decode_rir_bank
    for the 4-heading binaural bank (ambisonic_to_binaural.py pipeline)."""
    lib = _load()
    occ, origin = occupancy_from_graph(graph)
    pts = graph.points.astype(np.float32).copy()
    pts[:, 0] -= origin[0]
    pts[:, 2] -= origin[1]
    sources = np.asarray(goal_nodes, np.int32)
    n_sh = (order + 1) ** 2
    out = np.zeros(
        (graph.num_nodes, len(sources), n_sh, rir_max_len), np.float32
    )
    flat, mat_id = _material_args(
        absorption, scattering, materials, material_grid, occ
    )
    ret = lib.synth_ambisonic_bank(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        graph.num_nodes,
        sources.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(sources),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _mat_ptr(mat_id),
        occ.shape[0],
        occ.shape[1],
        ctypes.c_float(graph.grid_size),
        sampling_rate,
        rir_max_len,
        num_rays,
        max_bounces,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(flat),
        ctypes.c_float(air_absorption),
        int(transmission),
        int(diffraction),
        order,
        ctypes.c_uint64(seed),
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert ret == 0
    return out


class PoseTracer:
    """Per-step RIR tracing at continuous poses — the role of the embedded
    AudioSensor that re-renders a fresh RIR each step in SS2.0
    (continuous_simulator.py:115-126, 370-426). Holds the host-side scene
    grid; __call__ traces a batch of (receiver pose, source) pairs with the
    native thread pool."""

    def __init__(
        self,
        graph: SceneGraph,
        sampling_rate: int,
        rir_max_len: int,
        num_rays: int = 500,
        max_bounces: int = 40,
        absorption: tuple[float, float, float, float] = (0.08, 0.1, 0.14, 0.2),
        scattering: float = 0.3,
        air_absorption: float = 0.005,
        seed: int = 0,
        num_threads: int = 0,
        materials=None,
        material_grid: np.ndarray | None = None,
        transmission: bool = False,
        diffraction: bool = False,
    ):
        self._lib = _load()
        self._occ, self._origin = occupancy_from_graph(graph)
        self.grid_size = float(graph.grid_size)
        self.sampling_rate = sampling_rate
        self.rir_max_len = rir_max_len
        self.num_rays = num_rays
        self.max_bounces = max_bounces
        self._absorption = np.asarray(absorption, np.float32)
        self.scattering = scattering
        self.air_absorption = air_absorption
        self.seed = seed
        self.num_threads = num_threads
        self._materials, self._mat_id = _material_args(
            absorption, scattering, materials, material_grid, self._occ
        )
        self.transmission = bool(transmission)
        self.diffraction = bool(diffraction)

    def __call__(
        self, recv_xzh: np.ndarray, src_xz: np.ndarray
    ) -> np.ndarray:
        """recv_xzh [B, 3] world (x, z, heading rad); src_xz [B, 2] world.
        Returns [B, 2, rir_max_len] float32."""
        recv = np.ascontiguousarray(recv_xzh, np.float32).copy()
        src = np.ascontiguousarray(src_xz, np.float32).copy()
        recv[:, 0] -= self._origin[0]
        recv[:, 1] -= self._origin[1]
        src[:, 0] -= self._origin[0]
        src[:, 1] -= self._origin[1]
        b = recv.shape[0]
        out = np.zeros((b, 2, self.rir_max_len), np.float32)
        ret = self._lib.trace_rirs_v2(
            recv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _mat_ptr(self._mat_id),
            self._occ.shape[0],
            self._occ.shape[1],
            ctypes.c_float(self.grid_size),
            self.sampling_rate,
            self.rir_max_len,
            self.num_rays,
            self.max_bounces,
            self._materials.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._materials),
            ctypes.c_float(self.air_absorption),
            int(self.transmission),
            int(self.diffraction),
            ctypes.c_uint64(self.seed),
            self.num_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert ret == 0
        return out

    def ray_stats(
        self, recv_xz: np.ndarray, src_xz: np.ndarray
    ) -> np.ndarray:
        """Physical sanity probes of the ray tracer at (receiver, source)
        pairs — the AudioSensor's getRayEfficiency() / sourceIsVisible()
        surface (SoundSpaces2 quick tutorial). recv_xz [B, 2], src_xz
        [B, 2] world coords. Returns [B, 2] float32:
        column 0 = fraction of indirect rays that reached the receiver,
        column 1 = 1.0 iff the direct path is unoccluded."""
        recv = np.ascontiguousarray(recv_xz, np.float32).copy()
        src = np.ascontiguousarray(src_xz, np.float32).copy()
        recv[:, 0] -= self._origin[0]
        recv[:, 1] -= self._origin[1]
        src[:, 0] -= self._origin[0]
        src[:, 1] -= self._origin[1]
        b = recv.shape[0]
        out = np.zeros((b, 2), np.float32)
        ret = self._lib.ray_stats(
            recv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._occ.shape[0],
            self._occ.shape[1],
            ctypes.c_float(self.grid_size),
            self.sampling_rate,
            self.rir_max_len,
            self.num_rays,
            self.max_bounces,
            self._absorption.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(self.scattering),
            ctypes.c_float(self.air_absorption),
            ctypes.c_uint64(self.seed),
            self.num_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert ret == 0
        return out


# ------------------------------------------------------------------- 3-D API
# Full vertical dimension: the reference engine traces in 3-D
# (SoundSpaces2.md:3-5) and source heights matter throughout it (the +1.5 m
# goal offset, simulator.py:390; dataset height offsets, utils.py:15-39).
# Floor and ceiling are per-cell height surfaces with their own material
# rows; receivers/sources carry real y coordinates.

#: the reference's sensor/goal elevation offset above the navigation node
#: (simulator.py:390 sets the audio source 1.5 m above the goal position)
REFERENCE_HEIGHT_OFFSET = 1.5


def heightfields_from_graph(
    graph: SceneGraph, room_height: float = 3.0
) -> tuple[np.ndarray, np.ndarray]:
    """Per-cell (floor, ceiling) heightfields [h, w] float32 from the graph
    node elevations (each node's y is its cell's floor height — the same
    per-cell floor the mesh_metadata heightfield rasterizer extracts).
    Cells without a node get the scene's minimum floor height."""
    occ, origin = occupancy_from_graph(graph)
    pts = graph.points
    gx = np.round((pts[:, 0] - origin[0]) / graph.grid_size).astype(np.int64)
    gz = np.round((pts[:, 2] - origin[1]) / graph.grid_size).astype(np.int64)
    floor = np.full(occ.shape, float(pts[:, 1].min()), np.float32)
    floor[gz, gx] = pts[:, 1].astype(np.float32)
    return floor, floor + np.float32(room_height)


def _f32p_or_null(arr):
    if arr is None:
        return ctypes.cast(None, ctypes.POINTER(ctypes.c_float))
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _scene3_args(graph, occ, origin, floor, ceil, room_height,
                 floor_default, ceil_default):
    """Resolve (floor_arr, ceil_arr, floor_default, ceil_default) with
    origin-shifted heightfields derived from the graph when not given."""
    if floor is None and ceil is None and floor_default is None:
        floor, ceil = heightfields_from_graph(graph, room_height)
    if floor is not None:
        floor = np.ascontiguousarray(floor, np.float32)
        assert floor.shape == occ.shape, (floor.shape, occ.shape)
    if ceil is not None:
        ceil = np.ascontiguousarray(ceil, np.float32)
        assert ceil.shape == occ.shape, (ceil.shape, occ.shape)
    fd = 0.0 if floor_default is None else float(floor_default)
    cd = fd + room_height if ceil_default is None else float(ceil_default)
    return floor, ceil, fd, cd


def synth_rir_bank_native_3d(
    graph: SceneGraph,
    goal_nodes: np.ndarray,
    sampling_rate: int,
    rir_max_len: int,
    num_rays: int = 500,
    max_bounces: int = 40,
    absorption: tuple[float, float, float, float] = (0.08, 0.1, 0.14, 0.2),
    scattering: float = 0.3,
    air_absorption: float = 0.005,
    seed: int = 0,
    num_threads: int = 0,
    materials=None,
    material_grid: np.ndarray | None = None,
    transmission: bool = False,
    diffraction: bool = False,
    receiver_height: float = REFERENCE_HEIGHT_OFFSET,
    source_height: float = REFERENCE_HEIGHT_OFFSET,
    room_height: float = 3.0,
    floor: np.ndarray | None = None,
    ceil: np.ndarray | None = None,
    floor_default: float | None = None,
    ceil_default: float | None = None,
    floor_material: int = 0,
    ceil_material: int = 0,
) -> np.ndarray:
    """Binaural RIRs [4, N, G, 2, rir_max_len] traced in full 3-D: rays
    reflect off walls AND the floor/ceiling surfaces (their own material
    rows `floor_material`/`ceil_material`), receivers sit at node y +
    `receiver_height`, sources at goal-node y + `source_height` (the
    reference's +1.5 m offset, simulator.py:390). `floor`/`ceil` take
    explicit [h, w] heightfields (tools/mesh_metadata.py rasterization);
    by default they derive from the graph's node elevations with a flat
    `room_height` ceiling."""
    lib = _load()
    occ, origin = occupancy_from_graph(graph)
    pts = graph.points.astype(np.float32).copy()
    pts[:, 0] -= origin[0]
    pts[:, 2] -= origin[1]
    recv = pts.copy()
    recv[:, 1] += np.float32(receiver_height)
    sources = np.asarray(goal_nodes, np.int64)
    src_pos = pts[sources].copy()
    src_pos[:, 1] += np.float32(source_height)
    out = np.zeros(
        (4, graph.num_nodes, len(sources), 2, rir_max_len), np.float32
    )
    flat, mat_id = _material_args(
        absorption, scattering, materials, material_grid, occ
    )
    floor, ceil, fd, cd = _scene3_args(
        graph, occ, origin, floor, ceil, room_height, floor_default,
        ceil_default,
    )
    ret = lib.synth_rir_bank_3d(
        recv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        graph.num_nodes,
        src_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(sources),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _mat_ptr(mat_id),
        occ.shape[0],
        occ.shape[1],
        ctypes.c_float(graph.grid_size),
        _f32p_or_null(floor),
        _f32p_or_null(ceil),
        ctypes.c_float(fd),
        ctypes.c_float(cd),
        int(floor_material),
        int(ceil_material),
        sampling_rate,
        rir_max_len,
        num_rays,
        max_bounces,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(flat),
        ctypes.c_float(air_absorption),
        int(transmission),
        int(diffraction),
        ctypes.c_uint64(seed),
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert ret == 0
    return out


def synth_ambisonic_bank_native_3d(
    graph: SceneGraph,
    goal_nodes: np.ndarray,
    sampling_rate: int,
    rir_max_len: int,
    order: int = 1,
    num_rays: int = 500,
    max_bounces: int = 40,
    absorption: tuple[float, float, float, float] = (0.08, 0.1, 0.14, 0.2),
    scattering: float = 0.3,
    air_absorption: float = 0.005,
    seed: int = 0,
    num_threads: int = 0,
    materials=None,
    material_grid: np.ndarray | None = None,
    transmission: bool = False,
    diffraction: bool = False,
    receiver_height: float = REFERENCE_HEIGHT_OFFSET,
    source_height: float = REFERENCE_HEIGHT_OFFSET,
    room_height: float = 3.0,
    floor: np.ndarray | None = None,
    ceil: np.ndarray | None = None,
    floor_default: float | None = None,
    ceil_default: float | None = None,
    floor_material: int = 0,
    ceil_material: int = 0,
) -> np.ndarray:
    """Ambisonic RIR bank [N, G, (order+1)^2, rir_max_len] ACN/SN3D traced
    in 3-D — the vertical harmonics (Z, T, S) carry real elevation content,
    unlike the horizontal-plane bank of synth_ambisonic_bank_native."""
    lib = _load()
    occ, origin = occupancy_from_graph(graph)
    pts = graph.points.astype(np.float32).copy()
    pts[:, 0] -= origin[0]
    pts[:, 2] -= origin[1]
    recv = pts.copy()
    recv[:, 1] += np.float32(receiver_height)
    sources = np.asarray(goal_nodes, np.int64)
    src_pos = pts[sources].copy()
    src_pos[:, 1] += np.float32(source_height)
    n_sh = (order + 1) ** 2
    out = np.zeros(
        (graph.num_nodes, len(sources), n_sh, rir_max_len), np.float32
    )
    flat, mat_id = _material_args(
        absorption, scattering, materials, material_grid, occ
    )
    floor, ceil, fd, cd = _scene3_args(
        graph, occ, origin, floor, ceil, room_height, floor_default,
        ceil_default,
    )
    ret = lib.synth_ambisonic_bank_3d(
        recv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        graph.num_nodes,
        src_pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(sources),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _mat_ptr(mat_id),
        occ.shape[0],
        occ.shape[1],
        ctypes.c_float(graph.grid_size),
        _f32p_or_null(floor),
        _f32p_or_null(ceil),
        ctypes.c_float(fd),
        ctypes.c_float(cd),
        int(floor_material),
        int(ceil_material),
        sampling_rate,
        rir_max_len,
        num_rays,
        max_bounces,
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(flat),
        ctypes.c_float(air_absorption),
        int(transmission),
        int(diffraction),
        order,
        ctypes.c_uint64(seed),
        num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    assert ret == 0
    return out


class PoseTracer3D:
    """Per-step 3-D RIR tracing at continuous poses (x, y, z, heading) —
    the elevation-aware upgrade of PoseTracer. Receiver y is the EAR
    height (caller applies any offset); source positions are full 3-D."""

    def __init__(
        self,
        graph: SceneGraph,
        sampling_rate: int,
        rir_max_len: int,
        num_rays: int = 500,
        max_bounces: int = 40,
        absorption: tuple[float, float, float, float] = (0.08, 0.1, 0.14, 0.2),
        scattering: float = 0.3,
        air_absorption: float = 0.005,
        seed: int = 0,
        num_threads: int = 0,
        materials=None,
        material_grid: np.ndarray | None = None,
        transmission: bool = False,
        diffraction: bool = False,
        room_height: float = 3.0,
        floor: np.ndarray | None = None,
        ceil: np.ndarray | None = None,
        floor_default: float | None = None,
        ceil_default: float | None = None,
        floor_material: int = 0,
        ceil_material: int = 0,
    ):
        self._lib = _load()
        self._occ, self._origin = occupancy_from_graph(graph)
        self.grid_size = float(graph.grid_size)
        self.sampling_rate = sampling_rate
        self.rir_max_len = rir_max_len
        self.num_rays = num_rays
        self.max_bounces = max_bounces
        self.air_absorption = air_absorption
        self.seed = seed
        self.num_threads = num_threads
        self._materials, self._mat_id = _material_args(
            absorption, scattering, materials, material_grid, self._occ
        )
        self.transmission = bool(transmission)
        self.diffraction = bool(diffraction)
        self._floor, self._ceil, self._fd, self._cd = _scene3_args(
            graph, self._occ, self._origin, floor, ceil, room_height,
            floor_default, ceil_default,
        )
        self.floor_material = int(floor_material)
        self.ceil_material = int(ceil_material)

    def __call__(
        self, recv_xyzh: np.ndarray, src_xyz: np.ndarray
    ) -> np.ndarray:
        """recv_xyzh [B, 4] world (x, y, z, heading rad); src_xyz [B, 3]
        world. Returns [B, 2, rir_max_len] float32."""
        recv = np.ascontiguousarray(recv_xyzh, np.float32).copy()
        src = np.ascontiguousarray(src_xyz, np.float32).copy()
        recv[:, 0] -= self._origin[0]
        recv[:, 2] -= self._origin[1]
        src[:, 0] -= self._origin[0]
        src[:, 2] -= self._origin[1]
        b = recv.shape[0]
        out = np.zeros((b, 2, self.rir_max_len), np.float32)
        ret = self._lib.trace_rirs_3d(
            recv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _mat_ptr(self._mat_id),
            self._occ.shape[0],
            self._occ.shape[1],
            ctypes.c_float(self.grid_size),
            _f32p_or_null(self._floor),
            _f32p_or_null(self._ceil),
            ctypes.c_float(self._fd),
            ctypes.c_float(self._cd),
            self.floor_material,
            self.ceil_material,
            self.sampling_rate,
            self.rir_max_len,
            self.num_rays,
            self.max_bounces,
            self._materials.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._materials),
            ctypes.c_float(self.air_absorption),
            int(self.transmission),
            int(self.diffraction),
            ctypes.c_uint64(self.seed),
            self.num_threads,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert ret == 0
        return out


NUM_BANDS = 4  # kNumBands in csrc/rir_tracer.cpp


class CoherentPoseTracer3D(PoseTracer3D):
    """Temporal-coherence 3-D tracer — the analog of the reference
    engine's temporalCoherence config (SoundSpaces2.md config table;
    enabled by the reference's continuous simulator,
    continuous_simulator.py:115-126, for an ~10x ray reduction under
    continuous motion).

    Holds the per-env cached stochastic energy field between calls; for
    pose deltas <= max_delta only ``refresh_rays`` fresh rays are traced
    per call and exponentially blended into the cache (steady-state
    effective ray count == num_rays). The direct arrival / ITD / ILD /
    occlusion / diffraction are recomputed exactly at every call. Call
    ``reset(indices)`` at episode boundaries (teleports beyond max_delta
    also force a clean full retrace automatically)."""

    def __init__(self, *args, refresh_rays: int | None = None,
                 max_delta: float = 0.6, **kw):
        super().__init__(*args, **kw)
        self.refresh_rays = (
            int(refresh_rays) if refresh_rays is not None
            else max(1, self.num_rays // 10)
        )
        self.max_delta = float(max_delta)
        self._frame = 0
        # slot -> (state_e, state_pose): callers rendering SEVERAL sources
        # per step for the same batch index (goal + distractor in the
        # continuous env) must use distinct slots, or the alternating
        # sources would either defeat the reuse (far apart: every call a
        # full retrace) or blend two sources' fields (within max_delta)
        self._state: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    @property
    def _state_e(self):
        st = self._state.get(0)
        return None if st is None else st[0]

    @property
    def _state_pose(self):
        st = self._state.get(0)
        return None if st is None else st[1]

    def reset(self, indices: np.ndarray | None = None):
        """Invalidate the cached field (all envs/slots, or the given
        env indices)."""
        for _, pose in self._state.values():
            if indices is None:
                pose[:, 6] = 0.0
            else:
                pose[np.asarray(indices), 6] = 0.0

    def _ensure_state(self, batch: int, slot: int):
        st = self._state.get(slot)
        if st is None or st[0].shape[0] != batch:
            self._state[slot] = (
                np.zeros((batch, NUM_BANDS, self.rir_max_len), np.float32),
                np.zeros((batch, 7), np.float32),
            )
        return self._state[slot]

    def __call__(
        self,
        recv_xyzh: np.ndarray,
        src_xyz: np.ndarray,
        slot: int = 0,
        fresh: np.ndarray | None = None,
    ) -> np.ndarray:
        """`slot` separates caches for distinct per-step sources; `fresh`
        (bool [B]) force-invalidates rows first — the continuous env
        passes its auto-reset `done` mask so a new episode starting near
        the previous pose still gets a clean full retrace."""
        recv = np.ascontiguousarray(recv_xyzh, np.float32).copy()
        src = np.ascontiguousarray(src_xyz, np.float32).copy()
        recv[:, 0] -= self._origin[0]
        recv[:, 2] -= self._origin[1]
        src[:, 0] -= self._origin[0]
        src[:, 2] -= self._origin[1]
        b = recv.shape[0]
        state_e, state_pose = self._ensure_state(b, int(slot))
        if fresh is not None:
            state_pose[np.asarray(fresh, bool), 6] = 0.0
        out = np.zeros((b, 2, self.rir_max_len), np.float32)
        self._frame += 1
        ret = self._lib.trace_rirs_3d_coherent(
            recv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _mat_ptr(self._mat_id),
            self._occ.shape[0],
            self._occ.shape[1],
            ctypes.c_float(self.grid_size),
            _f32p_or_null(self._floor),
            _f32p_or_null(self._ceil),
            ctypes.c_float(self._fd),
            ctypes.c_float(self._cd),
            self.floor_material,
            self.ceil_material,
            self.sampling_rate,
            self.rir_max_len,
            self.num_rays,
            self.max_bounces,
            self._materials.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._materials),
            ctypes.c_float(self.air_absorption),
            int(self.transmission),
            int(self.diffraction),
            ctypes.c_uint64(self.seed),
            self.num_threads,
            self.refresh_rays,
            ctypes.c_float(self.max_delta),
            ctypes.c_uint64(self._frame),
            state_e.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            state_pose.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        assert ret == 0
        return out


class HorizontalPoseAdapter:
    """PoseTracer-compatible facade over PoseTracer3D for the continuous
    env's host-callback contract ((recv [B, 3] = x, z, heading; src [B, 2])
    -> [B, 2, L]): poses are lifted to 3-D with the per-cell floor height
    plus fixed ear/source offsets — SS2.0 agents steer in the plane but the
    reference engine traces their RIRs in 3-D (SoundSpaces2.md:3-5,
    continuous_simulator.py:341 sets the source 1.5 m up)."""

    def __init__(
        self,
        tracer3d: PoseTracer3D,
        receiver_height: float = REFERENCE_HEIGHT_OFFSET,
        source_height: float = REFERENCE_HEIGHT_OFFSET,
    ):
        self.tracer = tracer3d
        self.receiver_height = float(receiver_height)
        self.source_height = float(source_height)
        self.rir_max_len = tracer3d.rir_max_len

    def _floor_at(self, x: np.ndarray, z: np.ndarray) -> np.ndarray:
        t = self.tracer
        if t._floor is None:
            return np.full(x.shape, t._fd, np.float32)
        gx = np.clip(
            np.round((x - t._origin[0]) / t.grid_size).astype(np.int64),
            0, t._floor.shape[1] - 1,
        )
        gz = np.clip(
            np.round((z - t._origin[1]) / t.grid_size).astype(np.int64),
            0, t._floor.shape[0] - 1,
        )
        return t._floor[gz, gx]

    def __call__(
        self, recv_xzh: np.ndarray, src_xz: np.ndarray, **kw
    ) -> np.ndarray:
        recv_xzh = np.asarray(recv_xzh, np.float32)
        src_xz = np.asarray(src_xz, np.float32)
        recv = np.empty((recv_xzh.shape[0], 4), np.float32)
        recv[:, 0] = recv_xzh[:, 0]
        recv[:, 1] = (
            self._floor_at(recv_xzh[:, 0], recv_xzh[:, 1])
            + self.receiver_height
        )
        recv[:, 2] = recv_xzh[:, 1]
        recv[:, 3] = recv_xzh[:, 2]
        src = np.empty((src_xz.shape[0], 3), np.float32)
        src[:, 0] = src_xz[:, 0]
        src[:, 1] = self._floor_at(src_xz[:, 0], src_xz[:, 1]) + self.source_height
        src[:, 2] = src_xz[:, 1]
        # kw (slot=, fresh=) passes through to CoherentPoseTracer3D; the
        # plain PoseTracer3D is never called with kwargs
        return self.tracer(recv, src, **kw)
