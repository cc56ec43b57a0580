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
) -> np.ndarray:
    """Binaural RIRs [4, N, G, 2, rir_max_len] float32 traced natively.
    Defaults mirror the reference's sim config (indirectRayCount=500,
    continuous_simulator.py:123)."""
    lib = _load()
    occ, origin = occupancy_from_graph(graph)
    pts = graph.points.astype(np.float32).copy()
    pts[:, 0] -= origin[0]
    pts[:, 2] -= origin[1]
    sources = np.asarray(goal_nodes, np.int32)
    out = np.zeros(
        (4, graph.num_nodes, len(sources), 2, rir_max_len), np.float32
    )
    absorp = np.asarray(absorption, np.float32)
    ret = lib.synth_rir_bank(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        graph.num_nodes,
        sources.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(sources),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        occ.shape[0],
        occ.shape[1],
        ctypes.c_float(graph.grid_size),
        sampling_rate,
        rir_max_len,
        num_rays,
        max_bounces,
        absorp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scattering),
        ctypes.c_float(air_absorption),
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
        ret = self._lib.trace_rirs(
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
