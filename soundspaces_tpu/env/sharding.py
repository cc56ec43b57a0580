"""Mesh-sharded scene banks — the MP3D-scale HBM story.

The reference's full MP3D binaural RIR set is 682 GB (soundspaces/
README.md:9,23): far beyond one chip's HBM. The reference streams RIR wavs
from disk per step on each worker's host (simulator.py:614-618); the
TPU-native answer is to SHARD the per-scene banks over the device mesh —
bank memory scales 1/N with chips and the per-step RIR gathers ride ICI,
per the standard GSPMD recipe (annotate shardings, let XLA insert the
collectives).

`shard_scene_banks` places the node-indexed banks (RIR tensors, frame
caches, geodesic tables) with a NamedSharding over a mesh axis on their
node dimension and replicates the small per-scene tables. The env step is
unchanged — the same `step_pure(scene, ...)` jit works on a sharded scene,
producing identical observations (test_parallel covers exactness on an
8-virtual-device mesh).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from soundspaces_tpu.env.structs import DeviceScene

# field -> index of its node dimension
_NODE_DIMS = {
    "rir": 1,  # [4, N, G, 2, L]
    # c64 layout [4, N, G, 2, P, B]; the bf16 (re, im)-pair layout
    # [2, 4, N, G, 2, P, B] adds a leading pair axis (node dim becomes 2 —
    # handled by the dtype branch in shard_scene_banks below)
    "rir_part_fft": 1,
    "geodesic_hops": 0,  # [N, N]
    "oracle_next": 0,  # [N, N]
}
_FRAME_NODE_DIM = 0  # frames[mod]: [N, 4, H, W, C]


def shard_scene_banks(
    mesh: Mesh, scene: DeviceScene, axis: str
) -> DeviceScene:
    """Shard the big node-indexed banks of `scene` over `mesh` axis `axis`;
    replicate everything else. The node count must divide the axis size
    evenly (pad the scene graph if not — synthetic grids already are)."""
    n_shards = mesh.shape[axis]
    n_nodes = scene.points.shape[0]
    assert n_nodes % n_shards == 0, (
        f"{n_nodes} nodes not divisible by mesh axis {axis}={n_shards}; "
        "pad the graph to a multiple"
    )

    def put(x, node_dim=None):
        if x is None:
            return None
        if node_dim is None:
            spec = P()
        else:
            spec = P(*([None] * node_dim + [axis]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    updates = {}
    for f, dim in _NODE_DIMS.items():
        x = getattr(scene, f)
        if f == "rir_part_fft" and x is not None and not jax.numpy.issubdtype(
            x.dtype, jax.numpy.complexfloating
        ):
            dim += 1  # bf16 pair banks carry a leading (re, im) axis
        updates[f] = put(x, dim)
    replicate_fields = (
        "points", "forward_neighbor", "goal_slot_of_node", "seg_fft",
        "seg_block_fft", "sounds", "sounds_ext", "sound_lengths_sec",
        "occupancy", "node_grid_xz", "proximity", "instance_to_mpcat",
    )
    for f in replicate_fields:
        updates[f] = put(getattr(scene, f))
    updates["frames"] = {
        k: put(v, _FRAME_NODE_DIM) for k, v in scene.frames.items()
    }
    return scene.replace(**updates)


def bank_bytes_per_device(scene: DeviceScene, n_shards: int) -> int:
    """Sharded-bank HBM footprint per device (the planning number for
    MP3D-scale scenes)."""
    total = 0
    for f, _ in _NODE_DIMS.items():
        x = getattr(scene, f)
        if x is not None:
            total += x.size * x.dtype.itemsize // n_shards
    for v in scene.frames.values():
        total += v.size * v.dtype.itemsize // n_shards
    return total
