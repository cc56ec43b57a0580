"""EgoMap from depth: point-cloud projection to a top-down local map.

The reference's EgoMap sensor (soundspaces/tasks/nav.py:235-405) unprojects
the depth image through the camera intrinsics into an egocentric point
cloud, keeps points inside a height band as obstacles, marks every observed
point as explored, and bins both into a 2-channel top-down grid around the
agent (31^2 cells @ 0.1 m, height thresholds per
av_wan/config/default.py:155-158), followed by a morphological close.

This is the same computation as one fused jit/vmap kernel: unproject ->
height-band mask -> scatter-max into the map -> 3x3 binary close. It feeds
the EgoMap sensor and the AV-WaN mapper, so the agent maps only what its
camera has SEEN — the partial observability the reference agent has —
rather than reading the simulator's true walkable grid.

Camera conventions match ops/raycast.py::render_depth (the in-tree
habitat-sim-renderer equivalent): perpendicular (z-buffer) depth normalized
by max_depth, y-up world, heading = compass angle in the (x, z) plane,
image columns bending toward increasing compass angle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "map_size", "resolution", "fov_deg", "max_depth", "camera_height",
        "height_thresh", "morphological_close",
    ),
)
def depth_to_egomap(
    depth: jax.Array,  # [H, W] or [H, W, 1] normalized depth in [0, 1]
    map_size: int = 31,
    resolution: float = 0.1,
    fov_deg: float = 90.0,
    max_depth: float = 10.0,
    camera_height: float = 1.25,
    height_thresh: tuple[float, float] = (0.5, 2.0),
    morphological_close: bool = True,
) -> jax.Array:
    """[map_size, map_size, 2] float32 (obstacle, explored), agent at the
    center cell facing up (decreasing row = forward)."""
    if depth.ndim == 3:
        depth = depth[..., 0]
    h, w = depth.shape
    focal = (w / 2.0) / jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    u = (jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0) / focal
    v = (jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0) / focal

    z_cam = depth * max_depth  # [H, W] perpendicular depth
    x_cam = u[None, :] * z_cam  # lateral (+ = camera right)
    y_cam = v[:, None] * z_cam  # image-down
    height = camera_height - y_cam  # world height above the floor

    valid = z_cam < max_depth * 0.99  # the reference also drops far returns
    obstacle = valid & (height >= height_thresh[0]) & (
        height <= height_thresh[1]
    )
    explored = valid & (height <= height_thresh[1])

    c = map_size // 2
    row = c - jnp.round(z_cam / resolution).astype(jnp.int32)
    col = c + jnp.round(x_cam / resolution).astype(jnp.int32)
    in_map = (row >= 0) & (row < map_size) & (col >= 0) & (col < map_size)
    row = jnp.clip(row, 0, map_size - 1).reshape(-1)
    col = jnp.clip(col, 0, map_size - 1).reshape(-1)
    obs_v = (obstacle & in_map).astype(jnp.float32).reshape(-1)
    exp_v = (explored & in_map).astype(jnp.float32).reshape(-1)

    zeros = jnp.zeros((map_size, map_size), jnp.float32)
    obs_map = zeros.at[row, col].max(obs_v)
    exp_map = zeros.at[row, col].max(exp_v)
    # the agent's own cell is explored free space
    exp_map = exp_map.at[c, c].set(1.0)

    if morphological_close:
        obs_map = _binary_close(obs_map)
        exp_map = jnp.maximum(exp_map, obs_map)
    return jnp.stack([obs_map, exp_map], axis=-1)


def _binary_close(m: jax.Array) -> jax.Array:
    """3x3 dilation then erosion (skimage.morphology.binary_closing in the
    reference, nav.py:235-405) via reduce_window."""
    dil = jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    ero = -jax.lax.reduce_window(
        -dil, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.clip(ero, 0.0, 1.0)


def egomap_at_pose(
    occupancy: jax.Array,
    x: jax.Array,  # camera position, occupancy-grid METERS (cell * res)
    z: jax.Array,
    heading: jax.Array,
    map_size: int = 31,
    resolution: float = 0.1,
    depth_hw: int = 64,
    fov_deg: float = 90.0,
    max_depth: float = 10.0,
    camera_height: float = 1.25,
    height_thresh: tuple[float, float] = (0.5, 2.0),
    morphological_close: bool = True,
) -> jax.Array:
    """Render depth at the pose (ops/raycast.py) and project it — the full
    sensor path the reference runs (depth camera -> EgoMap), fused."""
    from soundspaces_tpu.ops.raycast import render_depth

    depth = render_depth(
        occupancy, x, z, heading, height=depth_hw, width=depth_hw,
        fov_deg=fov_deg, max_depth=max_depth, camera_height=camera_height,
        resolution=resolution,
    )
    return depth_to_egomap(
        depth, map_size=map_size, resolution=resolution, fov_deg=fov_deg,
        max_depth=max_depth, camera_height=camera_height,
        height_thresh=height_thresh,
        morphological_close=morphological_close,
    )
