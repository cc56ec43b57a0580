"""Live depth rasterization over the walkable-occupancy grid.

Plays habitat-sim's renderer role (the C++ rasterizer behind the RGB/depth
sensors, soundspaces/simulator.py:148) for this platform's 2.5-D grid
scenes: a pinhole camera raycaster that DDA-marches each image column
through the occupancy grid and projects wall hits into a depth image. Pure
jax — it jits, vmaps over envs, and runs on device, so continuous-motion
visual observations are POSE-EXACT rather than nearest-node cache gathers
(the reference can only serve cached frames at graph poses when
USE_RENDERED_OBSERVATIONS=True, simulator.py:143-146).

Camera model: y-up world, heading is the compass angle in the (x, z) plane
(the platform's convention: orientation = 270 - 90*rot degrees). The camera
sits at `camera_height` above the floor; walls rise `wall_height` from the
floor. Depth is the perpendicular (z-buffer) distance, normalized to
[0, 1] by `max_depth` like habitat's normalized-depth sensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "num_steps", "fov_deg", "max_depth",
        "camera_height", "wall_height", "resolution",
    ),
)
def render_depth(
    occupancy: jax.Array,  # [Gz, Gx] 1.0 = walkable (0 = wall)
    x: jax.Array,  # scalar f32 camera position, occupancy-grid meters
    z: jax.Array,
    heading: jax.Array,  # scalar f32 compass angle (rad)
    height: int = 128,
    width: int = 128,
    fov_deg: float = 90.0,
    max_depth: float = 10.0,
    camera_height: float = 1.25,
    wall_height: float = 2.5,
    resolution: float = 0.1,
    num_steps: int = 256,
) -> jax.Array:
    """Depth image [height, width, 1] float32 in [0, 1]."""
    focal = (width / 2.0) / jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    u = (jnp.arange(width, dtype=jnp.float32) - (width - 1) / 2.0) / focal
    col_ang = heading + jnp.arctan(u)  # [W] ray compass angles
    cos_off = jnp.cos(jnp.arctan(u))  # perpendicular-depth correction

    # march all columns in lockstep: positions [S, W]
    t = (jnp.arange(1, num_steps + 1, dtype=jnp.float32) / num_steps)[
        :, None
    ] * (max_depth / jnp.maximum(cos_off, 0.25))[None, :]
    px = x + t * jnp.cos(col_ang)[None, :]
    pz = z + t * jnp.sin(col_ang)[None, :]
    gz = jnp.clip((pz / resolution).astype(jnp.int32), 0,
                  occupancy.shape[0] - 1)
    gx = jnp.clip((px / resolution).astype(jnp.int32), 0,
                  occupancy.shape[1] - 1)
    blocked = occupancy[gz, gx] < 0.5  # [S, W]
    any_hit = jnp.any(blocked, axis=0)
    first = jnp.argmax(blocked, axis=0)  # [W] first blocked step
    ray_dist = jnp.take_along_axis(t, first[None, :], axis=0)[0]
    wall_depth = jnp.where(any_hit, ray_dist * cos_off, max_depth)  # [W]

    # vertical projection: rows above/below the horizon see ceiling-less sky
    # (max_depth) / floor; rows within the wall's projected extent see the
    # wall. v > 0 means below the horizon (image rows grow downward).
    v = (jnp.arange(height, dtype=jnp.float32) - (height - 1) / 2.0) / focal
    wall_top = (wall_height - camera_height) / jnp.maximum(wall_depth, 1e-3)
    wall_bot = camera_height / jnp.maximum(wall_depth, 1e-3)
    on_wall = (v[:, None] >= -wall_top[None, :]) & (
        v[:, None] <= wall_bot[None, :]
    )
    # floor depth where the row's ray meets the ground plane
    floor_depth = jnp.where(
        v > 1e-4, camera_height / jnp.maximum(v, 1e-4), max_depth
    )  # [H]
    depth = jnp.where(on_wall, wall_depth[None, :], floor_depth[:, None])
    depth = jnp.minimum(depth, max_depth) / max_depth
    return depth[..., None].astype(jnp.float32)


def render_depth_bank(
    occupancy, node_grid_xz, height: int = 128, width: int = 128,
    resolution: float = 0.1, **kw
):
    """Depth frames at every (node, heading) — the cache_observations role
    (scripts/cache_observations.py:44-107) with the live renderer. Returns
    [N, 4, H, W, 1] float32."""
    import numpy as np

    xz = jnp.asarray(node_grid_xz, jnp.float32) * resolution
    headings = jnp.deg2rad(270.0 - 90.0 * jnp.arange(4, dtype=jnp.float32))

    render = jax.jit(
        jax.vmap(
            jax.vmap(
                lambda x, z, h: render_depth(
                    occupancy, x, z, h, height=height, width=width,
                    resolution=resolution, **kw
                ),
                in_axes=(None, None, 0),
            ),
            in_axes=(0, 0, None),
        )
    )
    return np.asarray(render(xz[:, 0], xz[:, 1], headings))
