"""Allocentric geometric + acoustic maps as pure array state.

Reference Mapper (ss_baselines/av_wan/models/mapper.py:27-346): a 500^2-cell
0.1 m/cell allocentric map with (obstacle, explored) channels built by
registering rotated egocentric patches, plus a 20^2-cell 0.5 m/cell acoustic
map of average audio intensity; the policy sees egocentric crops.

Here the map lives in EnvState ([Hm, Wm, 2] float32 per env); registration
is a rotate (exact for 90-degree headings: jnp.rot90 under lax.switch) +
dynamic-slice accumulate; crops are dynamic slices. Everything vmaps over
the env axis.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Sizes follow av_wan/config/default.py:152-186."""

    internal_map_size: int = 500  # cells @ map_resolution
    map_resolution: float = 0.1
    geometric_map_size: int = 200  # egocentric crop fed to the policy
    egomap_size: int = 31
    acoustic_map_size: int = 20
    acoustic_resolution: float = 0.5
    action_map_size: int = 9

    @property
    def cells_per_acoustic_cell(self) -> int:
        return int(round(self.acoustic_resolution / self.map_resolution))


@struct.dataclass
class MapperState:
    """Per-env map memory. The agent starts at the map center; positions are
    tracked in map cells relative to the episode start (the reference resets
    maps per episode, mapper.py reset)."""

    # TWO SEPARATE [M, M] planes, not one [..., 2] (or [2, ...]) array:
    # any stacked layout leaves a size-2 dim that XLA's scatter layout
    # assignment insists on making minormost, tiling it onto 128 lanes —
    # a 64x HBM padding blow-up per env (7.6 GB of HLO temp for 64 envs
    # at M=500, measured on both channel orders). Bare (M, M) planes tile
    # onto (8, 128) cleanly.
    geo_obstacle: jax.Array  # [M, M]
    geo_explored: jax.Array  # [M, M]
    acoustic_sum: jax.Array  # [A, A]
    acoustic_count: jax.Array  # [A, A]

    @property
    def geometric(self) -> jax.Array:
        """HWC [M, M, 2] view for consumers outside the hot loop."""
        return jnp.stack([self.geo_obstacle, self.geo_explored], axis=-1)

    @classmethod
    def zeros(cls, cfg: MapperConfig) -> "MapperState":
        m, a = cfg.internal_map_size, cfg.acoustic_map_size
        return cls(
            geo_obstacle=jnp.zeros((m, m), jnp.float32),
            geo_explored=jnp.zeros((m, m), jnp.float32),
            acoustic_sum=jnp.zeros((a, a), jnp.float32),
            acoustic_count=jnp.zeros((a, a), jnp.float32),
        )


def register_egomap(
    cfg: MapperConfig,
    state: MapperState,
    egomap: jax.Array,  # [E, E, 2] egocentric occupancy/explored, agent at
    # center bottom... (we use center) facing "up" (-row)
    cell_x: jax.Array,  # agent map-cell coords (cols), center-origin
    cell_z: jax.Array,  # rows
    rot_idx: jax.Array,  # heading, multiples of 90 deg
) -> MapperState:
    """Rotate the egocentric patch into the allocentric frame and OR it into
    the map (mapper.py update/register semantics, exact for 90-degree
    rotations — the only headings the discrete sim produces)."""
    e = egomap.shape[0]
    m = cfg.internal_map_size

    patch = jax.lax.switch(
        rot_idx % 4,
        [
            lambda p: p,
            lambda p: jnp.rot90(p, k=1),
            lambda p: jnp.rot90(p, k=2),
            lambda p: jnp.rot90(p, k=3),
        ],
        egomap,
    )
    row = (m // 2 + cell_z - e // 2).astype(jnp.int32)
    col = (m // 2 + cell_x - e // 2).astype(jnp.int32)
    row = jnp.clip(row, 0, m - e)
    col = jnp.clip(col, 0, m - e)

    def _merge(plane, ch):
        cur = jax.lax.dynamic_slice(plane, (row, col), (e, e))
        return jax.lax.dynamic_update_slice(
            plane, jnp.maximum(cur, patch[..., ch]), (row, col)
        )

    return state.replace(
        geo_obstacle=_merge(state.geo_obstacle, 0),
        geo_explored=_merge(state.geo_explored, 1),
    )


def register_intensity(
    cfg: MapperConfig,
    state: MapperState,
    intensity: jax.Array,  # scalar
    cell_x: jax.Array,
    cell_z: jax.Array,
    count: jax.Array | float = 1.0,
) -> MapperState:
    """Average-intensity acoustic map (ENCODING 'average_intensity',
    av_wan/config/default.py:178). `count=0` skips the sample (inactive
    envs in the masked inner loop) without a full-map select."""
    a = cfg.acoustic_map_size
    scale = cfg.cells_per_acoustic_cell
    ax = jnp.clip(a // 2 + cell_x // scale, 0, a - 1).astype(jnp.int32)
    az = jnp.clip(a // 2 + cell_z // scale, 0, a - 1).astype(jnp.int32)
    return state.replace(
        acoustic_sum=state.acoustic_sum.at[az, ax].add(intensity),
        acoustic_count=state.acoustic_count.at[az, ax].add(count),
    )


def egocentric_crops(
    cfg: MapperConfig,
    state: MapperState,
    cell_x: jax.Array,
    cell_z: jax.Array,
    rot_idx: jax.Array,
) -> dict[str, jax.Array]:
    """The policy's map observations: egocentric geometric crop ("gm"),
    averaged acoustic map ("am"), rotated so the agent faces up
    (mapper.py get_egocentric_* 233-305)."""
    m, g = cfg.internal_map_size, cfg.geometric_map_size
    # pad so the crop stays CENTERED on the agent at the map border (a
    # clamped slice silently shifts the crop beyond (m-g)/2 cells from the
    # episode start); zeros = unexplored, same as in-map unknown space
    p = (g + 1) // 2
    row = (p + m // 2 + cell_z - g // 2).astype(jnp.int32)
    col = (p + m // 2 + cell_x - g // 2).astype(jnp.int32)

    def _crop(plane):
        padded = jnp.pad(plane, ((p, p), (p, p)))
        return jax.lax.dynamic_slice(padded, (row, col), (g, g))

    # stack only the small [g, g] windows back to the policy's HWC layout
    crop = jnp.stack(
        [_crop(state.geo_obstacle), _crop(state.geo_explored)], axis=-1
    )
    crop = jax.lax.switch(
        (-rot_idx) % 4,
        [
            lambda p: p,
            lambda p: jnp.rot90(p, k=1),
            lambda p: jnp.rot90(p, k=2),
            lambda p: jnp.rot90(p, k=3),
        ],
        crop,
    )
    am = state.acoustic_sum / jnp.maximum(state.acoustic_count, 1.0)
    return {"gm": crop, "am": am[..., None]}
