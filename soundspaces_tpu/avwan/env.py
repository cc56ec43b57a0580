"""Hierarchical waypoint navigation env (the MapNavEnv + Planner pair,
ss_baselines/av_wan/mapnav_env.py:21-166, models/planner.py:19-209) as one
jitted program.

One policy step = choose an action-map cell (81-way; center = STOP,
mapnav_env.py:60), then an inner `lax.scan` of up to PREDICTION_INTERVAL
low-level steps walks toward the waypoint, accumulating reward and updating
the geometric/acoustic maps, breaking (by masking) on waypoint-reached,
cant-reach or episode-done.

Partial observability (the reference's actual setting): with
`plan_from_map` (default) the egomap is the depth-camera projection
(ops/egomap.py), the waypoint mask comes from a bounded BFS over the
agent-BUILT map (avwan/planner.py — planner.check_navigability,
planner.py:142-168), low-level actions greedily descend a per-step
re-planned BFS distance field on that map (planner.plan, 88-130), collisions
write obstacle evidence into the map (the reference's graph-edge removal,
151-162), and unreachable waypoints raise `cant_reach_waypoint`
(mapnav_env.py:56-106). Ground-truth table planning (plan_from_map=False)
remains as the test oracle."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from soundspaces_tpu.avwan.maps import (
    MapperConfig,
    MapperState,
    egocentric_crops,
    register_intensity,
)
from soundspaces_tpu.env.audionav import AudioNavEnv
from soundspaces_tpu.env.structs import DeviceScene, EnvConfig, EnvState, EpisodeBank
from soundspaces_tpu.scene.graph import (
    MOVE_FORWARD,
    STOP,
    TURN_LEFT,
    TURN_RIGHT,
    UNREACHABLE,
    SceneGraph,
)


@dataclasses.dataclass(frozen=True)
class WaypointConfig:
    prediction_interval: int = 10  # av_wan/config/default.py:54
    mapper: MapperConfig = dataclasses.field(default_factory=MapperConfig)
    # True (default): masks + low-level plans derive from the agent-built
    # map via bounded BFS and egomaps come from depth projection — the
    # reference's partially-observed setting. False: ground-truth
    # next-hop/navigability tables (test oracle).
    plan_from_map: bool = True
    plan_window: int = 17  # planning window, 0.5 m cells (odd)
    egomap_depth_hw: int = 64  # depth-render resolution for the projection
    # Discrete poses are (node, rot) — the depth render + projection is an
    # exact function of them, so precompute the egomap once per pose into a
    # [N, 4, E, E, 2] bank and gather per step (5x fewer FLOPs in the inner
    # low-level loop). False keeps the live render (parity tests).
    precompute_egomaps: bool = True
    # The acoustic-map intensity (avwan_sensors.py:91-100) is an exact
    # function of (azimuth, node, goal, sound, second) — precompute it into
    # a [4, N, G, S, SEC] table at setup (the reference's own observation
    # cache keyed (source, receiver, angle), simulator.py:678-688) so the
    # inner low-level loop does no audio convolution at all. Auto-disabled
    # when distractor sounds mix into the audio.
    precompute_intensity: bool = True

    @property
    def num_waypoints(self) -> int:
        return self.mapper.action_map_size ** 2


@struct.dataclass
class WaypointTables:
    """Static per-scene lookup tables for waypoint planning."""

    node_at_cell: jax.Array  # [Cz, Cx] nearest node per 0.5 m cell, -1 empty
    occupancy: jax.Array  # [Gz, Gx] 1.0 where walkable (0.1 m cells)
    origin: jax.Array  # [2] world (x, z) of cell (0, 0)
    node_cell_x: jax.Array  # [N] 0.5 m cell coords per node
    node_cell_z: jax.Array
    # optional [N, 4, E, E, 2] precomputed agent-frame egomap per pose
    egomap_bank: jax.Array | None = None
    # optional [4, N, G, S, SEC] acoustic-map intensity per pose/source
    intensity_bank: jax.Array | None = None


def build_waypoint_tables(
    graph: SceneGraph, mapper_cfg: MapperConfig
) -> WaypointTables:
    pts = graph.points
    res, wres = mapper_cfg.map_resolution, 0.5
    x0, z0 = float(pts[:, 0].min()), float(pts[:, 2].min())
    cx = np.round((pts[:, 0] - x0) / wres).astype(np.int32)
    cz = np.round((pts[:, 2] - z0) / wres).astype(np.int32)
    node_at = np.full((cz.max() + 1, cx.max() + 1), -1, np.int32)
    node_at[cz, cx] = np.arange(graph.num_nodes, dtype=np.int32)

    gx = np.round((pts[:, 0] - x0) / res).astype(np.int32)
    gz = np.round((pts[:, 2] - z0) / res).astype(np.int32)
    half = int(round(wres / res)) // 2
    occ = np.zeros((gz.max() + 2 * half + 1, gx.max() + 2 * half + 1), np.float32)
    for dz in range(-half, half + 1):
        for dx in range(-half, half + 1):
            occ[gz + half + dz, gx + half + dx] = 1.0
    # small scenes: the egomap crop dynamic-slices an [e, e] window, so the
    # grid must be at least egomap_size on each axis (pad = non-walkable)
    e = mapper_cfg.egomap_size
    pz, px = max(0, e - occ.shape[0]), max(0, e - occ.shape[1])
    if pz or px:
        occ = np.pad(occ, ((0, pz), (0, px)))
    return WaypointTables(
        node_at_cell=jnp.asarray(node_at),
        occupancy=jnp.asarray(occ),
        origin=jnp.asarray([x0, z0], jnp.float32),
        node_cell_x=jnp.asarray(cx),
        node_cell_z=jnp.asarray(cz),
    )


def precompute_egomap_bank(
    tables: WaypointTables, wp_cfg: WaypointConfig, chunk: int = 64
) -> WaypointTables:
    """Render the depth->pointcloud egomap once per discrete pose
    (node x 4 rotations) into a [N, 4, E, E, 2] bank. Exact: the per-step
    sensor becomes a gather of the same values the live render produces
    (test_egomap.py checks the equivalence)."""
    from soundspaces_tpu.ops.egomap import egomap_at_pose

    m = wp_cfg.mapper
    res = m.map_resolution
    scale = int(round(0.5 / res))
    n = int(tables.node_cell_x.shape[0])

    def render(tb, node, rot):
        gz = tb.node_cell_z[node] * scale + scale // 2
        gx = tb.node_cell_x[node] * scale + scale // 2
        return egomap_at_pose(
            tb.occupancy,
            gx.astype(jnp.float32) * res, gz.astype(jnp.float32) * res,
            jnp.deg2rad(270.0 - 90.0 * rot.astype(jnp.float32)),
            map_size=m.egomap_size, resolution=res,
            depth_hw=wp_cfg.egomap_depth_hw,
        )

    def chunk_fn(tb, nodes):
        rots = jnp.arange(4, dtype=jnp.int32)
        return jax.vmap(
            lambda nd: jax.vmap(lambda r: render(tb, nd, r))(rots)
        )(nodes)

    pad = (-n) % chunk
    nodes = jnp.arange(n + pad, dtype=jnp.int32) % n
    # tables passed as a jit ARG: a closure-captured device array becomes an
    # IR constant, whose materialization D2H-fetches it (tunnel-fatal)
    bank = jax.jit(
        lambda tb, ns: jax.lax.map(
            lambda c: chunk_fn(tb, c), ns.reshape(-1, chunk)
        )
    )(tables, nodes)
    e = m.egomap_size
    bank = bank.reshape(-1, 4, e, e, 2)[:n]
    return tables.replace(egomap_bank=bank)


def precompute_intensity_bank(
    base_env, scene, tables: WaypointTables, max_convs_per_chunk: int = 256
) -> WaypointTables:
    """Exact [4, N, G, S, SEC] table of `_intensity(audiogoal)` per
    (azimuth, receiver node, goal slot, sound, source second) — the same
    values the live convolution path produces (test-checked). The reference
    itself caches audio observations per (source, receiver, angle)
    (simulator.py:678-688); the intensity scalar adds only the small
    (sound, second) axes, so the whole table is a few MB even at MP3D
    scale. Only valid without distractor mixing (the caller gates on
    `has_distractor_sound`)."""
    n = int(scene.rir.shape[1])
    g = int(scene.rir.shape[2])
    s = int(scene.seg_block_fft.shape[0])
    sec = int(scene.seg_block_fft.shape[1])

    def one(sc, flat):
        # decode the flat combo index — a SINGLE flat vmap keeps the batch
        # as one leading axis (a nested az x node x goal x sound x sec vmap
        # lowers to rank-8 temps whose tiny minor dims pad 85x -> 21 GB)
        si = flat % sec
        sd = (flat // sec) % s
        gl = (flat // (sec * s)) % g
        nd = (flat // (sec * s * g)) % n
        az = flat // (sec * s * g * n)
        audio = base_env._goal_audio(sc, az, nd, gl, sd, si)
        return _intensity(audio)

    total = 4 * n * g * s * sec
    chunk = min(total, max(1, max_convs_per_chunk))
    pad = (-total) % chunk
    flat = jnp.arange(total + pad, dtype=jnp.int32) % total
    # scene passed as a jit ARG: a closure-captured RIR bank becomes an IR
    # constant, whose materialization D2H-fetches GBs (tunnel-fatal)
    bank = jax.jit(
        lambda sc, ix: jax.lax.map(
            lambda c: jax.vmap(lambda f: one(sc, f))(c),
            ix.reshape(-1, chunk),
        )
    )(scene, flat)
    bank = bank.reshape(-1)[:total].reshape(4, n, g, s, sec)
    return tables.replace(intensity_bank=bank)


@struct.dataclass
class WaypointState:
    base: EnvState
    mapper: MapperState


class WaypointNavEnv:
    """Batched hierarchical env. Observations: spectrogram, gm, am,
    action_map (navigability mask, also returned separately for the masked
    policy head), intensity, collision."""

    def __init__(
        self,
        env_cfg: EnvConfig,
        wp_cfg: WaypointConfig,
        scene: DeviceScene,
        episodes: EpisodeBank,
        tables: WaypointTables,
        num_envs: int,
    ):
        base_sensors = ("audiogoal",)
        self.base = AudioNavEnv(
            dataclasses.replace(env_cfg, sensors=base_sensors),
            scene,
            episodes,
            num_envs,
        )
        self.cfg = env_cfg
        self.wp = wp_cfg
        self.num_envs = num_envs
        if (
            wp_cfg.plan_from_map
            and wp_cfg.precompute_egomaps
            and tables.egomap_bank is None
        ):
            tables = precompute_egomap_bank(tables, wp_cfg)
        if (
            wp_cfg.precompute_intensity
            and not env_cfg.has_distractor_sound
            and tables.intensity_bank is None
        ):
            tables = precompute_intensity_bank(self.base, scene, tables)
        self._tables = tables
        self._reset_jit = jax.jit(self.reset_pure)
        self._step_jit = jax.jit(self.step_pure)

    # ------------------------------------------------------------- public API
    def reset(self, rng):
        keys = jax.random.split(rng, self.num_envs)
        env_ids = jnp.arange(self.num_envs, dtype=jnp.int32)
        return self._reset_jit(
            self.base.scene, self.base.episodes, self.tables(), keys, env_ids
        )

    def step(self, state, waypoints):
        return self._step_jit(
            self.base.scene, self.base.episodes, self.tables(), state, waypoints
        )

    def tables(self):
        if not hasattr(self, "_tables"):
            raise RuntimeError("use from_assets/with_tables to attach tables")
        return self._tables

    def attach_tables(self, tables: WaypointTables):
        self._tables = tables
        return self

    # ------------------------------------------------------------------ pure
    def reset_pure(self, scene, episodes, tables, keys, env_ids):
        base_state, _ = jax.vmap(
            self.base._reset_one, in_axes=(None, None, 0, 0)
        )(scene, episodes, keys, env_ids)
        mapper = jax.vmap(lambda _: MapperState.zeros(self.wp.mapper))(env_ids)
        state = WaypointState(base=base_state, mapper=mapper)
        state = jax.vmap(
            self._update_maps, in_axes=(None, None, 0)
        )(scene, tables, state)
        obs = jax.vmap(self._observe, in_axes=(None, None, 0))(
            scene, tables, state
        )
        return state, obs

    def step_pure(self, scene, episodes, tables, state, waypoints):
        return jax.vmap(
            self._step_one, in_axes=(None, None, None, 0, 0)
        )(scene, episodes, tables, state, waypoints)

    # ------------------------------------------------------------ single env
    def _agent_cells(self, scene, tables, base: EnvState):
        return (
            tables.node_cell_x[base.node] - tables.node_cell_x[base.start_node],
            tables.node_cell_z[base.node] - tables.node_cell_z[base.start_node],
        )

    def _update_maps(
        self, scene, tables, state: WaypointState, active=None
    ) -> WaypointState:
        """Register the pose's egomap, the agent footprint, and collision
        evidence into the allocentric map with ONE windowed read-modify-write
        (separate full-map updates each cost an HBM pass over the [M, M, 2]
        map per inner low-level step). `active=False` keeps the state
        unchanged — the select happens on the small window, never the map."""
        m = self.wp.mapper
        base = state.base
        e = m.egomap_size
        scale = int(round(0.5 / m.map_resolution))
        gz = tables.node_cell_z[base.node] * scale + scale // 2
        gx = tables.node_cell_x[base.node] * scale + scale // 2
        cell_x, cell_z = self._agent_cells(scene, tables, base)
        if active is None:
            active = jnp.bool_(True)
        if self.wp.plan_from_map:
            # the reference's actual sensor path: render depth at the pose
            # and project it through the camera intrinsics (nav.py:235-405);
            # on discrete poses the render is precomputed per (node, rot)
            if tables.egomap_bank is not None:
                ego = tables.egomap_bank[base.node, base.rot_idx % 4]
            else:
                from soundspaces_tpu.ops.egomap import egomap_at_pose

                res = m.map_resolution
                ego = egomap_at_pose(
                    tables.occupancy,
                    gx.astype(jnp.float32) * res, gz.astype(jnp.float32) * res,
                    jnp.deg2rad(
                        270.0 - 90.0 * base.rot_idx.astype(jnp.float32)
                    ),
                    map_size=e, resolution=res,
                    depth_hw=self.wp.egomap_depth_hw,
                )
            rot = base.rot_idx
        else:
            # test oracle: crop of the true occupancy grid around the agent
            occ = jax.lax.dynamic_slice(
                tables.occupancy,
                (
                    jnp.clip(gz - e // 2, 0, tables.occupancy.shape[0] - e),
                    jnp.clip(gx - e // 2, 0, tables.occupancy.shape[1] - e),
                ),
                (e, e),
            )
            ego = jnp.stack([1.0 - occ, jnp.ones_like(occ)], axis=-1)
            # world->ego rotation is undone at registration; pass allocentric
            rot = jnp.int32(0)
        # --- one windowed update of the geometric map
        patch = jax.lax.switch(
            rot % 4,
            [
                lambda p: p,
                lambda p: jnp.rot90(p, k=1),
                lambda p: jnp.rot90(p, k=2),
                lambda p: jnp.rot90(p, k=3),
            ],
            ego,
        )
        mm = m.internal_map_size
        gxc, gzc = cell_x * scale, cell_z * scale  # agent, 0.1 m map cells
        row = jnp.clip(mm // 2 + gzc - e // 2, 0, mm - e).astype(jnp.int32)
        col = jnp.clip(mm // 2 + gxc - e // 2, 0, mm - e).astype(jnp.int32)
        # per-plane windowed register (two [M, M] planes — MapperState
        # layout note); the footprint stamp marks the agent's own 3x3 as
        # known free space (the reference planner keeps the agent position
        # in its graph, planner.py:170-209)
        vr = jnp.clip(mm // 2 + gzc - 1 - row, 0, e - 3)
        vc = jnp.clip(mm // 2 + gxc - 1 - col, 0, e - 3)

        def _register(plane, ch, foot):
            cur = jax.lax.dynamic_slice(plane, (row, col), (e, e))
            new = jnp.maximum(cur, patch[..., ch])  # register semantics
            if self.wp.plan_from_map:
                vis = jnp.full((3, 3), foot, jnp.float32)
                new = jax.lax.dynamic_update_slice(new, vis, (vr, vc))
            new = jnp.where(active, new, cur)
            return jax.lax.dynamic_update_slice(plane, new, (row, col))

        mapper = state.mapper.replace(
            geo_obstacle=_register(state.mapper.geo_obstacle, 0, 0.0),
            geo_explored=_register(state.mapper.geo_explored, 1, 1.0),
        )
        if self.wp.plan_from_map:
            # collision evidence: the planning cell ahead is an obstacle —
            # the reference's collision-driven graph edit (planner.py:151-162).
            # Written full-map (it can fall outside the ego window at the map
            # border); the select is on the 3x3 patch, not the map.
            mapper = _mark_blocked_ahead(
                m, mapper, gxc, gzc, base.rot_idx, scale,
                enabled=active & base.collided,
            )
        # acoustic map intensity (avwan_sensors.py:91-100)
        if tables.intensity_bank is not None:
            az = (4 - base.rot_idx) % 4
            val = tables.intensity_bank[
                az, base.node, base.goal_slot, base.sound_id, base.audio_index
            ]
            # silence once past the sound's duration (simulator.py:610-612)
            audible = base.step_count <= base.duration_sec
            intensity = jnp.where(audible, val, 0.0)
        else:
            intensity = _intensity(self.base._audiogoal(scene, base))
        mapper = register_intensity(
            m, mapper, jnp.where(active, intensity, 0.0), cell_x, cell_z,
            count=jnp.where(active, 1.0, 0.0),
        )
        return state.replace(mapper=mapper)

    def _action_cell_offsets(self, base: EnvState):
        """Allocentric (dx, dz) 0.5 m-cell offsets of every action-map cell
        (ego frame: agent faces up, +col right — planner.py:132-141)."""
        a = self.wp.mapper.action_map_size
        idxs = jnp.arange(a * a)
        rows, cols = idxs // a, idxs % a
        rel_f = -(rows - a // 2)
        rel_r = cols - a // 2
        th = jnp.deg2rad(270.0 - 90.0 * base.rot_idx.astype(jnp.float32))
        fwd = jnp.stack([jnp.cos(th), jnp.sin(th)])
        right = jnp.stack([jnp.cos(th + jnp.pi / 2), jnp.sin(th + jnp.pi / 2)])
        dx = jnp.round(rel_f * fwd[0] + rel_r * right[0]).astype(jnp.int32)
        dz = jnp.round(rel_f * fwd[1] + rel_r * right[1]).astype(jnp.int32)
        return dx, dz

    def _free_window(self, tables, state: WaypointState):
        """Planning-cell free mask around the agent from the agent-built
        map (avwan/planner.py)."""
        from soundspaces_tpu.avwan.planner import coarse_free_window

        base = state.base
        cell_x = tables.node_cell_x[base.node] - tables.node_cell_x[base.start_node]
        cell_z = tables.node_cell_z[base.node] - tables.node_cell_z[base.start_node]
        scale = int(round(0.5 / self.wp.mapper.map_resolution))
        return coarse_free_window(
            state.mapper.geo_obstacle, state.mapper.geo_explored,
            cell_x, cell_z,
            window=self.wp.plan_window, scale=scale,
        )

    def _action_mask(self, scene, tables, state: WaypointState) -> jax.Array:
        """Navigable waypoints. plan_from_map: BFS over the agent-built map
        (check_navigability, planner.py:142-168) — the mask TIGHTENS to what
        the agent has actually mapped. Oracle mode: true-table reachability.
        The center (STOP) is always allowed."""
        base = state.base
        a = self.wp.mapper.action_map_size
        idxs = jnp.arange(a * a)
        rows, cols = idxs // a, idxs % a
        if self.wp.plan_from_map:
            from soundspaces_tpu.avwan.planner import reachable_from_center

            free = self._free_window(tables, state)
            reach = reachable_from_center(free)
            dx, dz = self._action_cell_offsets(base)
            w = self.wp.plan_window
            c = w // 2
            rr = jnp.clip(c + dz, 0, w - 1)
            cc = jnp.clip(c + dx, 0, w - 1)
            inb = (jnp.abs(dz) <= c) & (jnp.abs(dx) <= c)
            mask = (reach[rr, cc] > 0.5) & inb
            mask = mask.astype(jnp.float32)
        else:
            tnode = self._waypoint_node(scene, tables, base, rows, cols)
            reachable = (tnode >= 0) & (
                scene.geodesic_hops[base.node, jnp.maximum(tnode, 0)]
                < UNREACHABLE
            )
            mask = reachable.astype(jnp.float32)
        return mask.at[a * a // 2].set(1.0)

    def _waypoint_node(self, scene, tables, base: EnvState, rows, cols):
        """Action-map cell -> target node (planner.get_map_coordinates,
        planner.py:132-141). Ego frame: agent faces up (-row), +col right."""
        a = self.wp.mapper.action_map_size
        rel_f = -(rows - a // 2)  # forward steps (0.5 m cells)
        rel_r = cols - a // 2  # rightward steps
        # orientation theta = (270 - 90*rot) deg; forward = (cos, sin) in (x, z)
        th = jnp.deg2rad(270.0 - 90.0 * base.rot_idx.astype(jnp.float32))
        fwd = jnp.stack([jnp.cos(th), jnp.sin(th)])
        right = jnp.stack([jnp.cos(th + jnp.pi / 2), jnp.sin(th + jnp.pi / 2)])
        dx = jnp.round(rel_f * fwd[0] + rel_r * right[0]).astype(jnp.int32)
        dz = jnp.round(rel_f * fwd[1] + rel_r * right[1]).astype(jnp.int32)
        cz = tables.node_cell_z[base.node] + dz
        cx = tables.node_cell_x[base.node] + dx
        h, w = tables.node_at_cell.shape
        inb = (cz >= 0) & (cz < h) & (cx >= 0) & (cx < w)
        node = tables.node_at_cell[jnp.clip(cz, 0, h - 1), jnp.clip(cx, 0, w - 1)]
        return jnp.where(inb, node, -1)

    def _low_level_action(self, scene, base: EnvState, target_node):
        """Greedy next action toward target via the next-hop table
        (planner.plan, planner.py:88-130)."""
        nxt = scene.oracle_next[base.node, target_node]
        facing = scene.forward_neighbor[base.node]
        target_rot = jnp.argmax(facing == nxt).astype(jnp.int32)
        has_dir = jnp.any(facing == nxt)
        delta = (target_rot - base.rot_idx) % 4
        turn = jnp.where(delta <= 2, TURN_LEFT, TURN_RIGHT)
        act = jnp.where(delta == 0, MOVE_FORWARD, turn)
        return jnp.where((nxt < 0) | ~has_dir, TURN_LEFT, act)

    def _map_plan_action(self, tables, st: WaypointState, target_cell_xz):
        """Greedy descent on a BFS distance field over the agent-built map,
        RE-PLANNED from the current map every low-level step (the reference
        planner re-plans per step with the edited graph, planner.py:88-130).
        Returns (action, stuck) — stuck means the map offers no path."""
        from soundspaces_tpu.avwan.planner import (
            INF,
            descend_step,
            distance_field,
        )

        base = st.base
        free = self._free_window(tables, st)
        w = self.wp.plan_window
        c = w // 2
        # target in the window (centered at the agent's current cell)
        tdx = target_cell_xz[0] - tables.node_cell_x[base.node]
        tdz = target_cell_xz[1] - tables.node_cell_z[base.node]
        inb = (jnp.abs(tdx) <= c) & (jnp.abs(tdz) <= c)
        trc = jnp.stack(
            [jnp.clip(c + tdz, 0, w - 1), jnp.clip(c + tdx, 0, w - 1)]
        )
        dist = distance_field(free, trc)
        dir_idx, improves = descend_step(dist, jnp.array([c, c]))
        # dir (N,S,W,E) = world (-z, +z, -x, +x) -> rotation whose FORWARD
        # faces it (orientation 270-90r: r=0 -> -z, 1 -> -x, 2 -> +z, 3 -> +x)
        rot_for_dir = jnp.asarray([0, 2, 1, 3], jnp.int32)
        target_rot = rot_for_dir[dir_idx]
        delta = (target_rot - base.rot_idx) % 4
        turn = jnp.where(delta <= 2, TURN_LEFT, TURN_RIGHT)
        act = jnp.where(delta == 0, MOVE_FORWARD, turn)
        stuck = ~improves | ~inb
        return act, stuck

    def _step_one(self, scene, episodes, tables, state: WaypointState, waypoint):
        wp = self.wp
        a = wp.mapper.action_map_size
        is_stop = waypoint == (a * a) // 2
        target = self._waypoint_node(
            scene, tables, state.base, waypoint // a, waypoint % a
        )
        target = jnp.where(target < 0, state.base.node, target)
        # target's absolute 0.5 m-cell coords (map planning addresses cells)
        dx, dz = self._action_cell_offsets(state.base)
        wsel = waypoint
        target_cell_xz = jnp.stack(
            [
                tables.node_cell_x[state.base.node] + dx[wsel],
                tables.node_cell_z[state.base.node] + dz[wsel],
            ]
        )

        def at_cell(base):
            # "arrived" = the agent occupies the chosen MAP CELL (the
            # reference compares map positions, mapnav_env.py:78-84); the
            # node-id comparison would silently treat un-noded (wall) cells
            # as reached via the coerced fallback target
            return (tables.node_cell_x[base.node] == target_cell_xz[0]) & (
                tables.node_cell_z[base.node] == target_cell_xz[1]
            )

        def inner(carry, _):
            st, total_r, done, reached, cant = carry
            if wp.plan_from_map:
                plan_act, stuck = self._map_plan_action(
                    tables, st, target_cell_xz
                )
                act = jnp.where(is_stop, STOP, plan_act)
                at_target = at_cell(st.base)
            else:
                act = jnp.where(
                    is_stop, STOP,
                    self._low_level_action(scene, st.base, target),
                )
                stuck = jnp.bool_(False)
                at_target = st.base.node == target
            newly_cant = stuck & ~at_target & ~is_stop
            active = ~(done | reached | cant | newly_cant)
            base2, _, r, d, info = self.base._step_one(
                scene, episodes, st.base, act
            )
            base2 = jax.tree.map(
                lambda new, old: jnp.where(active, new, old), base2, st.base
            )
            # active-masking happens inside _update_maps on the ego window —
            # a whole-tree where here would add two full-map HBM passes per
            # inner step
            st2 = self._update_maps(
                scene, tables, st.replace(base=base2), active=active
            )
            total_r = total_r + jnp.where(active, r, 0.0)
            newly_done = active & d
            done = done | newly_done
            arrived = at_cell(base2) if wp.plan_from_map else (
                base2.node == target
            )
            reached = reached | (active & arrived & ~d)
            cant = cant | newly_cant
            info = jax.tree.map(lambda x: x, info)
            return (st2, total_r, done, reached, cant), (info, newly_done)

        init = (
            state,
            jnp.float32(0.0),
            jnp.bool_(False),
            jnp.bool_(False),
            jnp.bool_(False),
        )
        (state, reward, done, reached, cant), (infos, newly_done) = jax.lax.scan(
            inner, init, None, length=wp.prediction_interval
        )
        # an unreachable waypoint still costs one step of slack (the
        # reference's inner loop breaks but the env time advanced,
        # mapnav_env.py:56-106)
        reward = reward + jnp.where(cant, self.cfg.slack_reward, 0.0)
        # the info at the step where the episode finished (or the last one)
        last_idx = jnp.where(
            jnp.any(newly_done), jnp.argmax(newly_done), wp.prediction_interval - 1
        )
        info = jax.tree.map(lambda x: x[last_idx], infos)
        info = info | {
            "reaching_waypoint": (reached | done).astype(jnp.float32),
            "cant_reach_waypoint": cant.astype(jnp.float32),
        }
        # auto-reset: the base env already reset itself on done; rebuild maps
        fresh_mapper = MapperState.zeros(wp.mapper)
        mapper = jax.tree.map(
            lambda f, c: jnp.where(done, f, c), fresh_mapper, state.mapper
        )
        state = state.replace(mapper=mapper)
        # NOT lax.cond: under the outer env vmap a batched-predicate cond
        # broadcasts every closed-over operand — including the full RIR
        # bank (-> num_envs x bank HBM, 63 GB at 16 envs on the realistic
        # world). Compute unconditionally; active=done selects on the window.
        state = self._update_maps(scene, tables, state, active=done)
        obs = self._observe(scene, tables, state)
        return state, obs, reward, done, info

    # -------------------------------------------------------------- sensors
    def _observe(self, scene, tables, state: WaypointState):
        base = state.base
        cell_x, cell_z = self._agent_cells(scene, tables, base)
        scale = int(round(0.5 / self.wp.mapper.map_resolution))
        crops = egocentric_crops(
            self.wp.mapper, state.mapper, cell_x * scale, cell_z * scale,
            base.rot_idx,
        )
        audio = self.base._audiogoal(scene, base)
        from soundspaces_tpu.ops.stft import spectrogram

        mask = self._action_mask(scene, tables, state)
        return {
            "spectrogram": spectrogram(audio),
            "gm": crops["gm"],
            "am": crops["am"],
            "action_map": mask.reshape(
                self.wp.mapper.action_map_size, self.wp.mapper.action_map_size, 1
            ),
            "intensity": _intensity(audio)[None],
            "collision": base.collided.astype(jnp.float32)[None],
        }


def _mark_blocked_ahead(
    cfg, mapper: MapperState, gx_cells, gz_cells, rot_idx, scale, enabled=True
) -> MapperState:
    """Collision evidence: stamp the planning cell directly ahead as an
    explored obstacle (the reference removes that graph node on collision,
    planner.py:151-162; it returns on map reset, 44-53). `enabled` selects
    on the 3x3 patch — a lax.cond would become a full-map select under
    vmap."""
    th = jnp.deg2rad(270.0 - 90.0 * rot_idx.astype(jnp.float32))
    dx = jnp.round(jnp.cos(th)).astype(jnp.int32) * scale
    dz = jnp.round(jnp.sin(th)).astype(jnp.int32) * scale
    m = cfg.internal_map_size
    row = jnp.clip(m // 2 + gz_cells + dz - 1, 0, m - 3).astype(jnp.int32)
    col = jnp.clip(m // 2 + gx_cells + dx - 1, 0, m - 3).astype(jnp.int32)
    def _stamp(plane):
        patch = jax.lax.dynamic_slice(plane, (row, col), (3, 3))
        patch = jnp.where(enabled, jnp.ones_like(patch), patch)
        return jax.lax.dynamic_update_slice(plane, patch, (row, col))

    return mapper.replace(
        geo_obstacle=_stamp(mapper.geo_obstacle),
        geo_explored=_stamp(mapper.geo_explored),
    )


def _intensity(audiogoal: jax.Array) -> jax.Array:
    """RMS of the first 150 samples after the direct-sound onset
    (avwan_sensors.py:91-100)."""
    num_frame = 150
    thresh = 0.1 * audiogoal.max()
    onset = jnp.min(jnp.argmax(audiogoal > thresh, axis=1))
    window = jax.lax.dynamic_slice_in_dim(audiogoal, onset, num_frame, axis=1)
    return jnp.mean(window**2)
