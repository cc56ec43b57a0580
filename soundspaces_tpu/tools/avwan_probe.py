"""AV-WaN planner-vs-policy isolation probe (round-3 verdict, weak #3).

The realistic-world AV-WaN runs trail AV-Nav badly on SPL (0.32 vs 0.93 at
converged compute) with ~20-33 collisions/episode. Two candidate causes:

  (a) the mapper/planner stack itself loses path efficiency (agent-built
      map + bounded-BFS low-level navigation eats the SPL even for perfect
      waypoint choices), or
  (b) the stack is sound and the gap lives in the waypoint POLICY/recipe
      (exploration schedule, rollout horizon, reward scales).

This probe isolates them: it drives the full hierarchical env — the same
agent-built geometric map, the same `check_navigability` action mask, the
same per-step re-planned BFS descent the learned policy uses
(reference planner.py:88-168) — but replaces the learned waypoint head
with an ORACLE chooser: among mask-valid action-map cells, pick the one
minimizing (hops agent->target + hops target->goal, tie-broken by
remaining hops to goal), i.e. the farthest mask-admissible waypoint ON the
geodesic shortest path; STOP at the goal. Any SPL lost here is
attributable to the mapper/planner machinery; the remainder of the
learned-policy gap is the recipe.

Run (CPU is fine; audio is computed but ignored by the oracle):
    python -m soundspaces_tpu.tools.avwan_probe \
        --exp-config configs/realistic_avwan.yaml --episodes 100 \
        [--oracle-tables]   # bypass the agent-built map (true-table mask
                            # + next-hop low-level motion): upper bound
Prints one JSON line with the aggregated eval measures.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


# The oracle chooser lives in avwan/oracle.py now (the trainer consumes it
# as a DAgger teacher); these aliases keep the probe's public surface — and
# the guard test pinning probe-argmin == oracle choice — importable here.
from soundspaces_tpu.avwan.oracle import (  # noqa: E402
    cell_costs as _cell_costs,
    oracle_cost as _oracle_cost,
    oracle_waypoints,
)


def run_probe(cfg, episodes: int, num_envs: int, oracle_tables: bool):
    import dataclasses

    from soundspaces_tpu.builder import build_assets, build_waypoint_env

    cfg = dataclasses.replace(
        cfg, trainer=dataclasses.replace(cfg.trainer, num_envs=num_envs)
    )
    if oracle_tables:
        cfg = dataclasses.replace(
            cfg, avwan=dataclasses.replace(cfg.avwan, plan_from_map=False)
        )
    assets = build_assets(cfg)
    env = build_waypoint_env(cfg, assets, sequential=True)
    rng = jax.random.PRNGKey(cfg.data.seed)
    rng, reset_key = jax.random.split(rng)
    state, obs = env.reset(reset_key)

    @jax.jit
    def probe_step(scene, eps, tables, state):
        wps = oracle_waypoints(env, scene, tables, state)
        state, obs, _, done, info = env.step_pure(scene, eps, tables, state, wps)
        return state, obs, done, info

    totals: dict[str, float] = {}
    count = 0
    t0 = time.time()
    max_steps = env.cfg.max_episode_steps * (episodes // env.num_envs + 2)
    for _ in range(max_steps):
        state, obs, done, info = probe_step(
            env.base.scene, env.base.episodes, env.tables(), state
        )
        d = np.asarray(done)
        if d.any():
            fetched = jax.device_get(info)
            ep_valid = fetched.pop("ep_valid", None)
            for i in np.nonzero(d)[0]:
                if count >= episodes:
                    break
                if ep_valid is not None and ep_valid[i] == 0.0:
                    continue
                count += 1
                for k, v in fetched.items():
                    totals[k] = totals.get(k, 0.0) + float(v[i])
        if count >= episodes:
            break
    out = {k: v / max(count, 1) for k, v in sorted(totals.items())}
    out["episode_count"] = float(count)
    out["mode"] = "oracle_tables" if oracle_tables else "map_planner"
    out["probe_secs"] = round(time.time() - t0, 1)
    return out


def waypoint_costs(env, scene, tables, state):
    """Vectorized _cell_costs over the batch: per-env per-cell (valid,
    h_nt + h_tg, h_tg, h_ng) so a learned choice can be scored against
    the oracle's on identical terms."""
    a = env.wp.mapper.action_map_size
    idxs = jnp.arange(a * a)
    rows, cols = idxs // a, idxs % a
    return jax.vmap(
        lambda st: _cell_costs(env, scene, tables, st, rows, cols)
    )(state)


def run_policy_probe(cfg, ckpt: str, episodes: int, num_envs: int):
    """Instrument the LEARNED waypoint policy against the oracle on the
    identical states it visits (VERDICT-r4 #3: if the annealed retrain
    doesn't close the SPL gap, name the cause). Per prediction step:
      oracle_match     — chose exactly the oracle's argmin cell
      on_shortest_path — chosen cell keeps h_nt+h_tg == oracle minimum
                         (an on-path waypoint, maybe a nearer one)
      excess_hops      — (h_nt+h_tg)[chosen] - oracle minimum (detour size)
      progress_hops    — h_ng - h_tg[chosen] (goalward progress bought)
      oracle_progress  — the oracle's progress on the same state
      early_stop       — chose the STOP center cell while off-goal
    plus the standard episode measures."""
    import dataclasses

    from soundspaces_tpu import trainers  # noqa: F401 (registry)
    from soundspaces_tpu.builder import build_trainer

    cfg = dataclasses.replace(
        cfg, trainer=dataclasses.replace(cfg.trainer, num_envs=num_envs)
    )
    trainer = build_trainer(cfg)
    params, opt_state, carry0 = trainer.init_state(
        jax.random.PRNGKey(cfg.trainer.seed)
    )
    params, _, update = trainer.load_checkpoint(ckpt, params, opt_state)
    env = trainer.eval_env or trainer.env
    policy = trainer.policy
    a = env.wp.mapper.action_map_size
    center = a * a // 2

    rng = jax.random.PRNGKey(cfg.data.seed)
    rng, reset_key = jax.random.split(rng)
    state, obs = env.reset(reset_key)
    hidden = jnp.zeros((env.num_envs, trainer.ppo.hidden_size), jnp.float32)
    prev_done = jnp.zeros(env.num_envs, bool)

    @jax.jit
    def diag_step(scene, eps, tables, params, state, obs, hidden,
                  prev_done, key):
        masks = 1.0 - prev_done.astype(jnp.float32)
        amask = obs["action_map"].reshape(env.num_envs, -1)
        action, _, _, hidden = policy.apply(
            params, obs, hidden, masks, key, True, amask,
            method=policy.act,
        )
        act = action.reshape(-1).astype(jnp.int32)
        valid, cost, h_tg, h_ng = waypoint_costs(env, scene, tables, state)
        big = jnp.int32(2**30)
        vcost = jnp.where(valid, cost, big)
        omin = jnp.min(vcost, axis=1)
        # the oracle's argmin uses the TIE-BROKEN cost (max progress among
        # on-path cells) — argmin over the raw path cost would pick an
        # arbitrary tied cell (often the zero-progress STOP center) and
        # garbage both oracle_match and oracle_progress
        obest = jnp.argmin(
            _oracle_cost(valid, cost, h_tg), axis=1
        ).astype(jnp.int32)
        take = lambda m: jnp.take_along_axis(m, act[:, None], 1)[:, 0]
        c_cost, c_htg, c_valid = take(cost), take(h_tg), take(valid)
        live = (~prev_done) & (h_ng > 0) & (omin < big)
        diag = dict(
            oracle_match=(act == obest) & live,
            on_shortest_path=(c_cost == omin) & c_valid & live,
            excess_hops=jnp.where(
                live & c_valid, (c_cost - omin).astype(jnp.float32), 0.0
            ),
            progress_hops=jnp.where(
                live & c_valid, (h_ng - c_htg).astype(jnp.float32), 0.0
            ),
            oracle_progress=jnp.where(
                live,
                (h_ng
                 - jnp.take_along_axis(h_tg, obest[:, None], 1)[:, 0]
                 ).astype(jnp.float32),
                0.0,
            ),
            early_stop=(act == center) & live,
            invalid_choice=(~c_valid) & live,
            live=live,
        )
        state, obs, _, done, info = env.step_pure(
            scene, eps, tables, state, action
        )
        return state, obs, hidden, done, info, diag

    totals: dict[str, float] = {}
    dsum: dict[str, float] = {}
    nlive = 0
    count = 0
    t0 = time.time()
    max_steps = env.cfg.max_episode_steps * (episodes // env.num_envs + 2)
    for _ in range(max_steps):
        rng, key = jax.random.split(rng)
        state, obs, hidden, done, info, diag = diag_step(
            env.base.scene, env.base.episodes, env.tables(), params,
            state, obs, hidden, prev_done, key,
        )
        prev_done = done
        dg = jax.device_get(diag)
        live = dg.pop("live")
        nlive += int(live.sum())
        for k, v in dg.items():
            dsum[k] = dsum.get(k, 0.0) + float(
                np.asarray(v, np.float64).sum()
            )
        d = np.asarray(done)
        if d.any():
            fetched = jax.device_get(info)
            ep_valid = fetched.pop("ep_valid", None)
            for i in np.nonzero(d)[0]:
                if count >= episodes:
                    break
                if ep_valid is not None and ep_valid[i] == 0.0:
                    continue
                count += 1
                for k, v in fetched.items():
                    totals[k] = totals.get(k, 0.0) + float(v[i])
        if count >= episodes:
            break
    out = {k: v / max(count, 1) for k, v in sorted(totals.items())}
    out.update(
        {f"wp_{k}": v / max(nlive, 1) for k, v in sorted(dsum.items())}
    )
    out["wp_prediction_steps"] = float(nlive)
    out["episode_count"] = float(count)
    out["mode"] = "learned_policy"
    out["checkpoint"] = ckpt
    out["update"] = float(update)
    out["probe_secs"] = round(time.time() - t0, 1)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-config", default="configs/realistic_avwan.yaml")
    ap.add_argument("--episodes", type=int, default=100)
    ap.add_argument("--num-envs", type=int, default=10)
    ap.add_argument("--oracle-tables", action="store_true")
    ap.add_argument(
        "--policy-checkpoint", default=None,
        help="instrument the LEARNED waypoint policy from this checkpoint "
        "against the oracle on identical states (instead of the oracle "
        "drive)",
    )
    ap.add_argument(
        "--force-cpu",
        action=argparse.BooleanOptionalAction,
        default=True,
        help="run on CPU (default); --no-force-cpu uses the chip",
    )
    args = ap.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from soundspaces_tpu.config import get_config

    cfg = get_config(args.exp_config, [])
    if args.policy_checkpoint:
        ckpt = args.policy_checkpoint
        if ckpt.startswith("latest:"):
            from soundspaces_tpu.train.trainer import latest_checkpoint

            ckpt = latest_checkpoint(ckpt[len("latest:"):])
            assert ckpt, "no checkpoints in the given folder"
        out = run_policy_probe(cfg, ckpt, args.episodes, args.num_envs)
    else:
        out = run_probe(cfg, args.episodes, args.num_envs, args.oracle_tables)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
