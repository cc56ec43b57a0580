"""Terminal teleop demo (scripts/interactive_demo.py without pygame):
WASD-drive an agent through the AudioGoal env, printing a top-down ASCII
map and writing the episode video+audio at the end.

Usage: python -m soundspaces_tpu.tools.interactive_demo [--steps N]
Reads single-character commands (w=forward, a=left, d=right, s=stop,
q=quit) from stdin; non-interactive stdin replays a scripted sequence.
"""

from __future__ import annotations

import sys

import numpy as np


def ascii_map(graph, node: int, goal: int) -> str:
    pts = graph.points
    gx = np.round((pts[:, 0] - pts[:, 0].min()) / graph.grid_size).astype(int)
    gz = np.round((pts[:, 2] - pts[:, 2].min()) / graph.grid_size).astype(int)
    canvas = np.full((gz.max() + 1, gx.max() + 1), " ", dtype="<U1")
    canvas[gz, gx] = "."
    canvas[gz[goal], gx[goal]] = "G"
    canvas[gz[node], gx[node]] = "A"
    return "\n".join("".join(row) for row in canvas)


def main(argv=None):
    import argparse

    import jax

    from soundspaces_tpu.env import AudioNavEnv, DeviceScene, EnvConfig, make_episode_bank
    from soundspaces_tpu.scene import make_synthetic_assets
    from soundspaces_tpu.utils.video import images_to_video_with_audio, observations_to_image

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--out", type=str, default="/tmp/ss_demo")
    parser.add_argument("--force-cpu", action="store_true")
    args = parser.parse_args(argv)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    assets = make_synthetic_assets(num_nodes_hint=60, sampling_rate=8000,
                                   rir_max_len=2000, image_size=64)
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 16, seed=1, min_geodesic_hops=3)
    env = AudioNavEnv(
        EnvConfig(sensors=("spectrogram", "audiogoal", "depth")),
        scene, episodes, num_envs=1,
    )
    state, obs = env.reset(jax.random.PRNGKey(0))
    frames, audios = [], []
    key_to_action = {"s": 0, "w": 1, "a": 2, "d": 3}
    print(ascii_map(assets.graph, int(state.node[0]), int(state.goal_node[0])))
    print("w=forward a=left d=right s=stop q=quit")
    for t in range(args.steps):
        line = sys.stdin.readline()
        if not line:
            break
        c = line.strip()[:1].lower()
        if c == "q":
            break
        if c not in key_to_action:
            continue
        import jax.numpy as jnp

        state, obs, reward, done, info = env.step(
            state, jnp.asarray([key_to_action[c]], jnp.int32)
        )
        single = {k: np.asarray(v[0]) for k, v in obs.items()}
        frames.append(observations_to_image(single))
        audios.append(np.asarray(obs["audiogoal"][0]))
        print(ascii_map(assets.graph, int(state.node[0]), int(state.goal_node[0])))
        print(f"r={float(reward[0]):+.3f} done={bool(done[0])} "
              f"dtg={float(info['distance_to_goal'][0]):.2f}")
        if bool(done[0]):
            print("episode finished:",
                  {k: float(v[0]) for k, v in info.items()})
            break
    if frames:
        vp = images_to_video_with_audio(
            frames, audios, args.out, "interactive", scene.sampling_rate, fps=1
        )
        print("wrote", vp)


if __name__ == "__main__":
    main()
