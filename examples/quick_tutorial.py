"""SS2.0 quick-tutorial walkthrough — the script equivalent of the
reference's examples/soundspaces2_quick_tutorial.ipynb:

1. render an impulse response at a pose (native ray tracer when the
   toolchain is available, else the on-device parametric synthesizer);
2. physical sanity checks: source visibility + ray efficiency
   (audio_sensor.sourceIsVisible() / getRayEfficiency());
3. convolve a source waveform with the IR (the audiogoal observation);
4. measure RT60 from the rendered IR (pyroomacoustics' measure_rt60 role).

    python examples/quick_tutorial.py
"""

import os

import numpy as np

import jax

if os.environ.get("FORCE_CPU"):
    # the axon TPU plugin ignores JAX_PLATFORMS; this is the
    # supported way to pin examples to host CPU
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from soundspaces_tpu.env import DeviceScene, make_episode_bank
from soundspaces_tpu.env.continuous import (
    ContinuousAudioNavEnv,
    ContinuousConfig,
)
from soundspaces_tpu.scene import make_synthetic_assets
from soundspaces_tpu.tools.acoustics import (
    measure_rt60,
    scene_world_to_cells,
    source_is_visible,
)


def main():
    sr = 16000
    assets = make_synthetic_assets(
        num_nodes_hint=60, sampling_rate=sr, rir_max_len=sr // 2,
        num_sounds=1, max_secs=2, image_size=32, seed=3,
    )
    scene = DeviceScene.from_assets(assets)
    episodes = make_episode_bank(assets, 8, seed=1, min_geodesic_hops=3)

    # --- 1. render an IR at a pose ------------------------------------
    from soundspaces_tpu.tools.rir_synth import (
        PoseTracer,
        native_tracer_available,
    )

    use_native = native_tracer_available()
    if use_native:
        tracer = PoseTracer(assets.graph, sr, sr // 2, num_rays=500)
        cfg = ContinuousConfig(
            sensors=("audiogoal", "spectrogram"), rir_source="tracer"
        )
        env = ContinuousAudioNavEnv(cfg, scene, episodes, 1, tracer=tracer)
    else:
        cfg = ContinuousConfig(
            sensors=("audiogoal", "spectrogram"), rir_source="parametric"
        )
        env = ContinuousAudioNavEnv(cfg, scene, episodes, 1)
    state, obs = env.reset(jax.random.PRNGKey(0))
    ir = np.asarray(state.rir[0])  # [2, L] binaural IR at the start pose
    print(f"IR rendered ({'native tracer' if use_native else 'parametric'}):"
          f" shape {ir.shape}, energy {float((ir ** 2).sum()):.4f}")

    # --- 2. sourceIsVisible() / getRayEfficiency() --------------------
    g = assets.graph
    lx = float(np.asarray(state.x)[0])
    lz = float(np.asarray(state.z)[0])
    goal = int(np.asarray(state.goal_node)[0])
    sx, sz = float(g.points[goal, 0]), float(g.points[goal, 2])
    cells = scene_world_to_cells(scene, np.array([[lx, lz], [sx, sz]]))
    vis = bool(
        source_is_visible(
            scene.occupancy, jnp.asarray(cells[0]), jnp.asarray(cells[1])
        )
    )
    print(f"sourceIsVisible() -> {vis}")
    if use_native:
        stats = tracer.ray_stats(
            np.array([[lx, lz]], np.float32), np.array([[sx, sz]], np.float32)
        )
        print(f"getRayEfficiency() -> {stats[0, 0]:.2f} "
              f"(direct path clear: {bool(stats[0, 1])})")

    # --- 3. convolve the source with the IR (audiogoal) ---------------
    for _ in range(3):
        state, obs, _, _, _ = env.step(state, jnp.ones(1, jnp.int32))
    audio = np.asarray(obs["audiogoal"][0])
    print(f"audiogoal after 3 steps: {audio.shape}, "
          f"rms {float(np.sqrt((audio ** 2).mean())):.5f}")
    print(f"spectrogram: {tuple(obs['spectrogram'].shape[1:])}")

    # --- 4. RT60 measurement ------------------------------------------
    rt60 = measure_rt60(jnp.asarray(ir), sr)
    print(f"measured RT60 (T30 extrapolation): "
          f"L={float(rt60[0]):.3f}s R={float(rt60[1]):.3f}s")


if __name__ == "__main__":
    main()
