"""Pure-functional audio-goal navigation environments (tiers 2-3).

The reference runs N simulator *processes* behind `habitat.VectorEnv`
(ss_baselines/common/env_utils.py:90-106), each wrapping a stateful
SoundSpacesSim. Here "N envs" is a leading array axis: the environment is a
pair of pure functions

    reset:  (rng, scene, episodes)        -> (EnvState, obs)
    step:   (scene, episodes, state, act) -> (EnvState, obs, reward, done, info)

jit-compiled and vmapped, with auto-reset as a masked state update. Rollouts
are `lax.scan` over these — the entire simulation loop stays on device.
"""

from soundspaces_tpu.env.structs import (
    DeviceScene,
    EnvConfig,
    EnvState,
    EpisodeBank,
    make_episode_bank,
)
from soundspaces_tpu.env.audionav import AudioNavEnv

__all__ = [
    "AudioNavEnv",
    "DeviceScene",
    "EnvConfig",
    "EnvState",
    "EpisodeBank",
    "make_episode_bank",
]
