"""On-device PPO training (tier 5).

The reference's training loop crosses a process boundary every env step
(pipe RPC to simulator workers, ss_baselines/av_nav/ppo/ppo_trainer.py:121-194)
and runs the PPO update on GPU afterwards. Here rollout collection *is* a
`lax.scan` of policy.act ∘ env.step, fused with GAE and the clipped-surrogate
update into a single jitted train step; data parallelism is a `shard_map`
over a device mesh with `psum` gradient reduction riding ICI (the DD-PPO
equivalent, without straggler logic — SPMD is lockstep by construction,
SURVEY.md §2.7).
"""

from soundspaces_tpu.train.ppo import PPOConfig, compute_gae, ppo_loss
from soundspaces_tpu.train.rollout import Rollout, collect_rollout
from soundspaces_tpu.train.trainer import PPOTrainer, TrainerConfig

__all__ = [
    "PPOConfig",
    "PPOTrainer",
    "Rollout",
    "TrainerConfig",
    "collect_rollout",
    "compute_gae",
    "ppo_loss",
]
