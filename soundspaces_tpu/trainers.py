"""Trainer registry entries (the reference's @baseline_registry.register_trainer
names, e.g. "AVNavTrainer" — ss_baselines/av_nav/ppo/ppo_trainer.py:44)."""

from soundspaces_tpu.train.trainer import PPOTrainer
from soundspaces_tpu.utils import registry

registry.register_trainer("AVNavTrainer")(PPOTrainer)
registry.register_trainer("PPOTrainer")(PPOTrainer)
