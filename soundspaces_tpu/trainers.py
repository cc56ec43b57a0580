"""Trainer registry entries (the reference's @baseline_registry.register_trainer
names, e.g. "AVNavTrainer" — ss_baselines/av_nav/ppo/ppo_trainer.py:44)."""

from soundspaces_tpu.train.trainer import PPOTrainer
from soundspaces_tpu.utils import registry

registry.register_trainer("AVNavTrainer")(PPOTrainer)
registry.register_trainer("PPOTrainer")(PPOTrainer)
# "ddppo" (av_nav/savi DDPPOTrainer): under SPMD the same trainer scales by
# wrapping its train step with train/parallel.data_parallel_step over a mesh;
# rendezvous/straggler machinery has no equivalent (SURVEY.md §2.7-2.8)
registry.register_trainer("ddppo")(PPOTrainer)
