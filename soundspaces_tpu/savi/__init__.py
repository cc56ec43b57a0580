"""SAVi: semantic audio-visual navigation (CVPR'21 baseline family).

The reference (ss_baselines/savi/) equips the agent with a Scene Memory
Transformer — an external ring buffer of past step-embeddings attended by a
1+1-layer transformer with relative-pose re-encoding — plus goal-belief
predictors (category + location) trained online.

TPU-native redesigns:
- Acting: the memory is a fixed-shape [M, dim] ring buffer per env carried in
  the policy state (the reference's ExternalMemory,
  savi/models/rollout_storage.py:349-445), attended with validity masks.
- PPO update: the reference stores T+1 copies of the memory per rollout so
  each step sees its snapshot (rollout_storage.py:77-81). Here the snapshot
  at step t is derivable from the stored feature history, so the update uses
  ONE banded-causal masked attention over [carried memory ++ rollout
  features] — same math, no T-fold duplication, and it maps onto the MXU as
  a single batched attention.
"""

from soundspaces_tpu.savi.memory import ExternalMemory
from soundspaces_tpu.savi.smt import SMTStateEncoder
from soundspaces_tpu.savi.policy import AudioNavSMTNet, SMTPolicy
from soundspaces_tpu.savi.belief import BeliefPredictor

__all__ = [
    "AudioNavSMTNet",
    "BeliefPredictor",
    "ExternalMemory",
    "SMTStateEncoder",
    "SMTPolicy",
]
