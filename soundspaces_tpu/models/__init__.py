"""Policy networks (tier 4), in flax.linen.

Re-designs of the reference's torch models (ss_baselines/*/models): the same
capacity and information flow — small conv encoders per modality, fused into
a GRU (AV-Nav) or a scene-memory transformer (SAVi) — expressed as functional
modules whose forward passes jit/scan cleanly and keep the MXU busy via NHWC
convs and batched matmuls.
"""

from soundspaces_tpu.models.encoders import AudioCNN, VisualCNN
from soundspaces_tpu.models.rnn_state_encoder import RNNStateEncoder
from soundspaces_tpu.models.policy import AudioNavBaselineNet, CategoricalPolicy

__all__ = [
    "AudioCNN",
    "AudioNavBaselineNet",
    "CategoricalPolicy",
    "RNNStateEncoder",
    "VisualCNN",
]
