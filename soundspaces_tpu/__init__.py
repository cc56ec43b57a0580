"""soundspaces_tpu — a TPU-native audio-visual embodied-AI platform.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
facebookresearch/sound-spaces: spatial (binaural) audio rendering inside
scanned 3D scenes, audio-goal navigation tasks, and PPO/DD-PPO baselines
(AV-Nav, AV-WaN, SAVi) — built TPU-first:

- The pre-rendered RIR dataset becomes an HBM-resident tensor bank; the
  per-step audio observation (source ⊛ RIR → STFT spectrogram) is a fused,
  batched frequency-domain kernel instead of per-process scipy calls
  (reference: soundspaces/simulator.py:608-666, soundspaces/tasks/nav.py:86-100).
- "N simulator processes behind VectorEnv" becomes a leading array axis of a
  pure-functional, jit-compiled environment stepped under `lax.scan`.
- DD-PPO's NCCL/GLOO all-reduce becomes `shard_map` + `psum` over a
  `jax.sharding.Mesh` riding ICI.
"""

__version__ = "0.1.0"
