"""TPU-native audio/visual kernels (tier 0).

All ops are pure functions with static shapes, designed to be jit/vmap/pjit
composable. The hot path — RIR convolution + STFT spectrogram — is built to
run batched over hundreds of envs per chip entirely in HBM/VMEM.
"""

from soundspaces_tpu.ops.convolve import (
    fft_convolve,
    min_fft_size,
    next_pow2,
    precompute_segment_ffts,
    windowed_convolve,
)
from soundspaces_tpu.ops.stft import spectrogram, stft_magnitude
from soundspaces_tpu.ops.crossfade import crossfade

__all__ = [
    "crossfade",
    "fft_convolve",
    "min_fft_size",
    "next_pow2",
    "precompute_segment_ffts",
    "spectrogram",
    "stft_magnitude",
    "windowed_convolve",
]
