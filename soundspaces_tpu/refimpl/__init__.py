"""Numpy golden-reference implementations of the reference platform's sensor
math (librosa STFT, skimage block_reduce, scipy fftconvolve pipelines).

These exist for two purposes:
1. Parity tests: the JAX/TPU kernels in `soundspaces_tpu.ops` are checked
   against these within float32 tolerance.
2. The single-env CPU baseline that `bench.py` reports speedups against.

They deliberately re-implement (not import) librosa/skimage semantics so the
test environment needs only numpy/scipy.
"""

from soundspaces_tpu.refimpl.audio import (
    block_reduce_mean,
    compute_spectrogram,
    hann_window_periodic,
    sliding_window_audiogoal,
    stft_magnitude,
)

__all__ = [
    "block_reduce_mean",
    "compute_spectrogram",
    "hann_window_periodic",
    "sliding_window_audiogoal",
    "stft_magnitude",
]
