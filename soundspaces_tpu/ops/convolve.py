"""Frequency-domain RIR convolution for batched audio-goal observations.

The reference computes, per env per step on host CPU, scipy
`fftconvolve(source_window, rir)` per binaural channel with three windowing
variants (soundspaces/simulator.py:628-647, continuous_simulator.py:428-456).
All three are the same mathematical object: a fixed-length window of the full
linear convolution `y[n] = sum_k rir[k] * source[n0 + n - k]`.

TPU-native design:
- Source waveforms are padded into fixed-shape banks; the per-(sound, window)
  *segment spectra* are precomputed once (they are tiny) so the per-step work
  is: gather RIR -> rFFT -> complex multiply -> irFFT -> static slice, batched
  over all envs.
- The circular FFT size is the minimal power of two that leaves the output
  window alias-free (see `min_fft_size`), NOT the full `next_fast_len` of the
  whole convolution — this halves FFT cost versus a naive port.
- Everything is static-shape; variable true RIR length is handled by zero
  padding, which is mathematically exact for convolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def min_fft_size(window_len: int, rir_max_len: int) -> int:
    """Minimal power-of-two circular-convolution size such that the output
    window [rir_max_len-1, rir_max_len-1+window_len) of
    conv(segment, rir) is free of circular aliasing, where the segment has
    length rir_max_len-1+window_len.

    Derivation: full conv length = window_len + 2*(rir_max_len-1); with
    circular size N the region [0, full-N) is aliased; requiring the window
    start rir_max_len-1 >= full-N gives N >= window_len + rir_max_len - 1.
    """
    return next_pow2(window_len + rir_max_len - 1)


def rfft_len(n: int) -> int:
    return n // 2 + 1


def fft_convolve(x: jax.Array, h: jax.Array, mode: str = "full") -> jax.Array:
    """Linear convolution along the last axis via FFT (batch axes broadcast).
    Matches scipy.signal.fftconvolve modes 'full' and 'valid'."""
    lx, lh = x.shape[-1], h.shape[-1]
    n = next_pow2(lx + lh - 1)
    y = jnp.fft.irfft(
        jnp.fft.rfft(x, n=n) * jnp.fft.rfft(h, n=n), n=n
    )[..., : lx + lh - 1]
    if mode == "full":
        return y
    if mode == "valid":
        lo, hi = min(lx, lh) - 1, max(lx, lh)
        return y[..., lo:hi]
    raise ValueError(f"unsupported mode {mode!r}")


def precompute_segment_ffts(
    sources: np.ndarray,
    lengths_sec: np.ndarray,
    sampling_rate: int,
    rir_max_len: int,
    max_secs: int | None = None,
) -> np.ndarray:
    """Precompute the rFFT of every one-second-aligned convolution segment.

    For sound `s` and second-index `i`, the segment is
      [ source[i*sr - (rir_max_len-1) : i*sr]  (zeros where out of range),
        source[i*sr : (i+1)*sr] ]
    so that the valid convolution with a (zero-padded) RIR of length
    rir_max_len reproduces the reference's windowed fftconvolve exactly,
    including the "reverb from previous time step"
    (soundspaces/simulator.py:642-647).

    sources: [n_sounds, max_samples] zero-padded waveforms.
    lengths_sec: [n_sounds] true length in whole seconds.
    Returns complex64 [n_sounds, max_secs, F] with F = rfft_len(N),
    N = min_fft_size(sr, rir_max_len). Indices past a sound's length hold the
    (cyclically correct) segment for index i % length, so callers may index
    with an un-wrapped counter up to max_secs.
    """
    sr = sampling_rate
    n_sounds, max_samples = sources.shape
    if max_secs is None:
        max_secs = max_samples // sr
    n = min_fft_size(sr, rir_max_len)
    seg_len = rir_max_len - 1 + sr
    out = np.zeros((n_sounds, max_secs, rfft_len(n)), dtype=np.complex64)
    for s in range(n_sounds):
        length = int(lengths_sec[s])
        padded = np.concatenate(
            [np.zeros(rir_max_len - 1, dtype=sources.dtype), sources[s, : length * sr]]
        )
        for i in range(max_secs):
            idx = i % max(length, 1)
            seg = padded[idx * sr : idx * sr + seg_len]
            out[s, i] = np.fft.rfft(seg, n=n).astype(np.complex64)
    return out


@functools.partial(jax.jit, static_argnames=("window_len", "rir_max_len", "fft_size"))
def windowed_convolve(
    segment_fft: jax.Array,
    rir: jax.Array,
    window_len: int,
    rir_max_len: int,
    fft_size: int | None = None,
) -> jax.Array:
    """One observation window of conv(segment, rir) per channel.

    segment_fft: [..., F] complex — rFFT (size N) of the
        [rir_max_len-1+window_len]-sample source segment.
    rir: [..., C, rir_max_len] float — zero-padded impulse responses.
    Returns [..., C, window_len] float32: the alias-free window
    [rir_max_len-1 : rir_max_len-1+window_len) of the full convolution, i.e.
    exactly the reference's valid-mode fftconvolve output.
    """
    n = fft_size or min_fft_size(window_len, rir_max_len)
    rir_fft = jnp.fft.rfft(rir, n=n)  # [..., C, F]
    prod = segment_fft[..., None, :] * rir_fft
    y = jnp.fft.irfft(prod, n=n)
    lo = rir_max_len - 1
    return y[..., lo : lo + window_len]
