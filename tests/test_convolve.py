"""Parity of the frequency-domain windowed RIR convolution against scipy's
fftconvolve pipelines used by the reference simulators."""

import numpy as np
import pytest
from scipy.signal import fftconvolve

from soundspaces_tpu import refimpl
from soundspaces_tpu.ops.convolve import (
    fft_convolve,
    min_fft_size,
    precompute_segment_ffts,
    windowed_convolve,
)

SR = 4410  # scaled-down sampling rate keeps the test fast; math is identical


def test_fft_convolve_full_and_valid(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    h = rng.standard_normal(256).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fft_convolve(x, h)), fftconvolve(x, h), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fft_convolve(x, h, mode="valid")),
        fftconvolve(x, h, mode="valid"),
        rtol=1e-3,
        atol=1e-4,
    )


@pytest.mark.parametrize("audio_index", [0, 1, 3])
@pytest.mark.parametrize("rir_len", [900, SR])
def test_windowed_convolve_matches_reference_sliding_window(
    rng, audio_index, rir_len
):
    """The reference's three-branch sliding-window fftconvolve
    (simulator.py:628-647) must equal our single fixed-shape kernel."""
    rir_max = SR
    source = rng.standard_normal(4 * SR).astype(np.float32)
    rir = rng.standard_normal((rir_len, 2)).astype(np.float32) * 0.1

    want = refimpl.sliding_window_audiogoal(source, rir, audio_index, SR)

    seg_ffts = precompute_segment_ffts(
        source[None], np.array([4]), SR, rir_max
    )
    rir_padded = np.zeros((2, rir_max), np.float32)
    rir_padded[:, :rir_len] = rir.T
    got = np.asarray(
        windowed_convolve(seg_ffts[0, audio_index], rir_padded, SR, rir_max)
    )
    assert got.shape == (2, SR)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_windowed_convolve_one_second_source(rng):
    """A source of exactly 1 s must reproduce the reference's
    `fftconvolve(source, rir)[:, :sr]` branch (simulator.py:629-632)."""
    source = rng.standard_normal(SR).astype(np.float32)
    rir = rng.standard_normal((700, 2)).astype(np.float32) * 0.1
    want = refimpl.sliding_window_audiogoal(source, rir, 0, SR)

    rir_max = SR
    seg_ffts = precompute_segment_ffts(source[None], np.array([1]), SR, rir_max)
    rir_padded = np.zeros((2, rir_max), np.float32)
    rir_padded[:, :700] = rir.T
    got = np.asarray(windowed_convolve(seg_ffts[0, 0], rir_padded, SR, rir_max))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_segment_fft_wraps_cyclically(rng):
    """Index past the sound length must behave like index % length
    (the reference wraps _audio_index, simulator.py:635)."""
    source = rng.standard_normal(2 * SR).astype(np.float32)
    seg_ffts = precompute_segment_ffts(
        source[None], np.array([2]), SR, SR, max_secs=4
    )
    np.testing.assert_allclose(seg_ffts[0, 1], seg_ffts[0, 3], atol=1e-6)
    np.testing.assert_allclose(seg_ffts[0, 0], seg_ffts[0, 2], atol=1e-6)


def test_min_fft_size():
    assert min_fft_size(44100, 44100) == 131072
    assert min_fft_size(4410, 4410) == 16384


def test_crossfade_matches_reference(rng):
    from soundspaces_tpu.ops.crossfade import crossfade

    x1 = rng.standard_normal((2, SR)).astype(np.float32)
    x2 = rng.standard_normal((2, SR)).astype(np.float32)
    want = refimpl.audio.crossfade(x1, x2, SR)
    got = np.asarray(crossfade(x1, x2, SR))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
