"""Parity of the TPU spectrogram kernel against the numpy/librosa-semantics
golden reference (and, transitively, the reference platform's
SpectrogramSensor — soundspaces/tasks/nav.py:86-100)."""

import numpy as np
import pytest

from soundspaces_tpu import refimpl
from soundspaces_tpu.ops.stft import spectrogram, spectrogram_shape, stft_magnitude


def test_stft_magnitude_matches_reference(rng):
    sig = rng.standard_normal(44100).astype(np.float32)
    got = np.asarray(stft_magnitude(sig))
    want = refimpl.stft_magnitude(sig.astype(np.float64))
    assert got.shape == want.shape == (257, 276)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("sr", [16000, 44100])
def test_spectrogram_matches_reference(rng, sr):
    audio = rng.standard_normal((2, sr)).astype(np.float32) * 0.1
    got = np.asarray(spectrogram(audio))
    want = refimpl.compute_spectrogram(audio.astype(np.float64))
    assert got.shape == want.shape == spectrogram_shape(sr)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_spectrogram_known_shapes():
    # Replica RIRs are 44.1 kHz -> 65x69x2; MP3D RIRs are 16 kHz -> 65x26x2
    # (the shape hard-coded in the reference's pretraining trainer,
    # ss_baselines/savi/pretraining/audiogoal_trainer.py:38).
    assert spectrogram_shape(44100) == (65, 69, 2)
    assert spectrogram_shape(16000) == (65, 26, 2)


def test_spectrogram_batched_matches_single(rng):
    batch = rng.standard_normal((3, 2, 16000)).astype(np.float32)
    got = np.asarray(spectrogram(batch))
    for i in range(3):
        np.testing.assert_allclose(
            got[i], np.asarray(spectrogram(batch[i])), rtol=1e-6, atol=1e-6
        )


def test_spectrogram_of_ones_matches_observation_space_probe():
    # The reference sizes its observation space by running the sensor on
    # np.ones((2, sr)) (nav.py:77); make sure that exact probe agrees.
    audio = np.ones((2, 16000), dtype=np.float32)
    got = np.asarray(spectrogram(audio))
    want = refimpl.compute_spectrogram(audio.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pallas_fused_tail_matches_reference(rng):
    """The hand-fused pallas |.|->pool->log1p tail must equal the XLA path
    (interpret mode on CPU; compiled on TPU)."""
    import jax

    audio = rng.standard_normal((3, 2, 16000)).astype(np.float32) * 0.1
    want = np.asarray(spectrogram(audio))

    from unittest import mock

    from soundspaces_tpu.ops import pallas_kernels

    orig = pallas_kernels.fused_magnitude_pool_log1p

    def interp(re, im, block=(4, 4), interpret=False):
        return orig(re, im, block, interpret=True)

    with mock.patch.object(
        pallas_kernels, "fused_magnitude_pool_log1p", interp
    ):
        got = np.asarray(spectrogram(audio, use_pallas=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nonzero_len_trim_is_exact(rng):
    """spectrogram(audio, nonzero_len=k) must equal the full computation
    when audio[..., k:] is zero (the continuous mode's padded window)."""
    import jax.numpy as jnp

    sr, k = 44100, 11025
    audio = np.zeros((3, 2, sr), np.float32)
    audio[..., :k] = rng.standard_normal((3, 2, k)).astype(np.float32)
    a = jnp.asarray(audio)
    full = np.asarray(spectrogram(a))
    trim = np.asarray(spectrogram(a, nonzero_len=k))
    assert trim.shape == full.shape
    np.testing.assert_array_equal(trim, full)
    # and at 16 kHz / 0.5 s windows
    sr, k = 16000, 4000
    audio = np.zeros((2, 2, sr), np.float32)
    audio[..., :k] = rng.standard_normal((2, 2, k)).astype(np.float32)
    a = jnp.asarray(audio)
    np.testing.assert_array_equal(
        np.asarray(spectrogram(a, nonzero_len=k)), np.asarray(spectrogram(a))
    )
