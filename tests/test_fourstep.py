"""Four-step (Bailey) matmul FFT vs numpy's FFT — forward real, inverse
real-pair, and the large-block (2B > 32768) partitioned convolution path
that the XLA FFT cannot serve on the tunnel backend."""

import jax.numpy as jnp
import numpy as np
import pytest

from soundspaces_tpu.ops.fourstep import (
    fft_fourstep,
    irfft_pairs_fourstep,
    rfft_fourstep,
)


@pytest.mark.parametrize("b,m,n", [(4, 5000, 8192), (2, 100, 65536),
                                   (6, 16384, 16384), (8, 32768, 32768)])
def test_rfft_fourstep_matches_numpy(rng, b, m, n):
    x = rng.standard_normal((b, m)).astype(np.float32)
    r, i = rfft_fourstep(jnp.asarray(x), n)
    ref = np.fft.rfft(x, n)
    scale = max(1.0, np.abs(ref).max())
    np.testing.assert_allclose(np.asarray(r), ref.real, atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(i), ref.imag, atol=5e-5 * scale)


def test_fft_fourstep_matches_numpy(rng):
    b, n1, n2 = 4, 64, 128
    n = n1 * n2
    z = (rng.standard_normal((b, n)) + 1j * rng.standard_normal((b, n)))
    z = z.astype(np.complex64)
    fr, fi = fft_fourstep(jnp.asarray(z.real), jnp.asarray(z.imag), n1, n2)
    ref = np.fft.fft(z)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(fr), ref.real, atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(fi), ref.imag, atol=5e-5 * scale)
    ir, ii = fft_fourstep(jnp.asarray(ref.real.astype(np.float32)),
                          jnp.asarray(ref.imag.astype(np.float32)),
                          n1, n2, inverse=True)
    np.testing.assert_allclose(np.asarray(ir), z.real, atol=5e-5)
    np.testing.assert_allclose(np.asarray(ii), z.imag, atol=5e-5)


def test_irfft_pairs_roundtrip(rng):
    b, n = 6, 16384
    x = rng.standard_normal((b, n)).astype(np.float32)
    spec = np.fft.rfft(x).astype(np.complex64)
    out = irfft_pairs_fourstep(
        jnp.asarray(spec.real), jnp.asarray(spec.imag), n
    )
    np.testing.assert_allclose(np.asarray(out), x, atol=2e-4)


def test_rfft2d_large_block_dispatch(rng):
    """_rfft2d routes n > 32768 through four-step (odd batch padded)."""
    from soundspaces_tpu.ops.partitioned import _rfft2d

    x = rng.standard_normal((3, 40000)).astype(np.float32)  # odd batch
    got = np.asarray(_rfft2d(jnp.asarray(x), 65536))
    ref = np.fft.rfft(x, 65536)
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=5e-5 * scale)


def test_partitioned_large_block_matches_reference(rng):
    """Block 32768 (FFT 65536, four-step both directions) reproduces the
    reference sliding-window convolution at 44.1 kHz."""
    from soundspaces_tpu import refimpl
    from soundspaces_tpu.ops.partitioned import (
        device_rir_partition_ffts,
        partitioned_windowed_convolve_fft,
        segment_block_ffts_from_source,
    )

    sr, rir_len, block = 44100, 44100, 32768
    source = rng.standard_normal(2 * sr).astype(np.float32)
    rir = (rng.standard_normal((rir_len, 2)) * 0.05).astype(np.float32)
    want = refimpl.audio.continuous_windowed_audiogoal(
        source, rir, 1 * sr, sr, step_time=1.0
    )

    seg = segment_block_ffts_from_source(
        jnp.asarray(source), jnp.int32(1 * sr), sr, rir_len, block,
        length=jnp.int32(2 * sr), wrap=True,
    )
    h = device_rir_partition_ffts(jnp.asarray(rir.T), block)
    got = np.asarray(partitioned_windowed_convolve_fft(seg, h, sr, block))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_irfft_second_half_only(rng):
    """second_half_only returns exactly irfft(spec)[:, n/2:]."""
    b, n = 4, 16384
    x = rng.standard_normal((b, n)).astype(np.float32)
    spec = np.fft.rfft(x).astype(np.complex64)
    full = irfft_pairs_fourstep(jnp.asarray(spec.real), jnp.asarray(spec.imag), n)
    half = irfft_pairs_fourstep(
        jnp.asarray(spec.real), jnp.asarray(spec.imag), n,
        second_half_only=True,
    )
    assert half.shape == (b, n // 2)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full)[:, n // 2:],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(half), x[:, n // 2:], atol=2e-4)


def test_irfft_halfcomplex_matches_numpy(rng):
    """Half-size complex-iFFT realization of irfft (odd batch allowed)."""
    from soundspaces_tpu.ops.fourstep import irfft_halfcomplex_fourstep

    for b, n in [(3, 8192), (6, 32768)]:
        x = rng.standard_normal((b, n)).astype(np.float32)
        spec = np.fft.rfft(x).astype(np.complex64)
        full = irfft_halfcomplex_fourstep(
            jnp.asarray(spec.real), jnp.asarray(spec.imag), n
        )
        np.testing.assert_allclose(np.asarray(full), x, atol=3e-4)
        half = irfft_halfcomplex_fourstep(
            jnp.asarray(spec.real), jnp.asarray(spec.imag), n,
            second_half_only=True,
        )
        np.testing.assert_allclose(np.asarray(half), x[:, n // 2:], atol=3e-4)
