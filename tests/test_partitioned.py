"""Partitioned overlap-save convolution must exactly match the direct
windowed convolution and the reference scipy pipeline."""

import numpy as np
import pytest

from soundspaces_tpu import refimpl
from soundspaces_tpu.ops.convolve import precompute_segment_ffts, windowed_convolve
from soundspaces_tpu.ops.partitioned import (
    choose_block_size,
    num_partitions,
    partitioned_windowed_convolve,
    precompute_rir_partition_ffts,
    precompute_segment_block_ffts,
)


@pytest.mark.parametrize("sr,rir_len,audio_index", [
    (4410, 900, 0),
    (4410, 4410, 2),
    (4410, 3000, 1),
    (16000, 9000, 0),
])
def test_partitioned_matches_reference(rng, sr, rir_len, audio_index):
    rir_max = sr
    source = rng.standard_normal(4 * sr).astype(np.float32)
    rir = rng.standard_normal((rir_len, 2)).astype(np.float32) * 0.1

    want = refimpl.sliding_window_audiogoal(source, rir, audio_index, sr)

    block = choose_block_size(rir_max)
    seg_blocks = precompute_segment_block_ffts(
        source[None], np.array([4]), sr, rir_max, block
    )
    rir_padded = np.zeros((2, rir_max), np.float32)
    rir_padded[:, :rir_len] = rir.T
    got = np.asarray(
        partitioned_windowed_convolve(
            seg_blocks[0, audio_index], rir_padded, sr, block
        )
    )
    assert got.shape == (2, sr)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_partitioned_matches_direct_path(rng):
    sr, rir_max = 4410, 4410
    source = rng.standard_normal(2 * sr).astype(np.float32)
    rir = rng.standard_normal((2, rir_max)).astype(np.float32) * 0.1
    seg = precompute_segment_ffts(source[None], np.array([2]), sr, rir_max)
    direct = np.asarray(windowed_convolve(seg[0, 1], rir, sr, rir_max))

    block = choose_block_size(rir_max)
    seg_blocks = precompute_segment_block_ffts(
        source[None], np.array([2]), sr, rir_max, block
    )
    part = np.asarray(
        partitioned_windowed_convolve(seg_blocks[0, 1], rir, sr, block)
    )
    np.testing.assert_allclose(part, direct, rtol=1e-3, atol=1e-4)


def test_block_size_bounds():
    # 44.1 kHz 1 s RIRs: blocks of 8192 -> FFT size 16384 <= the axon limit
    b = choose_block_size(44100)
    assert b == 8192 and 2 * b <= 32768
    assert num_partitions(44100, b) == 6
    # short RIR: single partition
    assert num_partitions(2000, choose_block_size(2000)) == 1


def test_rir_partition_fft_bank_shape(rng):
    rirs = rng.standard_normal((3, 2, 5000)).astype(np.float32)
    h = precompute_rir_partition_ffts(rirs, 2048)
    # DC/Nyquist-packed: frequency width == block (tile-aligned), not B+1
    assert h.shape == (3, 2, 3, 2048) and h.dtype == np.complex64


def test_fft_variant_matches_time_variant(rng):
    """Precomputed-RIR-spectra convolution == time-domain-bank convolution."""
    import jax.numpy as jnp

    from soundspaces_tpu.ops.partitioned import (
        device_rir_partition_ffts,
        partitioned_windowed_convolve_fft,
    )

    sr, rir_max = 4410, 4410
    source = rng.standard_normal(2 * sr).astype(np.float32)
    rir = rng.standard_normal((2, rir_max)).astype(np.float32) * 0.1
    block = choose_block_size(rir_max)
    seg = precompute_segment_block_ffts(source[None], np.array([2]), sr, rir_max, block)
    time_out = np.asarray(
        partitioned_windowed_convolve(seg[0, 1], jnp.asarray(rir), sr, block)
    )
    h_np = precompute_rir_partition_ffts(rir, block)
    fft_out = np.asarray(
        partitioned_windowed_convolve_fft(seg[0, 1], jnp.asarray(h_np), sr, block)
    )
    np.testing.assert_allclose(fft_out, time_out, rtol=1e-4, atol=1e-5)
    # device-side partition FFTs match numpy's
    h_dev = np.asarray(device_rir_partition_ffts(jnp.asarray(rir), block))
    np.testing.assert_allclose(h_dev, h_np, rtol=1e-4, atol=1e-4)


def test_spectrum_packing_roundtrip(rng):
    import jax.numpy as jnp

    from soundspaces_tpu.ops.partitioned import (
        pack_spectrum,
        pack_spectrum_np,
        unpack_spectrum,
    )

    x = rng.standard_normal((4, 256)).astype(np.float32)
    spec = np.fft.rfft(x).astype(np.complex64)
    packed_np = pack_spectrum_np(spec)
    packed_j = np.asarray(pack_spectrum(jnp.asarray(spec)))
    np.testing.assert_allclose(packed_np, packed_j, rtol=1e-6)
    # lossless: unpack recovers the full half-spectrum (DC/Nyquist are real)
    back = np.asarray(unpack_spectrum(jnp.asarray(packed_np)))
    np.testing.assert_allclose(back, spec, rtol=1e-6, atol=1e-7)


def test_packed_irfft_matches_numpy(rng):
    import jax.numpy as jnp

    from soundspaces_tpu.ops.fourstep import irfft_halfcomplex_packed_fourstep
    from soundspaces_tpu.ops.partitioned import pack_spectrum_np

    n = 4096
    x = rng.standard_normal((6, n)).astype(np.float32)
    spec = np.fft.rfft(x).astype(np.complex64)
    packed = pack_spectrum_np(spec)
    want = np.fft.irfft(spec, n=n)
    full = np.asarray(
        irfft_halfcomplex_packed_fourstep(
            jnp.asarray(packed.real), jnp.asarray(packed.imag), n
        )
    )
    np.testing.assert_allclose(full, want, rtol=2e-4, atol=2e-5)
    half = np.asarray(
        irfft_halfcomplex_packed_fourstep(
            jnp.asarray(packed.real), jnp.asarray(packed.imag), n,
            second_half_only=True,
        )
    )
    np.testing.assert_allclose(half, want[:, n // 2 :], rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("sr,rir_max", [(4410, 2000), (16000, 8000)])
def test_segment_ffts_ext_matches_source_path(rng, sr, rir_max):
    """The contiguous-slice delay-line path over wrap-extended sources must
    equal the per-sample modulo-gather path for arbitrary cursors (incl.
    cursors near the end, where 16 kHz sounds wrap twice within one 2B
    block)."""
    from soundspaces_tpu.ops.partitioned import (
        extend_source_for_slicing,
        segment_block_ffts_from_ext,
        segment_block_ffts_from_source,
    )
    import jax.numpy as jnp

    n = sr  # 1 s true length
    src = np.zeros((1, n), np.float32)
    src[0] = rng.standard_normal(n).astype(np.float32)
    lengths = np.array([1], np.int32)
    block = choose_block_size(rir_max)
    ext = extend_source_for_slicing(src, lengths, sr, rir_max, block)
    window = int(0.25 * sr)
    for start in [0, 7, n // 3, n - 1, n - window // 2]:
        want = segment_block_ffts_from_source(
            jnp.asarray(src[0]), jnp.int32(start), window, rir_max, block,
            length=jnp.int32(n), wrap=True,
        )
        got = segment_block_ffts_from_ext(
            jnp.asarray(ext[0]), jnp.int32(start), window, rir_max, block
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
        )
