"""Uniform partitioned overlap-save convolution (frequency-domain delay line).

The direct frequency-domain convolution (ops/convolve.py) needs one FFT of
size ~2^17 per observation at 44.1 kHz. Large single FFTs are both the worst
case for TPU FFT implementations and, on the axon tunnel backend, outright
broken above 2^15. The classic real-time-convolution structure fixes both:

- the RIR is split into P uniform partitions of B samples, each rFFT'd at
  2B (so every FFT is small and batchable);
- the source segment is processed as a sliding frequency-domain delay line:
  S_j = rfft(src[n0 + (j-1)B : n0 + (j+1)B]) with hop B — and because the
  discrete sim's windows are second-aligned, ALL S_j are precomputed into a
  tiny bank (the analog of ops/convolve.precompute_segment_ffts);
- each output block is  irfft( sum_p S_{t-p} · H_p )[B:2B]  — the sum over
  partitions is a batched complex einsum that maps onto the MXU.

The result equals the exact linear convolution window (overlap-save is
exact), i.e. the reference's sliding-window scipy fftconvolve
(soundspaces/simulator.py:628-647), to float32 rounding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from soundspaces_tpu.ops.convolve import next_pow2

MAX_FFT_SIZE = 32768  # axon TPU tunnel: FFTs above this hang/corrupt D2H


# ---------------------------------------------------------------------------
# DC/Nyquist packing.
#
# All partition/segment spectra in this module are stored PACKED: an rFFT
# half-spectrum [.., 2B] real signal -> [.., B+1] complex has two purely-real
# entries (DC and Nyquist), so it folds losslessly into [.., B] complex with
# bin 0 = complex(X[0].re, X[B].re). The power-of-two frequency width keeps
# bank rows aligned to the TPU's (8, 128) f32 tiles — a 16385-wide row
# misaligns every row and measured 1.76x slower on HBM gathers of the RIR
# partition bank at production shapes (256 envs, 44.1 kHz, block 16384).
# ---------------------------------------------------------------------------


def pack_spectrum_np(spec: np.ndarray) -> np.ndarray:
    """[..., B+1] complex rFFT half-spectrum of a real signal -> packed
    [..., B]: bin 0 carries complex(DC, Nyquist)."""
    packed = spec[..., :-1].copy()
    packed[..., 0] = spec[..., 0].real + 1j * spec[..., -1].real
    return packed


def pack_spectrum(spec: jax.Array) -> jax.Array:
    """JAX version of pack_spectrum_np."""
    bin0 = jax.lax.complex(spec[..., :1].real, spec[..., -1:].real)
    return jnp.concatenate([bin0, spec[..., 1:-1]], axis=-1)


def unpack_spectrum(packed: jax.Array) -> jax.Array:
    """Packed [..., B] -> full rFFT half-spectrum [..., B+1]."""
    zero = jnp.zeros_like(packed[..., :1].real)
    bin0 = jax.lax.complex(packed[..., :1].real, zero)
    nyq = jax.lax.complex(packed[..., :1].imag, zero)
    return jnp.concatenate([bin0, packed[..., 1:], nyq], axis=-1)


def spectra_to_bf16_pair(spec: jax.Array) -> jax.Array:
    """Packed complex spectra [..., B] c64 -> [2, ..., B] bfloat16 (re, im).

    Storing RIR partition banks this way halves the bytes of the dominant
    per-step HBM gather (2 x bf16 = 4 B/bin vs complex64's 8 B/bin). The
    upcast back to f32 fuses into the gather's consumer; accuracy is bf16's
    ~3 significant digits on the RIR spectrum (the source-segment spectra
    and all arithmetic stay f32), measured ~1e-2 relative on the rendered
    waveform — opt-in for RL throughput, not for the parity paths.

    re/im stack on a LEADING axis: a trailing (re, im) axis makes the pair
    the minor dim and XLA pads the [.., B, 2] slices 42.7x onto (2, 128)
    tiles (measured: a 96 MB gather allocated 4 GB and OOM'd the chip).
    Leading-axis keeps the frequency axis minor and tile-aligned."""
    return jnp.stack(
        [spec.real.astype(jnp.bfloat16), spec.imag.astype(jnp.bfloat16)],
        axis=0,
    )


def spectra_to_bf16_pair_np(spec: np.ndarray) -> np.ndarray:
    """Host-side spectra_to_bf16_pair: packed [..., B] complex64 numpy ->
    [2, ..., B] bfloat16 numpy (via ml_dtypes). Casting BEFORE upload
    halves the host->device transfer and avoids the transient double
    allocation of uploading f32 and re-casting on device."""
    import ml_dtypes

    return np.stack([spec.real, spec.imag], axis=0).astype(ml_dtypes.bfloat16)


def gather_part_fft(bank: jax.Array, index_fn):
    """Gather packed RIR partition spectra from `bank` regardless of its
    storage layout: complex64 [...banked..., B] banks index directly;
    bfloat16 (re, im)-pair banks [2, ...banked..., B] go through
    gather_bf16_pair (per-plane gather, then a fused f32 upcast).
    `index_fn(plane)` performs the caller's gather on one banked layout.
    The single dispatch point for every rir_part_fft index site."""
    if jnp.issubdtype(bank.dtype, jnp.complexfloating):
        return index_fn(bank)
    return gather_bf16_pair(bank, index_fn)


def bf16_pair_to_c64(pair: jax.Array) -> jax.Array:
    """[2, ..., B] bfloat16 (re, im) -> packed complex64 spectra [..., B].

    Only for host-side/small tensors. On the hot path slice the two planes
    BEFORE any batched gather (gather_bf16_pair): slicing the pair axis of
    a gathered intermediate makes XLA lay the result out minor-on-the-pair
    axis, padding a 96 MB tensor to 4 GB (measured OOM at 256 envs)."""
    return jax.lax.complex(
        pair[0].astype(jnp.float32), pair[1].astype(jnp.float32)
    )


def gather_bf16_pair(bank: jax.Array, index_fn) -> jax.Array:
    """Gather packed spectra from a [2, ...banked dims..., B] bfloat16
    (re, im) pair bank -> complex64 [...gathered dims..., B].

    `index_fn(plane)` performs the caller's gather on ONE [-, ..., B]
    plane. Slicing the plane first keeps each gather's output layout
    B-minor; the f32 upcast then fuses into the consumer."""
    re = index_fn(bank[0]).astype(jnp.float32)
    im = index_fn(bank[1]).astype(jnp.float32)
    return jax.lax.complex(re, im)


def _unpack_with_bin0(acc: jax.Array, bin0: jax.Array) -> jax.Array:
    """Unpack [.., B] spectra whose bin 0 is stale, taking the correct
    packed bin-0 value (DC in re, Nyquist in im) from `bin0` [.., 1]."""
    zero = jnp.zeros_like(bin0.real)
    dc = jax.lax.complex(bin0.real, zero)
    nyq = jax.lax.complex(bin0.imag, zero)
    return jnp.concatenate([dc, acc[..., 1:], nyq], axis=-1)


def _packed_accumulate(
    seg_block_fft: jax.Array,  # [K, B] packed
    rir_fft: jax.Array,  # [C, P, B] packed
) -> tuple[jax.Array, jax.Array]:
    """Frequency-domain delay line Y_t = sum_p S_{t-p} H_p on PACKED spectra.

    Returns (acc, bin0) with acc [T*C, B] the RAW complex accumulation —
    kept as pure multiply-adds so XLA fuses the whole P-round chain into
    one pass (patching bin 0 in-place here costs a full extra HBM pass,
    measured ~10% of the entire env step) — and bin0 [T*C, 1] the CORRECT
    packed bin-0 value complex(sum_p DC*DC, sum_p Nyq*Nyq), computed from
    the tiny bin-0 columns. Consumers (the packed iFFT) substitute bin0 via
    selects they already perform."""
    k_total, f = seg_block_fft.shape
    c, p, _ = rir_fft.shape
    t_out = k_total - p + 1
    acc = jnp.zeros((t_out * c, f), seg_block_fft.dtype)
    for pi in range(p):
        s = jax.lax.slice_in_dim(seg_block_fft, p - 1 - pi, p - 1 - pi + t_out)
        acc = acc + (s[:, None, :] * rir_fft[None, :, pi, :]).reshape(
            t_out * c, f
        )
    # correct bin 0: dc[t,c] = sum_p s0[t+P-1-p].re * h0[c,p].re (Nyq: .im)
    s0 = seg_block_fft[:, 0]  # [K]
    h0 = rir_fft[:, :, 0]  # [C, P]
    sl = s0[jnp.arange(t_out)[:, None] + (p - 1 - jnp.arange(p))[None, :]]
    dc = jnp.einsum("tp,cp->tc", sl.real, h0.real)
    ny = jnp.einsum("tp,cp->tc", sl.imag, h0.imag)
    return acc, jax.lax.complex(dc, ny).reshape(t_out * c, 1)


FOURSTEP_MIN_FFT = 8192  # below this XLA's FFT wins; above, MXU matmuls do


def _rfft2d(x: jax.Array, n: int) -> jax.Array:
    """rFFT along the last axis of a 2-D array. Large transforms run as
    four-step MXU matmuls (ops/fourstep.py): XLA's TPU FFT does not map
    onto the MXU and is the measured bottleneck of per-step spectra at
    32768 points (it also wedges the axon tunnel above 32768)."""
    if n < FOURSTEP_MIN_FFT:
        return jnp.fft.rfft(x, n=n)
    from soundspaces_tpu.ops.fourstep import rfft_fourstep

    b = x.shape[0]
    if b % 2:
        x = jnp.pad(x, ((0, 1), (0, 0)))
    re, im = rfft_fourstep(x, n)
    return jax.lax.complex(re, im)[:b]


def choose_block_size(rir_max_len: int, max_fft: int = MAX_FFT_SIZE) -> int:
    """Partition block B: a power of two with 2B <= max_fft, sized so short
    RIRs use a single partition."""
    b = next_pow2(rir_max_len)
    return min(b, max_fft // 2, 8192)


def num_partitions(rir_max_len: int, block: int) -> int:
    return -(-rir_max_len // block)


def num_output_blocks(window_len: int, block: int) -> int:
    return -(-window_len // block)


def precompute_segment_block_ffts(
    sources: np.ndarray,
    lengths_sec: np.ndarray,
    sampling_rate: int,
    rir_max_len: int,
    block: int | None = None,
    max_secs: int | None = None,
) -> np.ndarray:
    """Block spectra of every second-aligned window's delay line.

    Returns complex64 [n_sounds, max_secs, K, B] (DC/Nyquist-packed, see
    pack_spectrum_np) with K = num_output_blocks(sr, B) + P - 1, where entry
    (s, i, k) packs  rfft(src_padded[i*sr + (k - P)B : i*sr + (k - P + 2)B])
    over the source zero-padded with P*B samples on the left (the "reverb
    from previous step" region)."""
    sr = sampling_rate
    b = block or choose_block_size(rir_max_len)
    p = num_partitions(rir_max_len, b)
    t_out = num_output_blocks(sr, b)
    k_total = t_out + p - 1
    n_sounds, max_samples = sources.shape
    if max_secs is None:
        max_secs = max_samples // sr
    out = np.zeros((n_sounds, max_secs, k_total, b), np.complex64)
    for s in range(n_sounds):
        length = max(int(lengths_sec[s]), 1)
        padded = np.concatenate(
            [np.zeros(p * b, dtype=sources.dtype), sources[s, : length * sr]]
        )
        # right-pad so late blocks can always read 2B samples
        padded = np.concatenate([padded, np.zeros(2 * b + t_out * b, sources.dtype)])
        for i in range(max_secs):
            n0 = (i % length) * sr  # cyclic index like the reference's
            for k in range(k_total):
                start = n0 + k * b  # == n0 + (j-1)B with j = k - (P-1)
                seg = padded[start : start + 2 * b]
                out[s, i, k] = pack_spectrum_np(
                    np.fft.rfft(seg, n=2 * b).astype(np.complex64)
                )
    return out


def precompute_rir_partition_ffts(
    rirs: np.ndarray, block: int
) -> np.ndarray:
    """rirs [..., C, L] -> packed partition spectra [..., C, P, B] c64."""
    b = block
    p = num_partitions(rirs.shape[-1], b)
    pad = p * b - rirs.shape[-1]
    padded = np.pad(rirs, [(0, 0)] * (rirs.ndim - 1) + [(0, pad)])
    parts = padded.reshape(padded.shape[:-1] + (p, b))
    return pack_spectrum_np(
        np.fft.rfft(parts, n=2 * b, axis=-1).astype(np.complex64)
    )


@functools.partial(jax.jit, static_argnames=("block",))
def device_rir_partition_ffts(rirs: jax.Array, block: int) -> jax.Array:
    """On-device version of precompute_rir_partition_ffts (used when banks
    are generated on device). rirs [..., C, L] -> packed [..., C, P, B]."""
    b = block
    p = num_partitions(rirs.shape[-1], b)
    pad = p * b - rirs.shape[-1]
    padded = jnp.pad(rirs, [(0, 0)] * (rirs.ndim - 1) + [(0, pad)])
    flat = padded.reshape((-1, b))  # keep FFT inputs 2-D (layout discipline)
    out = pack_spectrum(_rfft2d(flat, 2 * b))
    return out.reshape(rirs.shape[:-1] + (p, b))


@functools.partial(
    jax.jit, static_argnames=("window_len", "rir_max_len", "block", "wrap")
)
def segment_block_ffts_from_source(
    source: jax.Array,  # [n_samples] float (may be padded past `length`)
    start: jax.Array,  # scalar i32: window start n0 (source coordinates)
    window_len: int,
    rir_max_len: int,
    block: int,
    length: jax.Array | None = None,  # true sample count for wraparound
    wrap: bool = True,
) -> jax.Array:
    """On-the-fly delay-line spectra for an arbitrary (non-second-aligned)
    window start — the SS2.0 continuous-mode case where the sample cursor
    advances by STEP_TIME*sr each step with wraparound
    (soundspaces/continuous_simulator.py:428-456). Returns packed [K, B]."""
    b = block
    p = num_partitions(rir_max_len, b)
    t_out = num_output_blocks(window_len, b)
    k_total = t_out + p - 1
    n = length if length is not None else source.shape[0]

    offsets = jnp.arange(k_total) * b - p * b  # block k starts at n0+(k-P)B
    sample_idx = (
        start + offsets[:, None] + jnp.arange(2 * b)[None, :]
    )
    if wrap:
        # reference semantics exactly: positions past the end wrap cyclically
        # (continuous_simulator.py:443-445) while positions before sample 0
        # are silence (the `index - rir_len < 0` branch zero-pads the left)
        gathered = jnp.where(sample_idx >= 0, source[sample_idx % n], 0.0)
    else:
        valid = (sample_idx >= 0) & (sample_idx < n)
        gathered = jnp.where(valid, source[jnp.clip(sample_idx, 0, n - 1)], 0.0)
    return pack_spectrum(_rfft2d(gathered, 2 * b))


def extend_source_for_slicing(
    sounds: np.ndarray,  # [S, max_samples] f32
    lengths_sec: np.ndarray,  # [S] i32 true lengths in whole seconds
    sampling_rate: int,
    rir_max_len: int,
    block: int,
) -> np.ndarray:
    """Wrap-extended, left-zero-padded source rows for
    segment_block_ffts_from_ext: ext[s, P*B + j] = sounds[s, j mod n_s]
    (n_s = true length), with P*B zeros on the left (the "no reverb history
    before episode start" region) and one-plus window-span of cyclic tail on
    the right. Turns the per-step delay-line window into ONE contiguous
    dynamic_slice — the per-sample modulo gather it replaces measured 95 ms
    of a 97 ms segment-spectra step at 64 envs/44.1 kHz on TPU v5e."""
    b = block
    p = num_partitions(rir_max_len, b)
    # worst-case window: a full second (step_time <= 1 s)
    k_max = num_output_blocks(sampling_rate, b) + p - 1
    tail = (k_max + 1) * b
    s, max_samples = sounds.shape
    ext = np.zeros((s, p * b + max_samples + tail), np.float32)
    for i in range(s):
        n = max(int(lengths_sec[i]), 1) * sampling_rate
        idx = np.arange(n + tail) % n
        ext[i, p * b : p * b + n + tail] = sounds[i, idx]
    return ext


@functools.partial(
    jax.jit, static_argnames=("window_len", "rir_max_len", "block")
)
def segment_block_ffts_from_ext(
    ext: jax.Array,  # [P*B + max_samples + tail] one extended source row
    start: jax.Array,  # scalar i32 cursor in [0, n)
    window_len: int,
    rir_max_len: int,
    block: int,
) -> jax.Array:
    """Fast path of segment_block_ffts_from_source over a wrap-extended
    source row (extend_source_for_slicing): block k of the delay line starts
    at ext index start + k*B, so the union of all K overlapping blocks is
    one contiguous slice of (K+1)*B samples — no per-sample index math.
    Semantics identical: positions past the sound's end wrap cyclically,
    positions before sample 0 are silence (continuous_simulator.py:443-445).
    Returns packed [K, B]."""
    b = block
    p = num_partitions(rir_max_len, b)
    t_out = num_output_blocks(window_len, b)
    k_total = t_out + p - 1
    span = jax.lax.dynamic_slice(ext, (start,), ((k_total + 1) * b,))
    rows = span.reshape(k_total + 1, b)
    # overlapping 2B blocks at hop B: block k = rows[k] ++ rows[k+1]
    blocks = jnp.concatenate([rows[:-1], rows[1:]], axis=1)
    return pack_spectrum(_rfft2d(blocks, 2 * b))


@functools.partial(
    jax.jit, static_argnames=("window_len", "block", "use_fourstep")
)
def partitioned_windowed_convolve_fft(
    seg_block_fft: jax.Array,  # [K, B] packed complex
    rir_fft: jax.Array,  # [C, P, B] packed partition spectra
    window_len: int,
    block: int,
    use_fourstep: bool = True,
) -> jax.Array:
    """Like partitioned_windowed_convolve but with the RIR partition spectra
    precomputed into the bank — removes C*P forward FFTs per observation
    (the dominant per-step FFT cost at 44.1 kHz; the bank costs 2x the
    time-domain storage). Spectra are DC/Nyquist-packed (tile-aligned bank
    rows). The inverse transform runs as four-step MXU matmuls
    (ops/fourstep.py) instead of XLA's FFT when eligible."""
    b = block
    k_total, f = seg_block_fft.shape
    c, p, _ = rir_fft.shape
    t_out = k_total - p + 1
    acc, bin0 = _packed_accumulate(seg_block_fft, rir_fft)
    if use_fourstep and 2 * b >= 2048:
        from soundspaces_tpu.ops.fourstep import (
            irfft_halfcomplex_packed_fourstep,
        )

        # half-size complex transform (no full-spectrum concat) computing
        # only the overlap-save keep region [b, 2b); acc's stale bin 0 is
        # overridden inside the transform's own selects
        y = irfft_halfcomplex_packed_fourstep(
            acc.real, acc.imag, 2 * b, second_half_only=True,
            bin0r=bin0.real, bin0i=bin0.imag,
        )
    else:
        y = jnp.fft.irfft(_unpack_with_bin0(acc, bin0), n=2 * b)[:, b:]
    y = y.reshape(t_out, c, b).transpose(1, 0, 2).reshape(c, t_out * b)
    return y[:, :window_len]


@functools.partial(jax.jit, static_argnames=("window_len", "block"))
def partitioned_windowed_convolve(
    seg_block_fft: jax.Array,  # [K, B] packed complex
    rir: jax.Array,  # [C, L] float
    window_len: int,
    block: int,
) -> jax.Array:
    """One observation window [C, window_len] of conv(source, rir) starting
    at the window the segment spectra were built for."""
    b = block
    k_total, f = seg_block_fft.shape
    c, l = rir.shape
    p = num_partitions(l, b)
    t_out = k_total - p + 1

    # Layout discipline: keep every materialized tensor 2-D [small, F] so the
    # TPU (8, 128) tile pads the frequency axis only. A [T, P, F]/[T, C, F]
    # einsum formulation puts two tiny dims innermost and XLA pads them to
    # 8x128 — a measured 28x HBM blowup at production shapes.
    pad = p * b - l
    parts = jnp.pad(rir, ((0, 0), (0, pad))).reshape(c * p, b)
    h = pack_spectrum(_rfft2d(parts, 2 * b)).reshape(c, p, f)

    # frequency-domain delay line: Y_t = sum_p S_{t-p} H_p
    acc, bin0 = _packed_accumulate(seg_block_fft, h)

    # overlap-save: keep 2nd half
    if 2 * b >= 2048:
        from soundspaces_tpu.ops.fourstep import (
            irfft_halfcomplex_packed_fourstep,
        )

        y = irfft_halfcomplex_packed_fourstep(
            acc.real, acc.imag, 2 * b, second_half_only=True,
            bin0r=bin0.real, bin0i=bin0.imag,
        )
    else:
        y = jnp.fft.irfft(_unpack_with_bin0(acc, bin0), n=2 * b)[:, b:]
    y = y.reshape(t_out, c, b).transpose(1, 0, 2).reshape(c, t_out * b)
    return y[:, :window_len]
