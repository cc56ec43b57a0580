"""Four-step (Bailey) FFT as MXU matmuls.

XLA's TPU FFT is the bottleneck of the audio hot path: the irfft stage of the
partitioned convolution runs thousands of 16k-point transforms per env step
and does not map onto the MXU. The four-step factorization N = n1*n2 turns
one size-N FFT into n2 size-n1 DFTs + twiddles + n1 size-n2 DFTs — and for
n1 = n2 = 128 each DFT batch IS a [.., 128] x [128, 128] matmul: pure MXU
work. ~70x the FLOPs of Cooley-Tukey, ~orders more FLOP/s.

The inverse-real transform additionally packs PAIRS of Hermitian spectra
into one complex inverse FFT (z = ifft(A + iB) -> a = Re z, b = Im z),
cancelling the 2x waste of running a complex transform for real output.

Complex arrays are carried as (real, imag) float32 pairs so every product
lowers to real matmuls (and the tunnel's complex-transfer bug is moot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _dft_matrices(n1: int, n2: int, inverse: bool):
    """(F1 [n1, n1], F2 [n2, n2], twiddle [n1, n2]) as (re, im) numpy pairs."""
    sign = 2.0 if inverse else -2.0
    a1 = np.arange(n1)
    a2 = np.arange(n2)
    # sign carries the factor 2: exp(sign * i * pi * ak / n) = W_n^{±ak}
    f1 = np.exp(sign * 1j * np.pi * np.outer(a1, a1) / n1)
    f2 = np.exp(sign * 1j * np.pi * np.outer(a2, a2) / n2)
    # twiddle W_N^{k1*b} with N = n1*n2
    tw = np.exp(sign * 1j * np.pi * np.outer(a1, a2) / (n1 * n2))
    as_pair = lambda m: (
        np.ascontiguousarray(m.real.astype(np.float32)),
        np.ascontiguousarray(m.imag.astype(np.float32)),
    )
    return as_pair(f1), as_pair(f2), as_pair(tw)


def _cmatmul(ar, ai, br, bi, precision):
    """(ar + i ai) @ (br + i bi) -> (re, im), 4 real matmuls on the MXU."""
    dot = functools.partial(jnp.matmul, precision=precision)
    return dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n1", "n2", "inverse", "precision", "out_second_half", "out_part"
    ),
)
def fft_fourstep(
    xr: jax.Array,  # [B, N] real part
    xi: jax.Array,  # [B, N] imag part
    n1: int = 128,
    n2: int = 128,
    inverse: bool = False,
    precision=jax.lax.Precision.HIGH,
    out_second_half: bool = False,
    out_part: str = "both",
):
    """Complex FFT/iFFT of size N = n1*n2 along the last axis.
    Returns (re, im). The inverse includes the 1/N factor.

    out_second_half: return only output indices [N/2, N) — the overlap-save
    keep region. Output index j = k2*n1 + k1, so j >= N/2 <=> k2 >= n2/2:
    the step-3 DFT contracts with only the upper half of F2's columns,
    halving its matmul FLOPs and the output write.

    out_part: "re"/"im" skip half of step 3's matmuls and return None for
    the other component — for callers that consume only one part."""
    b, n = xr.shape
    assert n == n1 * n2
    (f1r, f1i), (f2r, f2i), (twr, twi) = _dft_matrices(n1, n2, inverse)
    if out_second_half:
        assert n2 % 2 == 0
        f2r, f2i = f2r[:, n2 // 2 :], f2i[:, n2 // 2 :]

    # view as [B, n1, n2]: x[a, b] = x[a*n2 + b]
    xr_ = xr.reshape(b, n1, n2)
    xi_ = xi.reshape(b, n1, n2)

    # step 1: DFT over the a-axis (size n1): contract with F1
    # y[k1, b] = sum_a F1[k1, a] x[a, b]  -> einsum over axis 1
    yr = jnp.einsum("ka,xab->xkb", f1r, xr_, precision=precision) - jnp.einsum(
        "ka,xab->xkb", f1i, xi_, precision=precision
    )
    yi = jnp.einsum("ka,xab->xkb", f1r, xi_, precision=precision) + jnp.einsum(
        "ka,xab->xkb", f1i, xr_, precision=precision
    )

    # step 2: twiddle W^{k1*b}
    zr = yr * twr[None] - yi * twi[None]
    zi = yr * twi[None] + yi * twr[None]

    # step 3: DFT over the b-axis (size n2)
    out_n = n // 2 if out_second_half else n
    scale = float(n) if inverse else 1.0
    outr = outi = None
    if out_part in ("both", "re"):
        wr = jnp.einsum(
            "xkb,bm->xkm", zr, f2r, precision=precision
        ) - jnp.einsum("xkb,bm->xkm", zi, f2i, precision=precision)
        outr = jnp.swapaxes(wr, 1, 2).reshape(b, out_n) / scale
    if out_part in ("both", "im"):
        wi = jnp.einsum(
            "xkb,bm->xkm", zr, f2i, precision=precision
        ) + jnp.einsum("xkb,bm->xkm", zi, f2r, precision=precision)
        outi = jnp.swapaxes(wi, 1, 2).reshape(b, out_n) / scale
    # step 4: output index X[k2*n1 + k1] = w[k1, k2] -> transposed above
    return outr, outi


@functools.partial(
    jax.jit, static_argnames=("n", "precision", "second_half_only")
)
def irfft_halfcomplex_fourstep(
    specr: jax.Array,  # [B, F] real part of rFFT half-spectra, F = n//2+1
    speci: jax.Array,  # [B, F]
    n: int,
    precision=jax.lax.Precision.HIGH,
    second_half_only: bool = False,
):
    """Inverse real FFT via the half-size complex transform: the Hermitian
    spectrum folds into an n/2-point complex iFFT (E + iO split), so no
    full-spectrum concat is materialized and the transform length halves —
    the classic real-FFT packing, run as four-step matmuls. Works for any
    batch size (no pair packing). Returns [B, n] float32, or its [n/2, n)
    slice when second_half_only."""
    b, f = specr.shape
    assert f == n // 2 + 1 and n % 4 == 0
    half = n // 2
    xr_k, xi_k = specr[:, :half], speci[:, :half]
    # X[n/2 - k] for k = 0..half-1  (pure reverse of columns 1..half)
    xr_nk = specr[:, half:0:-1]
    xi_nk = speci[:, half:0:-1]
    # E = (X[k] + conj(X[n/2-k]))/2 : spectrum of the even samples
    er = 0.5 * (xr_k + xr_nk)
    ei = 0.5 * (xi_k - xi_nk)
    # O = e^{+2pi i k/n} (X[k] - conj(X[n/2-k]))/2 : odd samples' spectrum
    dr = 0.5 * (xr_k - xr_nk)
    di = 0.5 * (xi_k + xi_nk)
    ang = 2.0 * np.pi * np.arange(half) / n
    cr = jnp.asarray(np.cos(ang), specr.dtype)[None]
    ci = jnp.asarray(np.sin(ang), specr.dtype)[None]
    o_r = cr * dr - ci * di
    o_i = cr * di + ci * dr
    # Z = E + iO; z = ifft_{n/2}(Z) = even + i*odd
    zr = er - o_i
    zi = ei + o_r
    n1 = 1 << ((half - 1).bit_length() + 1) // 2
    n2 = half // n1
    outr, outi = fft_fourstep(zr, zi, n1, n2, inverse=True,
                              precision=precision,
                              out_second_half=second_half_only)
    out_n = half if second_half_only else n
    return jnp.stack([outr, outi], axis=-1).reshape(b, out_n)


@functools.partial(jax.jit, static_argnames=("n", "precision"))
def rfft_fourstep(
    x: jax.Array,  # [B, m] real, m <= n
    n: int,
    precision=jax.lax.Precision.HIGH,
):
    """Forward real FFT via the four-step complex transform: pairs of rows
    pack into one complex FFT (B must be even). Returns (re, im) of shape
    [B, n//2+1] == jnp.fft.rfft(x, n)."""
    b, m = x.shape
    assert b % 2 == 0
    if m < n:
        x = jnp.pad(x, ((0, 0), (0, n - m)))
    # z = a + i b for row pairs; FFT(z)[k] splits by Hermitian symmetry:
    # A[k] = (Z[k] + conj(Z[-k]))/2,  B[k] = (Z[k] - conj(Z[-k]))/(2i)
    zr, zi = x[0::2], x[1::2]
    n1 = 1 << (((n - 1).bit_length() + 1) // 2)
    n2 = n // n1
    fr, fi = fft_fourstep(zr, zi, n1, n2, inverse=False, precision=precision)
    f = n // 2 + 1
    idx = (-jnp.arange(f)) % n
    zr_k, zi_k = fr[:, :f], fi[:, :f]
    zr_nk, zi_nk = fr[:, idx], fi[:, idx]
    ar = 0.5 * (zr_k + zr_nk)
    ai = 0.5 * (zi_k - zi_nk)
    br_ = 0.5 * (zi_k + zi_nk)
    bi_ = -0.5 * (zr_k - zr_nk)
    out_r = jnp.stack([ar, br_], axis=1).reshape(b, f)
    out_i = jnp.stack([ai, bi_], axis=1).reshape(b, f)
    return out_r, out_i


@functools.partial(
    jax.jit, static_argnames=("n", "precision", "second_half_only")
)
def irfft_halfcomplex_packed_fourstep(
    packr: jax.Array,  # [B, n//2] re of DC/Nyquist-packed half-spectra
    packi: jax.Array,  # [B, n//2] im (bin 0 imag holds the Nyquist bin)
    n: int,
    precision=jax.lax.Precision.HIGH,
    second_half_only: bool = False,
    bin0r: jax.Array | None = None,  # [B, 1] override: DC value
    bin0i: jax.Array | None = None,  # [B, 1] override: Nyquist value
):
    """irfft_halfcomplex_fourstep for DC/Nyquist-PACKED spectra: bin 0
    carries complex(X[0].re, X[n/2].re) — both real for real signals — so
    the stored spectrum is exactly [.., n/2] instead of [.., n/2+1]. The
    2^k frequency width keeps bank rows TPU-tile aligned (a 16385-wide f32
    row misaligns every (8, 128) tile: measured 1.76x slower HBM gathers at
    production shapes). Packing is lossless; output equals
    jnp.fft.irfft(unpacked, n) to float32 rounding."""
    b, half = packr.shape
    assert half == n // 2 and n % 4 == 0
    # Hermitian fold z = A(.)X_k + B(.)conj(X_{N-k}), A = (1 + i W)/2,
    # B = (1 - i W)/2, W[k] = e^{2*pi*i*k/n}. The mirrored spectrum is a
    # static take (k -> (N-k) mod N): measured faster than reverse-slice,
    # concat, or roll formulations on TPU. Bin-0 specials (DC imag is 0;
    # the mirror's bin 0 is the Nyquist value packed in bin-0 imag) are
    # iota-mask selects, which fuse into the elementwise combine. Callers
    # whose bin 0 is stale (e.g. the raw packed accumulation, whose bin-0
    # products mix the DC/Nyquist components) pass the correct values via
    # bin0r/bin0i — substituted inside the selects already being performed,
    # so the fix costs nothing extra.
    dc = packr[:, :1] if bin0r is None else bin0r
    ny = packi[:, :1] if bin0i is None else bin0i
    mirror = (half - jnp.arange(half)) % half
    bin0 = jnp.arange(half)[None, :] == 0
    xr_k = jnp.where(bin0, dc, packr)
    xi_k = jnp.where(bin0, 0.0, packi)
    xr_nk = jnp.where(bin0, ny, jnp.take(packr, mirror, axis=1))
    xi_nk = jnp.where(bin0, 0.0, jnp.take(packi, mirror, axis=1))
    er = 0.5 * (xr_k + xr_nk)
    ei = 0.5 * (xi_k - xi_nk)
    dr = 0.5 * (xr_k - xr_nk)
    di = 0.5 * (xi_k + xi_nk)
    ang = 2.0 * np.pi * np.arange(half) / n
    cr = jnp.asarray(np.cos(ang), packr.dtype)[None]
    ci = jnp.asarray(np.sin(ang), packr.dtype)[None]
    o_r = cr * dr - ci * di
    o_i = cr * di + ci * dr
    zr = er - o_i
    zi = ei + o_r
    n1 = 1 << ((half - 1).bit_length() + 1) // 2
    n2 = half // n1
    outr, outi = fft_fourstep(zr, zi, n1, n2, inverse=True,
                              precision=precision,
                              out_second_half=second_half_only)
    out_n = half if second_half_only else n
    return jnp.stack([outr, outi], axis=-1).reshape(b, out_n)


@functools.partial(
    jax.jit, static_argnames=("n", "precision", "second_half_only")
)
def irfft_pairs_fourstep(
    specr: jax.Array,  # [B, F] real part of rFFT half-spectra, F = n//2+1
    speci: jax.Array,  # [B, F]
    n: int,
    precision=jax.lax.Precision.HIGH,
    second_half_only: bool = False,
):
    """Batched inverse real FFT via Hermitian pair packing: consecutive rows
    (2j, 2j+1) share one complex inverse transform. B must be even.
    Returns [B, n] float32 == jnp.fft.irfft(spec, n) — or its [n/2, n)
    slice when second_half_only (the overlap-save keep region; halves the
    final DFT stage).

    NOTE: the production convolution uses irfft_halfcomplex_fourstep (no
    full-spectrum concat — measured faster); this realization is kept as a
    reference/benchmark alternative."""
    b, f = specr.shape
    assert b % 2 == 0 and f == n // 2 + 1
    # rebuild full spectra: X[n-k] = conj(X[k])
    tail_r = specr[:, 1:-1][:, ::-1]
    tail_i = -speci[:, 1:-1][:, ::-1]
    fullr = jnp.concatenate([specr, tail_r], axis=1)  # [B, n]
    fulli = jnp.concatenate([speci, tail_i], axis=1)
    # pack pairs: z = A + i B  (A = even rows, B = odd rows)
    ar, ai = fullr[0::2], fulli[0::2]
    br_, bi_ = fullr[1::2], fulli[1::2]
    zr = ar - bi_
    zi = ai + br_
    n1 = 1 << ((n - 1).bit_length() + 1) // 2
    n2 = n // n1
    outr, outi = fft_fourstep(zr, zi, n1, n2, inverse=True,
                              precision=precision,
                              out_second_half=second_half_only)
    # a = Re z, b = Im z  (exact because a and b are real signals)
    out_n = n // 2 if second_half_only else n
    out = jnp.stack([outr, outi], axis=1).reshape(b, out_n)
    return out
