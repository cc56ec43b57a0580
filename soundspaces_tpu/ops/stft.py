"""STFT-magnitude spectrogram as MXU work.

The reference computes, per env per step, on host CPU:
  librosa.stft(ch, n_fft=512, hop=160, win=400) -> |.| -> block_reduce(4,4,mean)
  -> log1p -> stack 2 channels  (soundspaces/tasks/nav.py:86-100).

Here the whole pipeline is one fused batched computation: the windowed DFT is
expressed as a strided 1-D convolution against a [n_fft, 2*(n_fft//2+1)] real
DFT basis, which XLA tiles straight onto the MXU; magnitude, 4x4 mean-pool and
log1p fuse into the same HLO program. No FFTs, no host round-trips, and the
batch axis is free parallelism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _dft_conv_kernel(n_fft: int, win_length: int, dtype_name: str) -> np.ndarray:
    """Real/imag windowed-DFT basis as a conv kernel [n_fft, 1, 2*(n_fft//2+1)].

    kernel[n, 0, f]        =  win[n] * cos(2*pi*f*n/n_fft)
    kernel[n, 0, F + f]    = -win[n] * sin(2*pi*f*n/n_fft)
    with the periodic-hann window zero-padded centered to n_fft, matching
    librosa.stft defaults.
    """
    nf = n_fft // 2 + 1
    n = np.arange(win_length)
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))

    idx_n = np.arange(n_fft)[:, None]
    idx_f = np.arange(nf)[None, :]
    ang = 2.0 * np.pi * idx_f * idx_n / n_fft
    real = window[:, None] * np.cos(ang)
    imag = -window[:, None] * np.sin(ang)
    # cache host-side numpy (never a traced value — a jnp array created inside
    # a jit/shard_map trace must not be cached across traces)
    kernel = np.concatenate([real, imag], axis=1)[:, None, :]  # [n_fft, 1, 2F]
    return kernel.astype(np.dtype(dtype_name))


def _stft_re_im(
    x: jax.Array,  # [B, n_samples]
    n_fft: int,
    hop_length: int,
    win_length: int,
    precision,
    via: str = "matmul",
) -> jax.Array:
    """Windowed DFT -> [B, n_frames, 2F]. `matmul` gathers explicit frames
    and hits the MXU with one [B*T, n_fft] @ [n_fft, 2F] product; `conv`
    expresses the same thing as a strided convolution."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    kernel = _dft_conv_kernel(n_fft, win_length, str(x.dtype))
    if via == "conv":
        return jax.lax.conv_general_dilated(
            x[:, :, None],
            kernel,
            window_strides=(hop_length,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=precision,
        )
    b, n = x.shape
    n_frames = 1 + (n - n_fft) // hop_length
    w = kernel[:, 0, :]  # [n_fft, 2F]
    c = np.gcd(hop_length, n_fft)
    if c >= 32:
        # gather 32+-sample CHUNKS instead of scalars: 'c'x fewer gather
        # indices, each moving a contiguous lane-aligned vector — measured
        # ~15% faster than the scalar frame gather on TPU
        s, h = n_fft // c, hop_length // c
        m_need = (n_frames - 1) * h + s
        pad = m_need * c - n
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (0, pad)))
        chunks = x[:, : m_need * c].reshape(b, m_need, c)
        cidx = (
            jnp.arange(n_frames)[:, None] * h + jnp.arange(s)[None, :]
        )  # [T, S]
        fr = chunks[:, cidx]  # [B, T, S, c]
        w4 = w.reshape(s, c, -1)
        return jnp.einsum("btsc,scf->btf", fr, w4, precision=precision)
    idx = (
        jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )  # [T, n_fft]
    frames = x[:, idx]  # [B, T, n_fft]
    return jnp.einsum(
        "btn,nf->btf", frames, w, precision=precision
    )


def stft_magnitude(
    signal: jax.Array,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    # HIGH = 3-pass bfloat16 ~ f32 accuracy at twice the MXU rate of
    # HIGHEST (6-pass); parity tests pass at float32 tolerance either way
    precision=jax.lax.Precision.HIGH,
) -> jax.Array:
    """|STFT| with librosa semantics. signal: [..., n_samples] ->
    [..., 1 + n_fft//2, n_frames]."""
    batch_shape = signal.shape[:-1]
    n_samples = signal.shape[-1]
    x = signal.reshape((-1, n_samples))

    out = _stft_re_im(x, n_fft, hop_length, win_length, precision)
    nf = n_fft // 2 + 1
    re, im = out[..., :nf], out[..., nf:]
    mag = jnp.sqrt(re * re + im * im)  # [B, n_frames, F]
    mag = jnp.swapaxes(mag, -1, -2)  # [B, F, n_frames]
    return mag.reshape(batch_shape + mag.shape[1:])


def _stft_magnitude_tf(
    x: jax.Array,  # [B, n_samples]
    n_fft: int,
    hop_length: int,
    win_length: int,
    precision=jax.lax.Precision.HIGH,
) -> jax.Array:
    """|STFT| in [B, n_frames, F] layout (no transpose of the large tensor;
    callers that pool should pool in this layout and transpose the small
    pooled result instead)."""
    out = _stft_re_im(x, n_fft, hop_length, win_length, precision)
    nf = n_fft // 2 + 1
    re, im = out[..., :nf], out[..., nf:]
    return jnp.sqrt(re * re + im * im)


def _block_reduce_mean(x: jax.Array, block: tuple[int, int]) -> jax.Array:
    """Mean-pool trailing two axes in non-overlapping blocks, zero-padding each
    axis at the end (skimage.block_reduce cval=0 semantics)."""
    bh, bw = block
    h, w = x.shape[-2], x.shape[-1]
    ph, pw = (-h) % bh, (-w) % bw
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    x = jnp.pad(x, pad)
    nh, nw = (h + ph) // bh, (w + pw) // bw
    x = x.reshape(x.shape[:-2] + (nh, bh, nw, bw))
    return x.mean(axis=(-3, -1))


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_fft", "hop_length", "win_length", "block", "use_pallas",
        "nonzero_len",
    ),
)
def spectrogram(
    audio: jax.Array,
    n_fft: int = 512,
    hop_length: int = 160,
    win_length: int = 400,
    block: tuple[int, int] = (4, 4),
    use_pallas: bool = False,
    nonzero_len: int | None = None,
) -> jax.Array:
    """Binaural audio [..., 2, n_samples] -> spectrogram
    [..., ceil(F/4), ceil(T/4), 2], matching the reference
    SpectrogramSensor output bit-for-bit up to float32 rounding.

    use_pallas pins the |.|->pool->log1p tail into one hand-fused VMEM
    kernel (ops/pallas_kernels.py).

    nonzero_len declares that audio[..., nonzero_len:] is all zero (the
    continuous mode's step_time window zero-padded to 1 s,
    continuous_simulator.py:454): frames past the nonzero prefix have
    exactly-zero magnitude and are emitted as zeros instead of computed —
    the OUTPUT IS IDENTICAL, only the DFT work shrinks to the prefix."""
    if use_pallas:
        from soundspaces_tpu.ops.pallas_kernels import fused_magnitude_pool_log1p

        batch_shape = audio.shape[:-1]
        x = audio.reshape((-1, audio.shape[-1]))
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        kernel = _dft_conv_kernel(n_fft, win_length, str(x.dtype))
        out = jax.lax.conv_general_dilated(
            xp[:, :, None], kernel, window_strides=(hop_length,),
            padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        nf = n_fft // 2 + 1
        re = jnp.swapaxes(out[..., :nf], -1, -2)  # [B, F, T]
        im = jnp.swapaxes(out[..., nf:], -1, -2)
        red = fused_magnitude_pool_log1p(re, im, block)
        red = red.reshape(batch_shape + red.shape[1:])
        return jnp.moveaxis(red, -3, -1)
    batch_shape = audio.shape[:-1]
    x = audio.reshape((-1, audio.shape[-1]))
    n_samples = x.shape[-1]
    t_full = 1 + n_samples // hop_length
    tp_full = -(-t_full // block[1])
    if nonzero_len is not None and nonzero_len < n_samples:
        pad = n_fft // 2
        # frames whose (center-padded) window touches the nonzero prefix,
        # rounded up to whole pool blocks + one block of margin so the
        # truncated signal's right reflect-pad reflects only zeros
        t_nz = -(-(pad + nonzero_len) // hop_length)
        t_keep = min((-(-t_nz // block[1]) + 1) * block[1], t_full)
        if t_keep < t_full:
            n_cut = (t_keep - 1) * hop_length
            x = x[:, :n_cut]
    mag_tf = _stft_magnitude_tf(x, n_fft, hop_length, win_length)  # [B,T,F]
    # pool in [T, F] layout (blocks are symmetric), then transpose the SMALL
    # pooled tensor to the reference's [F', T'] — transposing the full
    # [B, T, F] magnitude first costs a large relayout pass
    red = _block_reduce_mean(mag_tf, (block[1], block[0]))  # [B, T', F']
    red = jnp.log1p(jnp.swapaxes(red, -1, -2))  # [B, F', T']
    if red.shape[-1] < tp_full:  # zero frames skipped by nonzero_len
        red = jnp.pad(red, ((0, 0), (0, 0), (0, tp_full - red.shape[-1])))
    red = red.reshape(batch_shape + red.shape[1:])
    return jnp.moveaxis(red, -3, -1)  # channel axis (2) to last


def spectrogram_shape(n_samples: int, n_fft: int = 512, hop_length: int = 160,
                      block: tuple[int, int] = (4, 4)) -> tuple[int, int, int]:
    """Static output shape [F', T', 2] of `spectrogram` for one env."""
    nf = n_fft // 2 + 1
    frames = 1 + n_samples // hop_length
    return (-(-nf // block[0]), -(-frames // block[1]), 2)
