"""Pallas TPU kernels for the sensor post-processing hot path.

The spectrogram pipeline ends with |.| -> 4x4 mean-pool -> log1p over the
windowed-DFT output (soundspaces/tasks/nav.py:92-97). XLA fuses these well
already; this kernel exists to (a) pin the fusion (one VMEM round-trip per
env regardless of compiler mood) and (b) serve as the template for further
hand-fused stages. It is opt-in via spectrogram(..., use_pallas=True) and
falls back to interpret mode off-TPU, so the numerical contract is identical
everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mag_pool_log1p_kernel(re_ref, im_ref, out_ref, *, block_h, block_w):
    re = re_ref[0]
    im = im_ref[0]
    mag = jnp.sqrt(re * re + im * im)
    h, w = mag.shape
    pooled = mag.reshape(h // block_h, block_h, w // block_w, block_w).mean(
        axis=(1, 3)
    )
    out_ref[0] = jnp.log1p(pooled)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def fused_magnitude_pool_log1p(
    re: jax.Array,
    im: jax.Array,
    block: tuple[int, int] = (4, 4),
    interpret: bool = False,
) -> jax.Array:
    """re/im: [B, F, T] STFT components -> [B, ceil(F/bh), ceil(T/bw)]
    log1p(mean-pool(|stft|)) with skimage block_reduce zero-padding
    semantics."""
    bh, bw = block
    b, f, t = re.shape
    ph, pw = (-f) % bh, (-t) % bw
    if ph or pw:
        pad = ((0, 0), (0, ph), (0, pw))
        re = jnp.pad(re, pad)
        im = jnp.pad(im, pad)
    fh, tw = f + ph, t + pw

    kernel = functools.partial(
        _mag_pool_log1p_kernel, block_h=bh, block_w=bw
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, fh // bh, tw // bw), re.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, fh, tw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fh, tw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, fh // bh, tw // bw), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(re, im)
