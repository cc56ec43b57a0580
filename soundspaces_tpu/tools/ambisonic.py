"""Ambisonic -> binaural decoding as batched MXU matmuls.

The reference shells out to a prebuilt C++ `AmbisonicBinauralizer` executable
over scenes x 4 headings with 160 threads (scripts/ambisonic_to_binaural.py:
14-48) to HRTF-decode ambisonic RIRs into per-heading binaural RIRs. The
operation is linear — binaural[ch] = sum_c decode[ch, c] (x) ambi[c] — so on
TPU it is one batched einsum against a per-heading decode matrix, running
over the whole RIR bank at once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def hrtf_decode_matrix(heading_deg: int = 0) -> np.ndarray:
    """First-order (ACN/SN3D: W, Y, Z, X) -> binaural decode matrix [2, 4].

    A virtual-speaker cardioid decode at +/-90 degrees from the heading with
    an ILD emphasis — the standard matrix-decode structure the reference's
    binauralizer implements with measured HRTFs. Swap in measured HRTF
    coefficients for production datasets.
    """
    out = np.zeros((2, 4), np.float32)
    h = np.deg2rad(heading_deg)
    for ch, ear in enumerate((-1.0, 1.0)):  # left, right
        az = h + ear * np.pi / 2  # ear axis direction
        # cardioid pointing along the ear axis: 0.5*(W + X*cos + Y*sin)
        out[ch, 0] = 0.5
        out[ch, 3] = 0.5 * np.cos(az)  # X
        out[ch, 1] = 0.5 * np.sin(az)  # Y
        out[ch, 2] = 0.0  # Z
    return out


@jax.jit
def ambisonic_to_binaural(ambi: jax.Array, decode: jax.Array) -> jax.Array:
    """ambi: [..., 4, n_samples] first-order ambisonic IRs;
    decode: [2, 4] (or [..., 2, 4] broadcastable). Returns [..., 2, n]."""
    return jnp.einsum("...cn,ec->...en", ambi, decode)


def decode_rir_bank(ambi_bank: np.ndarray) -> np.ndarray:
    """[N, G, 4, L] ambisonic bank -> [4(headings), N, G, 2, L] binaural,
    the scripts/ambisonic_to_binaural.py batch job as four einsums."""
    out = []
    for angle in (0, 90, 180, 270):
        dec = jnp.asarray(hrtf_decode_matrix(angle))
        out.append(np.asarray(ambisonic_to_binaural(jnp.asarray(ambi_bank), dec)))
    return np.stack(out, axis=0)
