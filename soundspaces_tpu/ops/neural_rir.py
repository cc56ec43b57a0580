"""Neural RIR field: learned per-pose RIR synthesis, fully on device.

A FAST-RIR-style (arxiv 2110.04057, PAPERS.md) neural generator distilled
from this repo's native C++ ray tracer (csrc/rir_tracer.cpp — the engine
standing in for RLRAudioPropagation, soundspaces/continuous_simulator.py:
115-126). The Monte-Carlo tracer is geometry-exact but host-bound; the
parametric synthesizer (ops/parametric_rir.py) is device-native but
closed-form. This module closes the gap: a tiny Fourier-feature MLP learns
the SCENE-SPECIFIC reverberant energy field from traced examples, then
serves pose-exact RIRs on device at full jit/vmap batch rates — MLP matmuls
are ideal MXU work, and the synthesis tail reuses the static band-noise
carriers (temporally coherent across steps like the reference's
temporalCoherence mode).

Decomposition (what is learned vs computed):
- direct path: analytic — distance delay + Woodworth ITD + sinusoidal ILD,
  identical conventions to parametric/bank modes (drop-in interchangeable);
- diffuse field: LEARNED — the MLP maps normalized (listener, source)
  coordinates to per-band log energy envelopes [num_bands, num_frames];
  training distills band-filtered Schroeder-style envelopes of traced RIRs;
- carrier: the static band_noise_tables, envelope-modulated per band.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from soundspaces_tpu.ops.parametric_rir import (
    DEFAULT_BAND_EDGES,
    SPEED_OF_SOUND,
    _binaural_impulse,
    band_noise_tables,
)


class NeuralRIRField(nn.Module):
    """Fourier-feature MLP: (lx, lz, sx, sz) in scene-normalized [0, 1]
    coords -> per-band log1p energy envelopes [num_bands, num_frames]."""

    hidden: int = 128
    num_bands: int = 4
    num_frames: int = 32
    num_freqs: int = 6  # Fourier feature octaves per coordinate

    @nn.compact
    def __call__(self, coords: jax.Array) -> jax.Array:
        # coords [..., 4] normalized; returns [..., num_bands, num_frames]
        k = 2.0 ** jnp.arange(self.num_freqs)
        ang = coords[..., :, None] * k[None, :] * np.pi  # [..., 4, K]
        feats = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1
        ).reshape(coords.shape[:-1] + (4 * 2 * self.num_freqs,))
        h = nn.Dense(self.hidden)(feats)
        h = nn.relu(h)
        h = nn.Dense(self.hidden)(h)
        h = nn.relu(h)
        out = nn.Dense(self.num_bands * self.num_frames)(h)
        return out.reshape(
            coords.shape[:-1] + (self.num_bands, self.num_frames)
        )


def normalize_coords(x, z, sx, sz, bbox_min, bbox_max):
    ext = jnp.maximum(bbox_max - bbox_min, 1e-3)
    return jnp.stack(
        [
            (x - bbox_min[0]) / ext[0],
            (z - bbox_min[1]) / ext[1],
            (sx - bbox_min[0]) / ext[0],
            (sz - bbox_min[1]) / ext[1],
        ],
        axis=-1,
    )


@functools.partial(
    jax.jit, static_argnames=("net", "sampling_rate", "rir_len")
)
def neural_binaural_rir(
    params,
    net: NeuralRIRField,
    x: jax.Array,
    z: jax.Array,
    heading: jax.Array,
    src_x: jax.Array,
    src_z: jax.Array,
    noise: jax.Array,  # [B, 2L] band noise (band_noise_tables)
    bbox_min: jax.Array,  # [2]
    bbox_max: jax.Array,  # [2]
    shift: jax.Array,  # i32 per-episode carrier decorrelation
    sampling_rate: int,
    rir_len: int,
) -> jax.Array:
    """Binaural RIR [2, rir_len] at an exact continuous pose: analytic
    direct path + MLP-predicted per-band diffuse envelopes modulating the
    static carriers."""
    t_idx = jnp.arange(rir_len, dtype=jnp.int32)
    grid_floor = 0.25

    dx, dz = src_x - x, src_z - z
    dist = jnp.maximum(jnp.sqrt(dx * dx + dz * dz), grid_floor)
    bearing = jnp.arctan2(dz, dx) - heading
    rir = _binaural_impulse(t_idx, dist, bearing, 1.0 / dist, sampling_rate)

    coords = normalize_coords(x, z, src_x, src_z, bbox_min, bbox_max)
    log_env = net.apply(params, coords)  # [B, F]
    env = jnp.expm1(jax.nn.softplus(log_env))  # >= 0, log-scale targets

    # upsample [B, F] -> [B, L] with nearest-frame gather (frame edges are
    # what the targets were pooled over)
    n_frames = env.shape[-1]
    frame_of = jnp.clip(
        (t_idx * n_frames) // rir_len, 0, n_frames - 1
    )
    env_l = env[..., frame_of]  # [B, L]

    onset = jnp.round(
        dist / SPEED_OF_SOUND * sampling_rate
    ).astype(jnp.int32)
    l = rir_len
    start = (shift % l).astype(jnp.int32)
    tail = jnp.zeros((l,), jnp.float32)
    for b in range(env_l.shape[0]):
        n_b = jax.lax.dynamic_slice_in_dim(noise[b], start * (b + 1) % l, l)
        tail = tail + n_b * env_l[b]
    tail = tail * (t_idx >= onset)
    return rir + 0.7 * tail[None, :]


# --------------------------------------------------------------------------
# Distillation: traced RIR -> per-band log envelope targets, training loop
# --------------------------------------------------------------------------


def band_envelope_targets(
    rirs: np.ndarray,  # [N, 2, L] traced binaural RIRs
    sampling_rate: int,
    num_frames: int = 32,
    band_edges: tuple = DEFAULT_BAND_EDGES,
) -> np.ndarray:
    """[N, B, F] log1p per-band energy envelopes of the mono mix: rFFT
    band-split, frame-pooled RMS. The direct-path spike is left in — it is
    one frame wide and the analytic impulse dominates it at synthesis."""
    mono = rirs.mean(axis=1)  # [N, L]
    n = mono.shape[-1]
    spec = np.fft.rfft(mono, axis=-1)
    freqs = np.fft.rfftfreq(n, 1.0 / sampling_rate)
    n_bands = len(band_edges) - 1
    frames = np.array_split(np.arange(n), num_frames)
    out = np.zeros((mono.shape[0], n_bands, num_frames), np.float32)
    for b in range(n_bands):
        mask = (freqs >= band_edges[b]) & (freqs < band_edges[b + 1])
        xb = np.fft.irfft(spec * mask, n=n)
        for f, idx in enumerate(frames):
            out[:, b, f] = np.sqrt((xb[:, idx] ** 2).mean(axis=-1))
    return np.log1p(out)


def sample_pose_pairs(
    graph, num: int, seed: int = 0, jitter: float = 0.2
) -> tuple[np.ndarray, np.ndarray]:
    """Random walkable (listener xzh, source xz) pairs for distillation."""
    rng = np.random.default_rng(seed)
    pts = graph.points
    li = rng.integers(0, len(pts), num)
    si = rng.integers(0, len(pts), num)
    recv = np.stack(
        [
            pts[li, 0] + rng.uniform(-jitter, jitter, num),
            pts[li, 2] + rng.uniform(-jitter, jitter, num),
            rng.uniform(0, 2 * np.pi, num),
        ],
        axis=1,
    ).astype(np.float32)
    src = np.stack([pts[si, 0], pts[si, 2]], axis=1).astype(np.float32)
    return recv, src


def train_neural_rir_field(
    graph,
    tracer,  # tools.rir_synth.PoseTracer
    sampling_rate: int,
    rir_len: int,
    num_samples: int = 512,
    steps: int = 1000,
    lr: float = 3e-3,
    seed: int = 0,
    net: NeuralRIRField | None = None,
    batch_size: int = 128,
):
    """Distill the native tracer into a NeuralRIRField for one scene.
    Returns (net, params, final_loss, first_loss)."""
    import optax

    net = net or NeuralRIRField()
    recv, src = sample_pose_pairs(graph, num_samples, seed)
    rirs = tracer(recv, src)  # [N, 2, L] native threaded trace
    targets = band_envelope_targets(
        rirs, sampling_rate, num_frames=net.num_frames
    )
    # drop the direct-path contribution the synthesizer adds analytically:
    # predicting the smooth diffuse field only (targets keep it; the MLP
    # smooths over the one-frame spike which is fine at synthesis)
    pts = graph.points
    bbox_min = jnp.asarray(
        [pts[:, 0].min(), pts[:, 2].min()], jnp.float32
    )
    bbox_max = jnp.asarray(
        [pts[:, 0].max(), pts[:, 2].max()], jnp.float32
    )
    coords = np.asarray(
        normalize_coords(
            jnp.asarray(recv[:, 0]), jnp.asarray(recv[:, 1]),
            jnp.asarray(src[:, 0]), jnp.asarray(src[:, 1]),
            bbox_min, bbox_max,
        )
    )
    targets_inv = np.asarray(targets, np.float32)  # [N, B, F] log1p rms

    params = net.init(
        jax.random.PRNGKey(seed), jnp.asarray(coords[:1])
    )
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, c, y):
        def loss_fn(p):
            pred = net.apply(p, c)  # raw head output
            # train the head so expm1(softplus(head)) matches expm1(target):
            # equivalently match in the log1p domain after softplus
            return jnp.mean((jax.nn.softplus(pred) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed + 1)
    first_loss = None
    loss = None
    for i in range(steps):
        idx = rng.integers(0, num_samples, batch_size)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(coords[idx]),
            jnp.asarray(targets_inv[idx]),
        )
        if first_loss is None:
            first_loss = float(loss)
    return net, params, float(loss), float(first_loss)
