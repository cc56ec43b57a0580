"""Offline belief pretraining: the SAVi AudioGoalPredictor pipeline.

Reference: ss_baselines/savi/pretraining/ — `AudioGoalDataset` builds
(spectrogram -> category + relative goal location) samples from scene graphs
and RIR files, and `audiogoal_trainer.py:23-258` fits a resnet predictor
with CE + MSE. Here the dataset is generated as one batched device
computation over the RIR bank (no file I/O per sample) and training is a
jitted optax loop over the same BeliefPredictorNet the online path uses.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from soundspaces_tpu.env.structs import DeviceScene
from soundspaces_tpu.ops.partitioned import partitioned_windowed_convolve
from soundspaces_tpu.ops.stft import spectrogram
from soundspaces_tpu.savi.belief import BeliefPredictorNet
from soundspaces_tpu.scene.banks import SceneAssets


def build_audiogoal_dataset(
    assets: SceneAssets,
    num_samples: int,
    seed: int = 0,
    category_of_sound=None,
):
    """Returns dict of arrays: spectrogram [B, F, T, 2], location [B, 2]
    (goal in the agent frame, meters), category [B] int32."""
    scene = DeviceScene.from_assets(assets)
    g, ac = assets.graph, assets.acoustics
    rng = np.random.default_rng(seed)
    n = num_samples
    nodes = rng.integers(0, g.num_nodes, n).astype(np.int32)
    rots = rng.integers(0, 4, n).astype(np.int32)
    slots = rng.integers(0, len(ac.goal_nodes), n).astype(np.int32)
    sounds = rng.integers(0, ac.seg_fft.shape[0], n).astype(np.int32)
    idxs = np.zeros(n, np.int32)

    @jax.jit
    def render(scene, nodes, rots, slots, sounds, idxs):
        def one(node, rot, slot, sound, idx):
            az = (4 - rot) % 4
            rir = scene.rir[az, node, slot].astype(jnp.float32)
            seg = scene.seg_block_fft[sound, idx]
            audio = partitioned_windowed_convolve(
                seg, rir, scene.sampling_rate, scene.conv_block
            )
            return spectrogram(audio)

        return jax.vmap(one)(nodes, rots, slots, sounds, idxs)

    specs = np.asarray(
        render(scene, jnp.asarray(nodes), jnp.asarray(rots), jnp.asarray(slots),
               jnp.asarray(sounds), jnp.asarray(idxs))
    )

    goal_nodes = np.asarray(ac.goal_nodes)[slots]
    delta = g.points[goal_nodes] - g.points[nodes]
    # rotate into the agent frame (orientation (270 - 90*rot) degrees)
    th = np.deg2rad(270.0 - 90.0 * rots)
    fx = np.cos(th) * delta[:, 0] + np.sin(th) * delta[:, 2]
    fy = -np.sin(th) * delta[:, 0] + np.cos(th) * delta[:, 2]
    location = np.stack([fx, fy], -1).astype(np.float32)
    if category_of_sound is None:
        category = (sounds % 21).astype(np.int32)
    else:
        category = np.asarray([category_of_sound[s] for s in sounds], np.int32)
    return {"spectrogram": specs, "location": location, "category": category}


@dataclasses.dataclass
class PretrainResult:
    params: dict
    history: list[dict]


def pretrain_audiogoal_predictor(
    dataset: dict[str, np.ndarray],
    num_categories: int = 21,
    batch_size: int = 64,
    num_epochs: int = 10,
    lr: float = 1e-3,
    seed: int = 0,
    regress_location: bool = True,
    predict_label: bool = True,
) -> PretrainResult:
    """The audiogoal_trainer.py loop: CE(category) + MSE(location)."""
    net = BeliefPredictorNet(num_categories)
    rng = jax.random.PRNGKey(seed)
    params = net.init(rng, jnp.asarray(dataset["spectrogram"][:2]))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, spec, loc, cat):
        def loss_fn(p):
            pred_loc, logits = net.apply(p, spec)
            total = 0.0
            aux = {}
            if regress_location:
                mse = ((pred_loc - loc) ** 2).sum(-1).mean()
                total = total + mse
                aux["mse"] = mse
            if predict_label:
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, cat
                ).mean()
                acc = (jnp.argmax(logits, -1) == cat).mean()
                total = total + ce
                aux["ce"] = ce
                aux["accuracy"] = acc
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux

    n = dataset["spectrogram"].shape[0]
    np_rng = np.random.default_rng(seed)
    history = []
    for epoch in range(num_epochs):
        perm = np_rng.permutation(n)
        metrics = []
        for i in range(0, n - batch_size + 1, batch_size):
            sel = perm[i : i + batch_size]
            params, opt_state, aux = step(
                params,
                opt_state,
                jnp.asarray(dataset["spectrogram"][sel]),
                jnp.asarray(dataset["location"][sel]),
                jnp.asarray(dataset["category"][sel]),
            )
            metrics.append(jax.device_get(aux))
        history.append(
            {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
        )
    return PretrainResult(params=params, history=history)
