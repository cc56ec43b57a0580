"""Goal-belief predictors: category (21-way) + location (x, y) from the
binaural spectrogram, with temporal smoothing across steps.

Reference: BeliefPredictor (ss_baselines/savi/models/belief_predictor.py:
55-226): two resnet18 heads over the 2-channel spectrogram; location
predictions are averaged with the previous estimate transformed into the
current agent frame by pose odometry (update 136-202, base_to_odom/
odom_to_base 210-226); trained online from rollouts against ground-truth
pointgoal/category with MSE + CE masked by audibility
(savi/ppo/ppo_trainer.py:342-404)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from soundspaces_tpu.models.encoders import _ConvStack


class BeliefPredictorNet(nn.Module):
    """Conv trunk + two heads (the reference's resnet18 capacity class)."""

    num_categories: int = 21

    @nn.compact
    def __call__(self, spectrogram):
        trunk = _ConvStack(
            kernels=((5, 5), (3, 3), (3, 3)),
            strides=((2, 2), (2, 2), (1, 1)),
            output_size=256,
            channels=(32, 64, 64),
        )(spectrogram)
        location = nn.Dense(2)(trunk)
        category_logits = nn.Dense(self.num_categories)(trunk)
        return location, category_logits


class BeliefPredictor:
    """Functional wrapper: predict + smooth + online training step."""

    def __init__(self, num_categories: int = 21, lr: float = 1e-4):
        self.net = BeliefPredictorNet(num_categories)
        self.optimizer = optax.adam(lr)

    def init(self, rng, spectrogram):
        params = self.net.init(rng, spectrogram)
        return params, self.optimizer.init(params)

    def predict(self, params, spectrogram):
        return self.net.apply(params, spectrogram)

    @staticmethod
    def smooth_location(
        prev_belief: jax.Array,  # [N, 2] previous location belief (agent frame)
        fresh: jax.Array,  # [N, 2] new prediction (agent frame)
        delta_pose: jax.Array,  # [N, 3] (dx, dy, dheading) agent motion since
        weight: float = 0.5,
        first_step: jax.Array | None = None,  # [N] bool
    ) -> jax.Array:
        """Transform the previous belief into the current frame and average
        (belief_predictor.py:136-202 with weighting_factor)."""
        dx, dy, dh = delta_pose[..., 0], delta_pose[..., 1], delta_pose[..., 2]
        # previous goal estimate relative to the old frame, moved into new
        px = prev_belief[..., 0] - dx
        py = prev_belief[..., 1] - dy
        c, s = jnp.cos(-dh), jnp.sin(-dh)
        prev_in_new = jnp.stack([c * px - s * py, s * px + c * py], -1)
        mixed = weight * prev_in_new + (1.0 - weight) * fresh
        if first_step is not None:
            mixed = jnp.where(first_step[..., None], fresh, mixed)
        return mixed

    def loss(self, params, spectrogram, gt_location, gt_category, audible_mask):
        """MSE(location) + CE(category), masked by non-silent steps
        (ppo_trainer.py:342-404)."""
        loc, logits = self.net.apply(params, spectrogram)
        m = audible_mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum(), 1.0)
        mse = (((loc - gt_location) ** 2).sum(-1) * m).sum() / denom
        ce = (
            optax.softmax_cross_entropy_with_integer_labels(logits, gt_category)
            * m
        ).sum() / denom
        return mse + ce, {"belief_mse": mse, "belief_ce": ce}

    def update(self, params, opt_state, spectrogram, gt_location, gt_category,
               audible_mask, axis_name=None):
        (loss, aux), grads = jax.value_and_grad(self.loss, has_aux=True)(
            params, spectrogram, gt_location, gt_category, audible_mask
        )
        if axis_name is not None:
            # the reference DDP-wraps the predictor so its grads all-reduce
            # like the policy's (savi/models/belief_predictor.py:19-52)
            grads = jax.lax.pmean(grads, axis_name)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux
