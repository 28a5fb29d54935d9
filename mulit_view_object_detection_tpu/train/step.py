"""Train/eval step construction: pure jitted functions over a TrainState.

Replaces the reference's Keras compile/fit machinery (model_multi.py:
2658-2707, 2901-2912) with an optax/flax train step: forward (with on-device
detection-target sampling), five losses + L2 regularization, masked
gradients for stage-wise freezing, SGD+momentum with per-tensor clipnorm.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import losses as L
from ..ops.image_meta import parse_image_meta
from .optim import l2_regularization, make_optimizer, mask_gradients
from .trainable import trainable_mask


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Any = flax.struct.field(pytree_node=False)


def create_train_state(model, config, rng, batch, learning_rate=None):
    """Initialize params and optimizer for a model."""
    lr = learning_rate if learning_rate is not None else config.LEARNING_RATE
    init_rngs = {"params": rng, "sampling": jax.random.fold_in(rng, 1),
                 "dropout": jax.random.fold_in(rng, 2)}
    # init UNDER JIT: eager init dispatches the whole forward op-by-op,
    # which is slow everywhere and hard-crashes the TPU worker behind the
    # axon relay at large batch x image sizes (measured: B=2 @ 640^2).
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=True))(init_rngs, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(lr, config.LEARNING_MOMENTUM,
                        config.GRADIENT_CLIP_NORM)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state, tx=tx,
                      apply_fn=model.apply)


def compute_losses(outputs, batch, config):
    """The five losses from model outputs + host-built RPN targets."""
    meta = parse_image_meta(batch["image_meta"])
    active = meta["active_class_ids"]
    out = {
        "rpn_class_loss": L.rpn_class_loss(batch["rpn_match"],
                                           outputs["rpn_class_logits"]),
        "rpn_bbox_loss": L.rpn_bbox_loss(batch["rpn_bbox"],
                                         batch["rpn_match"],
                                         outputs["rpn_bbox"]),
        "mrcnn_class_loss": L.mrcnn_class_loss(
            outputs["target_class_ids"], outputs["mrcnn_class_logits"],
            active),
        "mrcnn_bbox_loss": L.mrcnn_bbox_loss(
            outputs["target_deltas"], outputs["target_class_ids"],
            outputs["mrcnn_bbox"]),
        "mrcnn_mask_loss": L.mrcnn_mask_loss(
            outputs["target_masks"], outputs["target_class_ids"],
            outputs["mrcnn_masks"]),
    }
    return out


def make_train_step(config, stage="all", donate=True):
    """Returns jitted train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state, batch, rng):
        tmask = trainable_mask(state.params, stage)
        rng_s, rng_d = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            mutable = ["batch_stats"] if state.batch_stats else []
            result = state.apply_fn(
                variables, batch, training=True,
                rngs={"sampling": rng_s, "dropout": rng_d},
                mutable=mutable)
            outputs, new_vars = (result if mutable else (result, {}))
            loss_parts = compute_losses(outputs, batch, config)
            total = L.total_loss(loss_parts, config.LOSS_WEIGHTS)
            total = total + l2_regularization(params, tmask,
                                              config.WEIGHT_DECAY)
            return total, (loss_parts,
                           new_vars.get("batch_stats", state.batch_stats))

        (total, (loss_parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = mask_gradients(grads, tmask)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt, batch_stats=new_bs)
        metrics = dict(loss_parts, loss=total)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_val_step(config):
    """Returns jitted val_step(state, batch, rng) -> loss metrics.

    Runs the TRAINING graph (detection-target sampling + the five losses,
    the reference's validation_data path through the same compiled model,
    model_multi.py:2901-2912) but performs no update and discards any
    batch_stats mutation, so validation never perturbs training state.
    """

    def val_step(state, batch, rng):
        rng_s, rng_d = jax.random.split(rng)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        mutable = ["batch_stats"] if state.batch_stats else []
        result = state.apply_fn(
            variables, batch, training=True,
            rngs={"sampling": rng_s, "dropout": rng_d}, mutable=mutable)
        outputs = result[0] if mutable else result
        loss_parts = compute_losses(outputs, batch, config)
        total = L.total_loss(loss_parts, config.LOSS_WEIGHTS)
        return dict(loss_parts, loss=total)

    return jax.jit(val_step)


def make_eval_step(config):
    """Returns jitted infer_step(state, batch) -> outputs dict.

    With config.BN_EVAL_BATCH_STATS (diagnostic), BatchNorm layers compute
    batch statistics on the inference graph too; the mutated running stats
    are discarded so evaluation never perturbs the training state.
    """
    bn_batch = bool(getattr(config, "BN_EVAL_BATCH_STATS", False))

    def infer_step(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if bn_batch and state.batch_stats:
            outputs, _ = state.apply_fn(variables, batch, training=False,
                                        mutable=["batch_stats"])
            return outputs
        return state.apply_fn(variables, batch, training=False)

    return jax.jit(infer_step)


def lr_schedule(base_lr, stages):
    """Piecewise-constant LR over steps: stages = [(until_step, lr), ...]
    mirroring the reference's 3-stage schedule (interior_multi.py:483-501)."""
    del base_lr
    bounds = np.array([s for s, _ in stages[:-1]])
    values = np.array([lr for _, lr in stages], dtype=np.float32)

    def fn(step):
        idx = jnp.searchsorted(jnp.asarray(bounds), step, side="right")
        return jnp.take(jnp.asarray(values), idx)

    return fn
