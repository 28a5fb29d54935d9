"""Optimizer matching the reference's compile() (model.py:2152-2206):
SGD + momentum 0.9, PER-TENSOR gradient norm clipping at
GRADIENT_CLIP_NORM (Keras `clipnorm` semantics — each gradient tensor is
clipped by its own L2 norm, not the global norm), and L2 weight decay
`WEIGHT_DECAY * mean(w^2)` added to the loss over trainable non-BN weights
(model.py:2184-2190).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_per_leaf_norm(max_norm):
    """Keras clipnorm: clip each gradient leaf by its own L2 norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate, momentum=0.9, clipnorm=5.0,
                   accumulator_dtype=None):
    """SGD+momentum with per-tensor clipnorm. learning_rate may be a
    schedule. `accumulator_dtype` (e.g. jnp.bfloat16) stores the momentum
    buffer at reduced precision — halves its HBM read+write per step
    (a train-step byte-cut lever; the buffer is params-sized, so the win
    is bounded by params-bytes / total-step-bytes)."""
    return optax.chain(
        clip_per_leaf_norm(clipnorm),
        optax.sgd(learning_rate, momentum=momentum,
                  accumulator_dtype=accumulator_dtype),
    )


def _is_batchnorm_leaf(path):
    return any(getattr(k, "key", None) == "BatchNorm_0" for k in path)


def l2_regularization(params, trainable_mask, weight_decay):
    """sum over trainable non-BN weights of wd * mean(w^2)
    (model.py:2184-2190)."""
    leaves_w = jax.tree_util.tree_flatten_with_path(params)[0]
    leaves_m = jax.tree_util.tree_leaves(trainable_mask)
    total = 0.0
    for (path, w), m in zip(leaves_w, leaves_m):
        if _is_batchnorm_leaf(path):
            continue
        total = total + jnp.where(m, weight_decay * jnp.mean(jnp.square(w)),
                                  0.0)
    return total


def mask_gradients(grads, trainable_mask):
    """Zero gradients of frozen parameters (set_trainable equivalent,
    model.py:2709-2745)."""
    return jax.tree_util.tree_map(
        lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask)
