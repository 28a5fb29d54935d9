"""Static-shape greedy non-max suppression for XLA/TPU.

The reference reaches NMS through the dynamic-shape C++ kernel
`tf.image.non_max_suppression` (model.py:319-321 for RPN proposals,
model.py:736-740 for per-class detection NMS). XLA requires static shapes, so
this module implements greedy NMS as a `lax.fori_loop` of K sequential
argmax-and-suppress steps over a fixed-size candidate set — numerically
identical to greedy NMS (same selection order, same suppression rule,
`iou > threshold` strictly greater, matching the TF kernel).

Per-class NMS falls out for free: suppression is gated on class equality,
which is exactly equivalent to running independent NMS per class and merging
by score (the greedy order over the union is the same).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import iou_one_to_many

_NEG_INF = -1e9


def nms(boxes, scores, max_output_size, iou_threshold, valid_mask=None,
        class_ids=None):
    """Greedy NMS with static shapes.

    Args:
      boxes: [N, 4] (y1, x1, y2, x2), any consistent coordinate scale.
      scores: [N].
      max_output_size: K, static int.
      iou_threshold: float.
      valid_mask: optional [N] bool; False entries are never selected.
      class_ids: optional [N] int; if given, suppression only applies between
        boxes of the same class (per-class NMS, model.py:731-753 semantics).

    Returns:
      keep_idx: [K] int32 indices into `boxes`; -1 past the last kept box.
      keep_valid: [K] bool.
    """
    n = boxes.shape[0]
    scores = jnp.asarray(scores, jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, _NEG_INF)

    def body(k, state):
        live_scores, keep_idx, keep_valid = state
        i = jnp.argmax(live_scores)
        best = live_scores[i]
        is_valid = best > _NEG_INF / 2
        keep_idx = keep_idx.at[k].set(jnp.where(is_valid, i, -1))
        keep_valid = keep_valid.at[k].set(is_valid)
        iou = iou_one_to_many(boxes[i], boxes)
        suppress = iou > iou_threshold
        if class_ids is not None:
            suppress = jnp.logical_and(suppress, class_ids == class_ids[i])
        suppress = jnp.logical_or(suppress,
                                  jnp.arange(n) == i)
        # only suppress when we actually selected something
        suppress = jnp.logical_and(suppress, is_valid)
        live_scores = jnp.where(suppress, _NEG_INF, live_scores)
        return live_scores, keep_idx, keep_valid

    keep_idx = jnp.full((max_output_size,), -1, dtype=jnp.int32)
    keep_valid = jnp.zeros((max_output_size,), dtype=bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, max_output_size, body, (scores, keep_idx, keep_valid))
    return keep_idx, keep_valid
