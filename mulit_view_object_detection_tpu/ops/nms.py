"""Static-shape greedy non-max suppression for XLA/TPU.

The reference reaches NMS through the dynamic-shape C++ kernel
`tf.image.non_max_suppression` (model.py:319-321 RPN proposals,
model.py:736-740 per-class detection NMS). Two exact formulations here:

* `nms` (default) — fixed-point suppression: sort by score, build the
  upper-triangular "j suppresses i" matrix T (IoU > threshold, optional
  class gating), then Jacobi-iterate kept(t+1)[i] = valid[i] and not
  any_j(T[j,i] and kept(t)[j]) until stable. Each sweep is ONE [N,N]@[N]
  matvec on the MXU; convergence takes suppression-chain-depth sweeps
  (typically < 10) instead of K sequential argmax steps. The fixed point
  satisfies the greedy recurrence by strong induction over score order, so
  the kept set — and its first K members in score order — are EXACTLY
  greedy NMS's selections.

* `nms_sequential` — the direct K-step argmax-and-suppress loop (reference
  semantics, used as the oracle in tests).

Per-class NMS falls out of class-gated suppression in both: suppression
between equal classes only is exactly equivalent to independent per-class
NMS merged in score order (greedy order over the union is global score
order either way, and the per-class cap equals the global cap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import iou_one_to_many, overlaps

_NEG_INF = -1e9


def nms(boxes, scores, max_output_size, iou_threshold, valid_mask=None,
        class_ids=None):
    """Greedy NMS with static shapes (fixed-point formulation).

    Args:
      boxes: [N, 4] (y1, x1, y2, x2), any consistent coordinate scale.
      scores: [N].
      max_output_size: K, static int.
      iou_threshold: float.
      valid_mask: optional [N] bool; False entries are never selected.
      class_ids: optional [N] int; suppression only within the same class.

    Returns:
      keep_idx: [K] int32 indices into `boxes` in descending score order;
        -1 past the last kept box.
      keep_valid: [K] bool.
    """
    n = boxes.shape[0]
    k = max_output_size
    scores = jnp.asarray(scores, jnp.float32)
    if valid_mask is not None:
        scores = jnp.where(valid_mask, scores, _NEG_INF)

    # sort by score (ties broken by index, matching top-k selection order)
    sorted_scores, order = jax.lax.top_k(scores, n)
    boxes_s = boxes[order]
    valid_s = sorted_scores > _NEG_INF / 2

    iou = overlaps(boxes_s, boxes_s)
    row = jnp.arange(n)
    tri = row[:, None] < row[None, :]          # j < i (j suppresses i)
    supp = (iou > iou_threshold) & tri
    supp = supp & valid_s[:, None]
    if class_ids is not None:
        cls_s = class_ids[order]
        supp = supp & (cls_s[:, None] == cls_s[None, :])
    supp_f = supp.astype(jnp.float32)          # [j, i]

    def body(state):
        kept, _, it = state
        hit = supp_f.T @ kept.astype(jnp.float32)   # [i] <- sum_j T[j,i]*kept[j]
        new_kept = valid_s & (hit < 0.5)
        return new_kept, kept, it + 1

    def cond(state):
        kept, prev, it = state
        return jnp.logical_and(jnp.any(kept != prev), it < n)

    init = (valid_s, jnp.zeros_like(valid_s), jnp.asarray(0))
    kept, _, _ = jax.lax.while_loop(cond, body, init)

    # first K kept entries in score order -> output slots
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    slot = jnp.where(kept & (rank < k), rank, k)    # k = discard bin
    keep_idx = jnp.full((k + 1,), -1, jnp.int32).at[slot].set(
        order.astype(jnp.int32))[:k]
    return keep_idx, keep_idx >= 0


def nms_sequential(boxes, scores, max_output_size, iou_threshold,
                   valid_mask=None, class_ids=None):
    """Direct K-step greedy loop (kept as oracle / fallback)."""
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
        suppress = jnp.logical_or(suppress, jnp.arange(n) == i)
        suppress = jnp.logical_and(suppress, is_valid)
        live_scores = jnp.where(suppress, _NEG_INF, live_scores)
        return live_scores, keep_idx, keep_valid

    keep_idx = jnp.full((max_output_size,), -1, dtype=jnp.int32)
    keep_valid = jnp.zeros((max_output_size,), dtype=bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, max_output_size, body, (scores, keep_idx, keep_valid))
    return keep_idx, keep_valid
