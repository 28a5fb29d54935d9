"""RPN proposal generation — static shapes, vmapped over batch.

Replaces the reference's `ProposalLayer` (model.py:255-332,
model_multi.py:690-767) which Python-unrolls the batch via
`utils.batch_slice` and calls the dynamic-shape TF NMS kernel. Here the
whole layer is one jittable function: top-k -> apply deltas -> clip ->
static greedy NMS -> gather+zero-pad, `jax.vmap` over the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from .boxes import apply_box_deltas, clip_boxes
from .nms import nms


def _stable_topk_with_const_spans(scores_i, k, const_spans, a_total):
    """Exact top-k of [A] scores where the anchors in `const_spans`
    (static (start, size, period) tuples) carry periodically repeating
    constant scores: scores_i[s + r + j*period] == scores_i[s + r] for
    all j (one constant per anchor-ratio slot r < period).

    The zeroed pyramid levels' RPN outputs are spatially constant per
    ratio slot (the detector constant-folds their conv stacks on a 1x1
    zero tile and tiles the [B, k, ...] result over H*W cells, so the
    span repeats its k per-ratio constants with period k). At the
    flagship config those spans are ~94% of all anchors — so the
    expensive top-k runs only over the non-constant remainder, and each
    residue class of a constant span joins a small merge pool as its
    first min(k, class_size) indices (higher indices of an equal-score
    run can never be selected before lower ones). The pool is then
    sorted by (score desc, index asc) — bit-identical selection and
    ordering to lax.top_k over the full array, whose tie rule is
    lowest-index-first."""
    spans = sorted(const_spans)
    real_spans, pos = [], 0
    for s, z, _ in spans:
        if s > pos:
            real_spans.append((pos, s - pos))
        pos = s + z
    if pos < a_total:
        real_spans.append((pos, a_total - pos))

    pool_v, pool_i = [], []
    if real_spans:
        reals = jnp.concatenate(
            [scores_i[s:s + z] for s, z in real_spans])
        real_idx = jnp.asarray(np.concatenate(
            [np.arange(s, s + z) for s, z in real_spans]), jnp.int32)
        kr = min(k, int(reals.shape[0]))
        vals_r, ir = jax.lax.top_k(reals, kr)
        pool_v.append(vals_r)
        pool_i.append(real_idx[ir])
    for s, z, p in spans:
        for r in range(p):
            count = (z - r + p - 1) // p  # indices s+r, s+r+p, ...
            m = min(k, count)
            if m <= 0:
                continue
            pool_v.append(jnp.full((m,), scores_i[s + r], scores_i.dtype))
            pool_i.append(s + r + p * jnp.arange(m, dtype=jnp.int32))
    vals = jnp.concatenate(pool_v)
    idx = jnp.concatenate(pool_i)
    neg, sidx = jax.lax.sort((-vals, idx), num_keys=2)
    return -neg[:k], sidx[:k]


def generate_proposals(rpn_probs, rpn_deltas, anchors, *, proposal_count,
                       nms_threshold, pre_nms_limit, bbox_std_dev,
                       const_spans=()):
    """rpn_probs: [B, A, 2], rpn_deltas: [B, A, 4], anchors: [A, 4] normalized.

    Returns proposals [B, proposal_count, 4] in normalized coords,
    zero-padded (reference pads with zeros, model.py:323-326).

    const_spans: static ((start, size, period), ...) anchor ranges whose
    scores repeat one constant per ratio slot with the given period
    (zeroed pyramid levels) — enables the exact split top-k (see
    _stable_topk_with_const_spans)."""
    anchors = jnp.asarray(anchors)
    scores = rpn_probs[:, :, 1]
    deltas = rpn_deltas * jnp.asarray(bbox_std_dev, jnp.float32)
    k = min(pre_nms_limit, anchors.shape[0])
    a_total = int(anchors.shape[0])
    const_spans = tuple(const_spans)

    def per_image(scores_i, deltas_i):
        if const_spans:
            top_scores, ix = _stable_topk_with_const_spans(
                scores_i, k, const_spans, a_total)
        else:
            top_scores, ix = jax.lax.top_k(scores_i, k)
        top_deltas = deltas_i[ix]
        top_anchors = anchors[ix]
        boxes = apply_box_deltas(top_anchors, top_deltas)
        boxes = clip_boxes(boxes, jnp.array([0.0, 0.0, 1.0, 1.0]))
        keep_idx, keep_valid = nms(boxes, top_scores, proposal_count,
                                   nms_threshold)
        props = boxes[jnp.maximum(keep_idx, 0)]
        return jnp.where(keep_valid[:, None], props, 0.0)

    return jax.vmap(per_image)(scores, deltas)
