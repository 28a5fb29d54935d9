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

from .boxes import apply_box_deltas, clip_boxes
from .nms import nms


def generate_proposals(rpn_probs, rpn_deltas, anchors, *, proposal_count,
                       nms_threshold, pre_nms_limit, bbox_std_dev):
    """rpn_probs: [B, A, 2], rpn_deltas: [B, A, 4], anchors: [A, 4] normalized.

    Returns proposals [B, proposal_count, 4] in normalized coords,
    zero-padded (reference pads with zeros, model.py:323-326).
    """
    anchors = jnp.asarray(anchors)
    scores = rpn_probs[:, :, 1]
    deltas = rpn_deltas * jnp.asarray(bbox_std_dev, jnp.float32)
    k = min(pre_nms_limit, anchors.shape[0])

    def per_image(scores_i, deltas_i):
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
