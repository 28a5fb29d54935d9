"""The five Mask R-CNN losses — static-shape masked formulations.

Reference: model.py:1016-1183 (identical clone in model_multi.py:1447-1614).
The reference gathers dynamic index lists (tf.where + gather) and means over
them; here every loss is a masked sum / count with identical value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked_mean(loss, mask):
    """Mean over loss elements whose (broadcast) mask is 1."""
    mask = mask.astype(loss.dtype)
    while mask.ndim < loss.ndim:
        mask = mask[..., None]
    mask = jnp.broadcast_to(mask, loss.shape)
    total = jnp.sum(loss * mask)
    count = jnp.sum(mask)
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def smooth_l1(y_true, y_pred):
    """model.py:1016-1023."""
    diff = jnp.abs(y_true - y_pred)
    return jnp.where(diff < 1.0, 0.5 * diff ** 2, diff - 0.5)


def rpn_class_loss(rpn_match, rpn_class_logits):
    """rpn_match: [B, A] in {-1, 0, 1}; logits: [B, A, 2]
    (model.py:1026-1048). Neutral anchors (0) don't contribute."""
    anchor_class = (rpn_match == 1).astype(jnp.int32)
    contribute = rpn_match != 0
    logp = jax.nn.log_softmax(rpn_class_logits)
    ce = -jnp.take_along_axis(logp, anchor_class[..., None], axis=-1)[..., 0]
    return _masked_mean(ce, contribute)


def rpn_bbox_loss(target_bbox, rpn_match, rpn_bbox):
    """target_bbox: [B, MAX_POS, 4] packed positives in anchor order;
    rpn_match: [B, A]; rpn_bbox: [B, A, 4] (model.py:1051-1077).

    The reference packs target rows against gathered positive predictions;
    statically we scatter each positive anchor its rank-indexed target row.
    """
    positive = rpn_match == 1
    # rank of each positive anchor among positives of its image
    rank = jnp.cumsum(positive.astype(jnp.int32), axis=1) - 1
    rank = jnp.clip(rank, 0, target_bbox.shape[1] - 1)
    tgt = jnp.take_along_axis(target_bbox, rank[..., None], axis=1)  # [B,A,4]
    loss = smooth_l1(tgt, rpn_bbox)
    return _masked_mean(loss, positive)


def mrcnn_class_loss(target_class_ids, pred_class_logits, active_class_ids):
    """target_class_ids: [B, T]; logits: [B, T, C]; active_class_ids: [B, C]
    (model.py:1080-1113). Every ROI slot contributes (padding = background),
    weighted by whether the PREDICTED class is active in the dataset; the
    reference uses image 0's active ids for the whole batch — kept."""
    logp = jax.nn.log_softmax(pred_class_logits)
    ce = -jnp.take_along_axis(
        logp, target_class_ids[..., None].astype(jnp.int32), axis=-1)[..., 0]
    pred_class_ids = jnp.argmax(pred_class_logits, axis=-1)
    pred_active = active_class_ids[0][pred_class_ids]  # [B, T]
    total = jnp.sum(ce * pred_active)
    denom = jnp.sum(pred_active)
    return jnp.where(denom > 0, total / jnp.maximum(denom, 1.0), 0.0)


def mrcnn_bbox_loss(target_bbox, target_class_ids, pred_bbox):
    """target_bbox: [B, T, 4]; target_class_ids: [B, T];
    pred_bbox: [B, T, C, 4] (model.py:1116-1144). Positive ROIs only, the
    target class's deltas only."""
    positive = target_class_ids > 0
    cls = jnp.maximum(target_class_ids.astype(jnp.int32), 0)
    pred = jnp.take_along_axis(
        pred_bbox, cls[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    loss = smooth_l1(target_bbox, pred)
    return _masked_mean(loss, positive)


def mrcnn_mask_loss(target_masks, target_class_ids, pred_masks):
    """target_masks: [B, T, h, w]; target_class_ids: [B, T];
    pred_masks: [B, T, h, w, C] sigmoid outputs (model.py:1147-1183)."""
    positive = target_class_ids > 0
    cls = jnp.maximum(target_class_ids.astype(jnp.int32), 0)
    pred = jnp.take_along_axis(
        pred_masks, cls[:, :, None, None, None], axis=-1)[..., 0]
    eps = 1e-7
    p = jnp.clip(pred, eps, 1.0 - eps)
    bce = -(target_masks * jnp.log(p) + (1.0 - target_masks) * jnp.log(1 - p))
    return _masked_mean(bce, positive)


def total_loss(outputs, loss_weights):
    """Weighted sum (compile(), model.py:2172-2182). outputs must contain the
    five *_loss scalars."""
    names = ["rpn_class_loss", "rpn_bbox_loss", "mrcnn_class_loss",
             "mrcnn_bbox_loss", "mrcnn_mask_loss"]
    return sum(outputs[n] * loss_weights.get(n, 1.0) for n in names)
