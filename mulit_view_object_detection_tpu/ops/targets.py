"""Training target builders.

* `detection_targets` — on-device, static-shape replacement of the
  reference's `detection_targets_graph`/`DetectionTargetLayer`
  (model.py:486-677; identical clone at model_multi.py:921-1112). The
  reference trims zero padding with boolean masks and random-shuffles
  dynamic index lists; here selection is fixed-size masked top-k over random
  priorities (same distribution: a uniform random priority top-k IS a
  uniform subsample without replacement), vmapped over batch instead of
  `utils.batch_slice` unrolling.

* `build_rpn_targets` — host-side numpy RPN anchor matching
  (model.py:1449-1557, model_multi.py:1880-1988): IoU thresholds
  +-0.7/0.3, per-GT best anchor forced positive, balanced subsampling to
  RPN_TRAIN_ANCHORS_PER_IMAGE with <=50% positives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import (box_refinement, box_refinement_np, compute_overlaps_np,
                    overlaps)
from .roi_align import crop_and_resize_pairs

_NEG_INF = -1e9
# numpy (not jnp): module import must not create device arrays
_DUMMY_BOX = np.array([0.0, 0.0, 1.0, 1.0], np.float32)


def detection_targets(rng, proposals, gt_class_ids, gt_boxes, gt_masks, *,
                      train_rois_per_image, roi_positive_ratio, mask_shape,
                      use_mini_mask, bbox_std_dev):
    """Sample ROIs and build head targets for ONE image.

    proposals: [P, 4] normalized, zero-padded.
    gt_class_ids: [G] int (0 = pad, <0 = COCO crowd).
    gt_boxes: [G, 4] normalized, zero-padded.
    gt_masks: [G, mh, mw] float/bool (instance-major; full-image masks or
      mini-masks per use_mini_mask).

    Returns (rois [T,4], target_class_ids [T], target_deltas [T,4],
             target_masks [T, mask_h, mask_w]) with T=train_rois_per_image,
    zero-padded exactly like the reference (model.py:610-619).
    """
    p = proposals.shape[0]
    pos_cap = int(train_rois_per_image * roi_positive_ratio)
    neg_cap = train_rois_per_image - pos_cap

    valid_prop = jnp.any(proposals != 0, axis=1)
    valid_gt = jnp.any(gt_boxes != 0, axis=1)
    crowd = jnp.logical_and(valid_gt, gt_class_ids < 0)
    non_crowd = jnp.logical_and(valid_gt, gt_class_ids > 0)

    ov = overlaps(proposals, gt_boxes)  # [P, G]
    roi_iou_max = jnp.max(jnp.where(non_crowd[None, :], ov, 0.0), axis=1)
    crowd_iou_max = jnp.max(jnp.where(crowd[None, :], ov, 0.0), axis=1)
    no_crowd = crowd_iou_max < 0.001

    positive = jnp.logical_and(valid_prop, roi_iou_max >= 0.5)
    negative = jnp.logical_and(valid_prop,
                               jnp.logical_and(roi_iou_max < 0.5, no_crowd))

    rng_pos, rng_neg = jax.random.split(rng)
    pos_pri = jnp.where(positive, jax.random.uniform(rng_pos, (p,)), _NEG_INF)
    pos_vals, pos_idx = jax.lax.top_k(pos_pri, pos_cap)
    pos_valid = pos_vals > _NEG_INF / 2
    pos_count = jnp.sum(pos_valid)

    # negatives to maintain the positive ratio (model.py:555-558)
    neg_target = (jnp.floor((1.0 / roi_positive_ratio)
                            * pos_count.astype(jnp.float32)).astype(jnp.int32)
                  - pos_count)
    neg_pri = jnp.where(negative, jax.random.uniform(rng_neg, (p,)), _NEG_INF)
    neg_vals, neg_idx = jax.lax.top_k(neg_pri, neg_cap)
    neg_valid = jnp.logical_and(neg_vals > _NEG_INF / 2,
                                jnp.arange(neg_cap) < neg_target)

    pos_rois_raw = proposals[pos_idx]
    pos_rois = jnp.where(pos_valid[:, None], pos_rois_raw, 0.0)
    neg_rois = jnp.where(neg_valid[:, None], proposals[neg_idx], 0.0)

    # assign positives to best non-crowd GT
    pos_ov = jnp.where(non_crowd[None, :], ov, -1.0)[pos_idx]  # [pos_cap, G]
    gt_assign = jnp.argmax(pos_ov, axis=1)
    roi_gt_boxes = gt_boxes[gt_assign]
    target_class_ids_pos = jnp.where(pos_valid, gt_class_ids[gt_assign], 0)

    # deltas (sanitized on invalid slots to avoid log(0) NaNs)
    safe_rois = jnp.where(pos_valid[:, None], pos_rois_raw, _DUMMY_BOX)
    safe_gt = jnp.where(pos_valid[:, None], roi_gt_boxes, _DUMMY_BOX)
    deltas = box_refinement(safe_rois, safe_gt) / jnp.asarray(
        bbox_std_dev, jnp.float32)
    deltas = jnp.where(pos_valid[:, None], deltas, 0.0)

    # mask targets: crop assigned GT mask to the ROI (model.py:577-606)
    roi_masks = gt_masks[gt_assign].astype(jnp.float32)[..., None]
    if use_mini_mask:
        # ROI coords from normalized image space to normalized mini-mask
        # (= GT-box) space (model.py:585-596)
        gt_h = jnp.maximum(safe_gt[:, 2] - safe_gt[:, 0], 1e-8)
        gt_w = jnp.maximum(safe_gt[:, 3] - safe_gt[:, 1], 1e-8)
        y1 = (safe_rois[:, 0] - safe_gt[:, 0]) / gt_h
        x1 = (safe_rois[:, 1] - safe_gt[:, 1]) / gt_w
        y2 = (safe_rois[:, 2] - safe_gt[:, 0]) / gt_h
        x2 = (safe_rois[:, 3] - safe_gt[:, 1]) / gt_w
        crop_boxes = jnp.stack([y1, x1, y2, x2], axis=1)
    else:
        crop_boxes = safe_rois
    masks = crop_and_resize_pairs(roi_masks, crop_boxes, tuple(mask_shape))
    masks = jnp.round(masks[..., 0])  # binarize (model.py:606)
    masks = jnp.where(pos_valid[:, None, None], masks, 0.0)

    rois = jnp.concatenate([pos_rois, neg_rois], axis=0)
    target_class_ids = jnp.concatenate(
        [target_class_ids_pos, jnp.zeros((neg_cap,), target_class_ids_pos.dtype)])
    target_deltas = jnp.concatenate(
        [deltas, jnp.zeros((neg_cap, 4), deltas.dtype)])
    target_masks = jnp.concatenate(
        [masks, jnp.zeros((neg_cap,) + tuple(mask_shape), masks.dtype)])
    return rois, target_class_ids, target_deltas, target_masks


def detection_targets_batch(rng, proposals, gt_class_ids, gt_boxes, gt_masks,
                            **kw):
    """vmap of `detection_targets` over the batch axis with split rngs."""
    b = proposals.shape[0]
    rngs = jax.random.split(rng, b)
    return jax.vmap(
        lambda r, p, c, bx, m: detection_targets(r, p, c, bx, m, **kw)
    )(rngs, proposals, gt_class_ids, gt_boxes, gt_masks)


def _match_anchors(anchors, gt_boxes):
    """(best_gt [A], best_iou [A], forced [A] bool) — per-anchor argmax/max
    IoU and the every-GT-keeps-its-best-anchor tie set. Uses the one-pass
    C++ reduction (native/maskops.cpp) when available; the numpy matrix
    path is bit-identical (same float32 op order, no FMA)."""
    from ..data.native import anchor_gt_match

    nat = anchor_gt_match(anchors, gt_boxes)
    if nat is not None:
        return nat
    iou = compute_overlaps_np(anchors, gt_boxes)
    best_gt = iou.argmax(axis=1)
    best_iou = iou[np.arange(anchors.shape[0]), best_gt]
    forced = (iou == iou.max(axis=0)).any(axis=1)
    return best_gt, best_iou, forced


def _demote_excess(labels, value, budget, rnd):
    """Randomly flip `value`-labeled anchors back to neutral (0) until at
    most `budget` remain — the RPN minibatch balancer."""
    slots = np.nonzero(labels == value)[0]
    surplus = slots.size - budget
    if surplus > 0:
        labels[rnd.choice(slots, surplus, replace=False)] = 0


def build_rpn_targets(anchors, gt_class_ids, gt_boxes, config,
                      rnd_state=None):
    """Host-side RPN anchor labeling + regression targets
    (model.py:1449-1557 semantics).

    anchors: [A, 4] pixel coords. gt_class_ids: [G] (negative = COCO
    crowd). gt_boxes: [G, 4] pixels. Returns (rpn_match [A] in {-1, 0, 1},
    rpn_bbox [RPN_TRAIN_ANCHORS_PER_IMAGE, 4] std-dev-normalized deltas
    packed densely in positive-anchor order).

    Labeling rules, applied in this order so later rules win:
      1. anchors under every GT's 0.3 IoU -> negative (unless the anchor
         touches a crowd box, which makes it neutral);
      2. each GT's best-overlapping anchor -> positive (guarantees every
         GT owns at least one anchor, ties included);
      3. any anchor at IoU >= 0.7 -> positive.
    Then each side is randomly thinned to fit the train-anchor budget
    (half positive at most).
    """
    rnd = rnd_state or np.random
    num_anchors = anchors.shape[0]
    rpn_match = np.zeros(num_anchors, dtype=np.int32)
    rpn_bbox = np.zeros((config.RPN_TRAIN_ANCHORS_PER_IMAGE, 4))

    # crowd instances are excluded from matching; anchors overlapping a
    # crowd region must not become negatives
    is_crowd = gt_class_ids < 0
    clear_of_crowds = np.ones(num_anchors, dtype=bool)
    if is_crowd.any():
        crowd = _match_anchors(anchors, gt_boxes[is_crowd])
        clear_of_crowds = crowd[1] < 0.001
        keep = gt_class_ids > 0
        gt_class_ids, gt_boxes = gt_class_ids[keep], gt_boxes[keep]

    if gt_boxes.shape[0] == 0:
        rpn_match[clear_of_crowds] = -1
        return rpn_match, rpn_bbox

    best_gt, best_iou, forced = _match_anchors(anchors, gt_boxes)

    rpn_match[(best_iou < 0.3) & clear_of_crowds] = -1
    # every GT keeps its best anchor(s), even below 0.7 (ties all count)
    rpn_match[forced] = 1
    rpn_match[best_iou >= 0.7] = 1

    budget = config.RPN_TRAIN_ANCHORS_PER_IMAGE
    _demote_excess(rpn_match, 1, budget // 2, rnd)
    _demote_excess(rpn_match, -1, budget - int(np.sum(rpn_match == 1)), rnd)

    positives = np.nonzero(rpn_match == 1)[0]
    if positives.size:
        deltas = box_refinement_np(anchors[positives],
                                   gt_boxes[best_gt[positives]])
        rpn_bbox[:positives.size] = deltas / config.RPN_BBOX_STD_DEV
    return rpn_match, rpn_bbox
