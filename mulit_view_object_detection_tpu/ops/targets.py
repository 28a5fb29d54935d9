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


def build_rpn_targets(anchors, gt_class_ids, gt_boxes, config,
                      rnd_state=None):
    """Host-side RPN anchor matching (model.py:1449-1557).

    anchors: [A, 4] pixel coords. gt_class_ids: [G]. gt_boxes: [G, 4] pixels.
    Returns (rpn_match [A] in {-1, 0, 1},
             rpn_bbox [RPN_TRAIN_ANCHORS_PER_IMAGE, 4] normalized deltas).
    """
    rnd = rnd_state or np.random
    rpn_match = np.zeros([anchors.shape[0]], dtype=np.int32)
    rpn_bbox = np.zeros((config.RPN_TRAIN_ANCHORS_PER_IMAGE, 4))

    # COCO crowds: exclude from training (model.py:1468-1482)
    crowd_ix = np.where(gt_class_ids < 0)[0]
    if crowd_ix.shape[0] > 0:
        non_crowd_ix = np.where(gt_class_ids > 0)[0]
        crowd_boxes = gt_boxes[crowd_ix]
        gt_class_ids = gt_class_ids[non_crowd_ix]
        gt_boxes = gt_boxes[non_crowd_ix]
        crowd_overlaps = compute_overlaps_np(anchors, crowd_boxes)
        crowd_iou_max = np.amax(crowd_overlaps, axis=1)
        no_crowd_bool = (crowd_iou_max < 0.001)
    else:
        no_crowd_bool = np.ones([anchors.shape[0]], dtype=bool)

    if gt_boxes.shape[0] == 0:
        rpn_match[no_crowd_bool] = -1
        return rpn_match, rpn_bbox

    overlaps_m = compute_overlaps_np(anchors, gt_boxes)

    # 1. negatives first, 2. per-GT best anchor forced positive,
    # 3. high-IoU positives (model.py:1490-1510)
    anchor_iou_argmax = np.argmax(overlaps_m, axis=1)
    anchor_iou_max = overlaps_m[np.arange(overlaps_m.shape[0]),
                                anchor_iou_argmax]
    rpn_match[(anchor_iou_max < 0.3) & no_crowd_bool] = -1
    gt_iou_argmax = np.argwhere(
        overlaps_m == np.max(overlaps_m, axis=0))[:, 0]
    rpn_match[gt_iou_argmax] = 1
    rpn_match[anchor_iou_max >= 0.7] = 1

    # balance (model.py:1512-1528)
    ids = np.where(rpn_match == 1)[0]
    extra = len(ids) - (config.RPN_TRAIN_ANCHORS_PER_IMAGE // 2)
    if extra > 0:
        ids = rnd.choice(ids, extra, replace=False)
        rpn_match[ids] = 0
    ids = np.where(rpn_match == -1)[0]
    extra = len(ids) - (config.RPN_TRAIN_ANCHORS_PER_IMAGE -
                        np.sum(rpn_match == 1))
    if extra > 0:
        ids = rnd.choice(ids, extra, replace=False)
        rpn_match[ids] = 0

    # deltas for positives, in anchor order, / RPN_BBOX_STD_DEV
    # (model.py:1530-1557)
    ids = np.where(rpn_match == 1)[0]
    if len(ids) > 0:
        deltas = box_refinement_np(anchors[ids],
                                   gt_boxes[anchor_iou_argmax[ids]])
        deltas /= config.RPN_BBOX_STD_DEV
        rpn_bbox[:len(ids)] = deltas
    return rpn_match, rpn_bbox
