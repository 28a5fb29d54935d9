"""Final detection refinement — static-shape replacement of the reference's
`refine_detections_graph` / `DetectionLayer` (model.py:684-823).

The reference's dynamic machinery (tf.where index trims, per-unique-class
tf.map_fn NMS, sparse set intersections) becomes one masked computation:

  * background / low-confidence filtering -> a validity mask;
  * per-class NMS -> ONE global greedy NMS whose suppression is gated on
    class equality (provably identical to per-class NMS + global top-k by
    score, since greedy selection order over the union is global score
    order in both formulations and the per-class cap equals the global cap);
  * final top-k -> the first DETECTION_MAX_INSTANCES selections of that
    greedy pass, already emitted in descending score order.

Output contract matches the reference: [B, DETECTION_MAX_INSTANCES,
(y1, x1, y2, x2, class_id, score)], zero-padded, normalized coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import apply_box_deltas, clip_boxes
from .nms import nms


def refine_detections(rois, probs, deltas, windows, *, bbox_std_dev,
                      detection_min_confidence, detection_max_instances,
                      detection_nms_threshold):
    """rois: [B, N, 4] normalized; probs: [B, N, C]; deltas: [B, N, C, 4];
    windows: [B, 4] normalized image window (excludes padding).

    Returns detections [B, detection_max_instances, 6].
    """

    def per_image(rois_i, probs_i, deltas_i, window_i):
        n = rois_i.shape[0]
        class_ids = jnp.argmax(probs_i, axis=1)
        class_scores = probs_i[jnp.arange(n), class_ids]
        deltas_specific = deltas_i[jnp.arange(n), class_ids]
        refined = apply_box_deltas(
            rois_i, deltas_specific * jnp.asarray(bbox_std_dev, jnp.float32))
        refined = clip_boxes(refined, window_i)

        keep = class_ids > 0
        if detection_min_confidence:
            keep = jnp.logical_and(keep,
                                   class_scores >= detection_min_confidence)

        keep_idx, keep_valid = nms(
            refined, class_scores, detection_max_instances,
            detection_nms_threshold, valid_mask=keep, class_ids=class_ids)
        idx = jnp.maximum(keep_idx, 0)
        det = jnp.concatenate([
            refined[idx],
            class_ids[idx][:, None].astype(jnp.float32),
            class_scores[idx][:, None],
        ], axis=1)
        return jnp.where(keep_valid[:, None], det, 0.0)

    return jax.vmap(per_image)(rois, probs, deltas, windows)
