"""Box coordinate ops — JAX (device) and NumPy (host) variants.

Semantics follow the reference box machinery:
  apply_box_deltas   -> mrcnn/model.py:213-234
  clip_boxes         -> mrcnn/model.py:237-252
  box_refinement     -> mrcnn/utils.py:442-491
  compute_overlaps   -> mrcnn/utils.py:319-357 (numpy) / model.py:457-483 (graph)
  norm/denorm_boxes  -> mrcnn/utils.py:1112-1143 (the (h-1, w-1) convention)
  extract_bboxes     -> mrcnn/utils.py:293-316

All box tensors are [..., (y1, x1, y2, x2)].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# JAX (device-side, static shapes, batched via leading dims)
# ---------------------------------------------------------------------------

def apply_box_deltas(boxes, deltas):
    """Apply (dy, dx, log(dh), log(dw)) deltas. boxes/deltas: [..., 4]."""
    height = boxes[..., 2] - boxes[..., 0]
    width = boxes[..., 3] - boxes[..., 1]
    center_y = boxes[..., 0] + 0.5 * height
    center_x = boxes[..., 1] + 0.5 * width
    center_y = center_y + deltas[..., 0] * height
    center_x = center_x + deltas[..., 1] * width
    height = height * jnp.exp(deltas[..., 2])
    width = width * jnp.exp(deltas[..., 3])
    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    y2 = y1 + height
    x2 = x1 + width
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def clip_boxes(boxes, window):
    """Clip boxes to window [y1, x1, y2, x2]. boxes: [..., 4], window: [4]."""
    wy1, wx1, wy2, wx2 = window[0], window[1], window[2], window[3]
    y1 = jnp.clip(boxes[..., 0], wy1, wy2)
    x1 = jnp.clip(boxes[..., 1], wx1, wx2)
    y2 = jnp.clip(boxes[..., 2], wy1, wy2)
    x2 = jnp.clip(boxes[..., 3], wx1, wx2)
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def box_refinement(box, gt_box):
    """Deltas that transform `box` into `gt_box` (utils.py:442-465)."""
    box = box.astype(jnp.float32)
    gt_box = gt_box.astype(jnp.float32)
    height = box[..., 2] - box[..., 0]
    width = box[..., 3] - box[..., 1]
    center_y = box[..., 0] + 0.5 * height
    center_x = box[..., 1] + 0.5 * width
    gt_height = gt_box[..., 2] - gt_box[..., 0]
    gt_width = gt_box[..., 3] - gt_box[..., 1]
    gt_center_y = gt_box[..., 0] + 0.5 * gt_height
    gt_center_x = gt_box[..., 1] + 0.5 * gt_width
    dy = (gt_center_y - center_y) / height
    dx = (gt_center_x - center_x) / width
    dh = jnp.log(gt_height / height)
    dw = jnp.log(gt_width / width)
    return jnp.stack([dy, dx, dh, dw], axis=-1)


def overlaps(boxes1, boxes2):
    """Pairwise IoU matrix [N1, N2] (model.py:457-483 semantics: plain
    intersection/union with no epsilon; zero-area pairs produce 0/0 -> we
    guard with a tiny where to stay NaN-free for padded boxes)."""
    b1 = boxes1[:, None, :]  # [N1, 1, 4]
    b2 = boxes2[None, :, :]  # [1, N2, 4]
    y1 = jnp.maximum(b1[..., 0], b2[..., 0])
    x1 = jnp.maximum(b1[..., 1], b2[..., 1])
    y2 = jnp.minimum(b1[..., 2], b2[..., 2])
    x2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def iou_one_to_many(box, boxes):
    """IoU of a single box [4] against boxes [N, 4] -> [N]."""
    y1 = jnp.maximum(box[0], boxes[:, 0])
    x1 = jnp.maximum(box[1], boxes[:, 1])
    y2 = jnp.minimum(box[2], boxes[:, 2])
    x2 = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(y2 - y1, 0) * jnp.maximum(x2 - x1, 0)
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = area + areas - inter
    return jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)


def norm_boxes(boxes, shape):
    """Pixel -> normalized coordinates with the reference's (h-1, w-1)
    convention (utils.py:1112-1126)."""
    h, w = shape[0], shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=jnp.float32)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    return (boxes.astype(jnp.float32) - shift) / scale


def denorm_boxes(boxes, shape):
    """Normalized -> pixel coordinates (utils.py:1129-1143)."""
    h, w = shape[0], shape[1]
    scale = jnp.array([h - 1, w - 1, h - 1, w - 1], dtype=jnp.float32)
    shift = jnp.array([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    return jnp.round(boxes * scale + shift).astype(jnp.int32)


# ---------------------------------------------------------------------------
# NumPy (host-side: dataset prep, evaluation). Fully vectorized — the
# reference's per-column / per-instance python loops (utils.py:293-357)
# don't survive a 100+ fps input pipeline.
# ---------------------------------------------------------------------------

def _areas_np(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def compute_iou_np(box, boxes, box_area, boxes_area):
    """IoU of one box [4] against boxes [N, 4] (utils.py:319-337
    semantics: no epsilon — degenerate unions propagate as in the
    reference)."""
    lo = np.maximum(box[:2], boxes[:, :2])
    hi = np.minimum(box[2:4], boxes[:, 2:4])
    inter = np.prod(np.maximum(hi - lo, 0), axis=-1)
    return inter / (box_area + boxes_area - inter)


def compute_overlaps_np(boxes1, boxes2):
    """Pairwise IoU [N1, N2] — one broadcast, no loop. Coordinates are
    broadcast per-axis ([N1, N2] planes) rather than stacked into an
    [N1, N2, 2] block: with ~100k anchors the stacked form's prod-reduce
    dominates the host input pipeline.

    Inputs are cast to float32 up front so the dtype behavior (and the
    bit-exact tie compare in ops/targets.py) matches the native float32
    kernel for integer/float64 callers, and so the in-place `ih *= iw`
    cannot overflow an integer intermediate."""
    c1 = np.ascontiguousarray(boxes1.T, dtype=np.float32)
    c2 = np.ascontiguousarray(boxes2.T, dtype=np.float32)
    ih = np.minimum.outer(c1[2], c2[2])
    ih -= np.maximum.outer(c1[0], c2[0])
    iw = np.minimum.outer(c1[3], c2[3])
    iw -= np.maximum.outer(c1[1], c2[1])
    np.clip(ih, 0, None, out=ih)
    np.clip(iw, 0, None, out=iw)
    ih *= iw
    inter = ih
    a1 = (c1[2] - c1[0]) * (c1[3] - c1[1])
    a2 = (c2[2] - c2[0]) * (c2[3] - c2[1])
    union = a1[:, None] + a2[None, :] - inter
    return inter / union


def compute_overlaps_masks_np(masks1, masks2):
    """IoU between two mask stacks [H, W, N] via one flattened matmul
    (utils.py:359-378)."""
    n1, n2 = masks1.shape[-1], masks2.shape[-1]
    if n1 == 0 or n2 == 0:
        return np.zeros((n1, n2))
    flat1 = (masks1 > 0.5).reshape(-1, n1).astype(np.float32)
    flat2 = (masks2 > 0.5).reshape(-1, n2).astype(np.float32)
    inter = flat1.T @ flat2
    union = flat1.sum(0)[:, None] + flat2.sum(0)[None, :] - inter
    return inter / np.maximum(union, 1e-10)


def non_max_suppression_np(boxes, scores, threshold):
    """Greedy score-descending NMS; returns kept indices. Suppresses at
    IoU STRICTLY greater than `threshold` (utils.py:381-415)."""
    assert boxes.shape[0] > 0
    boxes = boxes.astype(np.float32) if boxes.dtype.kind != "f" else boxes
    areas = _areas_np(boxes)
    order = scores.argsort()[::-1]
    alive = np.ones(boxes.shape[0], dtype=bool)
    kept = []
    for rank in range(order.shape[0]):
        idx = order[rank]
        if not alive[idx]:
            continue
        kept.append(idx)
        rest = order[rank + 1:]
        iou = compute_iou_np(boxes[idx], boxes[rest], areas[idx],
                             areas[rest])
        alive[rest[iou > threshold]] = False
    return np.asarray(kept, dtype=np.int32)


def _box_geometry_np(boxes):
    """(centers [N, (cy, cx)], sizes [N, (h, w)]) of float32 boxes."""
    sizes = boxes[:, 2:4] - boxes[:, 0:2]
    return boxes[:, 0:2] + 0.5 * sizes, sizes


def apply_box_deltas_np(boxes, deltas):
    """Apply (dy, dx, log dh, log dw) refinements (utils.py:418-439)."""
    centers, sizes = _box_geometry_np(boxes.astype(np.float32))
    centers = centers + deltas[:, 0:2] * sizes
    sizes = sizes * np.exp(deltas[:, 2:4])
    corner = centers - 0.5 * sizes
    return np.concatenate([corner, corner + sizes], axis=1)


def box_refinement_np(box, gt_box):
    """Deltas taking `box` onto `gt_box` (utils.py:468-491)."""
    centers, sizes = _box_geometry_np(box.astype(np.float32))
    gt_centers, gt_sizes = _box_geometry_np(gt_box.astype(np.float32))
    return np.concatenate(
        [(gt_centers - centers) / sizes, np.log(gt_sizes / sizes)], axis=1)


def extract_bboxes_np(mask):
    """Tight boxes from masks [H, W, N] -> [N, (y1, x1, y2, x2)], exclusive
    bottom-right; all-empty masks give the zero box (utils.py:293-316).
    Vectorized over instances via argmax on the row/column occupancy."""
    h, w, _ = mask.shape
    cols = mask.any(axis=0)                      # [W, N]
    rows = mask.any(axis=1)                      # [H, N]
    x1 = cols.argmax(axis=0)
    y1 = rows.argmax(axis=0)
    x2 = w - cols[::-1].argmax(axis=0)           # last occupied col + 1
    y2 = h - rows[::-1].argmax(axis=0)
    boxes = np.stack([y1, x1, y2, x2], axis=1).astype(np.int32)
    boxes[~cols.any(axis=0)] = 0
    return boxes


# Pixel <-> normalized coordinates, (h-1, w-1) denominator with the
# bottom-right corner shifted in by one pixel (utils.py:1112-1143).

def _norm_coeffs(shape):
    h, w = shape
    return (np.array([h - 1, w - 1, h - 1, w - 1]), np.array([0, 0, 1, 1]))


def norm_boxes_np(boxes, shape):
    scale, shift = _norm_coeffs(shape)
    return ((boxes - shift) / scale).astype(np.float32)


def denorm_boxes_np(boxes, shape):
    scale, shift = _norm_coeffs(shape)
    return np.around(boxes * scale + shift).astype(np.int32)
