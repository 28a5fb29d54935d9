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
# NumPy (host-side: dataset prep, evaluation)
# ---------------------------------------------------------------------------

def compute_iou_np(box, boxes, box_area, boxes_area):
    """IoU of one box against many (utils.py:319-337)."""
    y1 = np.maximum(box[0], boxes[:, 0])
    y2 = np.minimum(box[2], boxes[:, 2])
    x1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[3], boxes[:, 3])
    intersection = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    union = box_area + boxes_area[:] - intersection[:]
    return intersection / union


def compute_overlaps_np(boxes1, boxes2):
    """Pairwise IoU [N1, N2] (utils.py:340-357)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    out = np.zeros((boxes1.shape[0], boxes2.shape[0]))
    for i in range(out.shape[1]):
        out[:, i] = compute_iou_np(boxes2[i], boxes1, area2[i], area1)
    return out


def compute_overlaps_masks_np(masks1, masks2):
    """IoU between two mask stacks [H, W, N] (utils.py:359-378)."""
    if masks1.shape[-1] == 0 or masks2.shape[-1] == 0:
        return np.zeros((masks1.shape[-1], masks2.shape[-1]))
    m1 = np.reshape(masks1 > 0.5, (-1, masks1.shape[-1])).astype(np.float32)
    m2 = np.reshape(masks2 > 0.5, (-1, masks2.shape[-1])).astype(np.float32)
    area1 = np.sum(m1, axis=0)
    area2 = np.sum(m2, axis=0)
    intersections = np.dot(m1.T, m2)
    union = area1[:, None] + area2[None, :] - intersections
    return intersections / np.maximum(union, 1e-10)


def non_max_suppression_np(boxes, scores, threshold):
    """Greedy NMS returning kept indices (utils.py:381-415)."""
    assert boxes.shape[0] > 0
    if boxes.dtype.kind != "f":
        boxes = boxes.astype(np.float32)
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (y2 - y1) * (x2 - x1)
    ixs = scores.argsort()[::-1]
    pick = []
    while len(ixs) > 0:
        i = ixs[0]
        pick.append(i)
        iou = compute_iou_np(boxes[i], boxes[ixs[1:]], area[i], area[ixs[1:]])
        remove_ixs = np.where(iou > threshold)[0] + 1
        ixs = np.delete(ixs, remove_ixs)
        ixs = np.delete(ixs, 0)
    return np.array(pick, dtype=np.int32)


def apply_box_deltas_np(boxes, deltas):
    """utils.py:418-439."""
    boxes = boxes.astype(np.float32)
    height = boxes[:, 2] - boxes[:, 0]
    width = boxes[:, 3] - boxes[:, 1]
    center_y = boxes[:, 0] + 0.5 * height
    center_x = boxes[:, 1] + 0.5 * width
    center_y += deltas[:, 0] * height
    center_x += deltas[:, 1] * width
    height *= np.exp(deltas[:, 2])
    width *= np.exp(deltas[:, 3])
    y1 = center_y - 0.5 * height
    x1 = center_x - 0.5 * width
    return np.stack([y1, x1, y1 + height, x1 + width], axis=1)


def box_refinement_np(box, gt_box):
    """utils.py:468-491."""
    box = box.astype(np.float32)
    gt_box = gt_box.astype(np.float32)
    height = box[:, 2] - box[:, 0]
    width = box[:, 3] - box[:, 1]
    center_y = box[:, 0] + 0.5 * height
    center_x = box[:, 1] + 0.5 * width
    gt_height = gt_box[:, 2] - gt_box[:, 0]
    gt_width = gt_box[:, 3] - gt_box[:, 1]
    gt_center_y = gt_box[:, 0] + 0.5 * gt_height
    gt_center_x = gt_box[:, 1] + 0.5 * gt_width
    dy = (gt_center_y - center_y) / height
    dx = (gt_center_x - center_x) / width
    dh = np.log(gt_height / height)
    dw = np.log(gt_width / width)
    return np.stack([dy, dx, dh, dw], axis=1)


def extract_bboxes_np(mask):
    """Tight boxes from masks [H, W, N] -> [N, (y1, x1, y2, x2)]
    (utils.py:293-316)."""
    boxes = np.zeros([mask.shape[-1], 4], dtype=np.int32)
    for i in range(mask.shape[-1]):
        m = mask[:, :, i]
        horizontal_indicies = np.where(np.any(m, axis=0))[0]
        vertical_indicies = np.where(np.any(m, axis=1))[0]
        if horizontal_indicies.shape[0]:
            x1, x2 = horizontal_indicies[[0, -1]]
            y1, y2 = vertical_indicies[[0, -1]]
            # x2/y2 shouldn't be part of the box: increment by 1
            x2 += 1
            y2 += 1
        else:
            x1, x2, y1, y2 = 0, 0, 0, 0
        boxes[i] = np.array([y1, x1, y2, x2])
    return boxes.astype(np.int32)


def norm_boxes_np(boxes, shape):
    """utils.py:1112-1126."""
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1])
    shift = np.array([0, 0, 1, 1])
    return np.divide((boxes - shift), scale).astype(np.float32)


def denorm_boxes_np(boxes, shape):
    """utils.py:1129-1143."""
    h, w = shape
    scale = np.array([h - 1, w - 1, h - 1, w - 1])
    shift = np.array([0, 0, 1, 1])
    return np.around(np.multiply(boxes, scale) + shift).astype(np.int32)
