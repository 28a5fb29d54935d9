import numpy as np

from mulit_view_object_detection_tpu.data.molding import (
    expand_mask, minimize_mask, mold_image, resize_image, resize_mask,
    unmold_image, unmold_mask)
from mulit_view_object_detection_tpu.eval.metrics import (
    compute_ap, compute_ap_range, compute_recall)
from mulit_view_object_detection_tpu.ops.anchors import (
    compute_backbone_shapes, generate_pyramid_anchors, get_anchors)
from mulit_view_object_detection_tpu.ops.image_meta import (
    compose_image_meta, parse_image_meta)


def test_resize_image_square():
    img = (np.random.rand(480, 640, 3) * 255).astype(np.uint8)
    out, window, scale, padding, crop = resize_image(
        img, min_dim=800, max_dim=1024, mode="square")
    assert out.shape == (1024, 1024, 3)
    assert scale == 1024 / 640
    # window: top/bottom padding around the 768-high resized image
    assert window == (128, 0, 896, 1024)
    assert crop is None


def test_resize_image_none():
    img = np.zeros((100, 120, 3), dtype=np.uint8)
    out, window, scale, _, _ = resize_image(img, mode="none")
    assert out.shape == img.shape and scale == 1 and window == (0, 0, 100, 120)


def test_resize_mask_and_minimize_roundtrip():
    mask = np.zeros((64, 64, 1), dtype=bool)
    mask[10:30, 20:40, 0] = True
    resized = resize_mask(mask, 2.0, [(0, 0), (0, 0), (0, 0)])
    assert resized.shape == (128, 128, 1)
    assert resized[25, 45, 0]

    bbox = np.array([[10, 20, 30, 40]])
    mini = minimize_mask(bbox, mask, (28, 28))
    assert mini.shape == (28, 28, 1)
    assert mini.sum() > 0
    back = expand_mask(bbox, mini, (64, 64))
    # roundtrip keeps most of the mask
    inter = np.logical_and(back[:, :, 0], mask[:, :, 0]).sum()
    union = np.logical_or(back[:, :, 0], mask[:, :, 0]).sum()
    assert inter / union > 0.9


def test_unmold_mask():
    m = np.ones((28, 28), dtype=np.float32)
    full = unmold_mask(m, np.array([5, 5, 15, 15]), (32, 32, 3))
    assert full.shape == (32, 32)
    assert full[5:15, 5:15].all()
    assert full.sum() == 100


def test_mold_unmold_image():
    img = (np.random.rand(8, 8, 3) * 255).astype(np.uint8)
    mean = [123.7, 116.8, 103.9]
    molded = mold_image(img, mean)
    back = unmold_image(molded, mean)
    np.testing.assert_array_equal(back, img)


def test_image_meta_roundtrip():
    meta = compose_image_meta(7, (480, 640, 3), (1024, 1024, 3),
                              (128, 0, 896, 1024), 1.6, np.ones(5))
    parsed = parse_image_meta(meta[None])
    assert parsed["image_id"][0] == 7
    np.testing.assert_array_equal(parsed["window"][0], [128, 0, 896, 1024])
    assert abs(parsed["scale"][0] - 1.6) < 1e-6
    assert parsed["active_class_ids"].shape == (1, 5)


def test_anchor_pyramid():
    from mulit_view_object_detection_tpu.config import Config

    class C(Config):
        IMAGE_MIN_DIM = 256
        IMAGE_MAX_DIM = 256
        RPN_ANCHOR_SCALES = (32, 64, 128, 256, 512)

    cfg = C()
    shapes = compute_backbone_shapes(cfg, [256, 256, 3])
    np.testing.assert_array_equal(shapes,
                                  [[64, 64], [32, 32], [16, 16], [8, 8], [4, 4]])
    a = generate_pyramid_anchors(cfg.RPN_ANCHOR_SCALES, cfg.RPN_ANCHOR_RATIOS,
                                 shapes, cfg.BACKBONE_STRIDES, 1)
    expect = 3 * sum(s[0] * s[1] for s in shapes)
    assert a.shape == (expect, 4)
    norm = get_anchors(cfg, [256, 256, 3])
    assert norm.shape == (expect, 4)
    assert norm.dtype == np.float32


def _perfect_case():
    gt_boxes = np.array([[10, 10, 30, 30], [40, 40, 60, 60]], dtype=np.float32)
    gt_class_ids = np.array([1, 2])
    gt_masks = np.zeros((64, 64, 2), dtype=bool)
    gt_masks[10:30, 10:30, 0] = True
    gt_masks[40:60, 40:60, 1] = True
    return gt_boxes, gt_class_ids, gt_masks


def test_compute_ap_perfect():
    gt_boxes, gt_class_ids, gt_masks = _perfect_case()
    mAP, precisions, recalls, _ = compute_ap(
        gt_boxes, gt_class_ids, gt_masks,
        gt_boxes, gt_class_ids, np.array([0.9, 0.8]), gt_masks)
    assert mAP == 1.0


def test_compute_ap_wrong_class():
    gt_boxes, gt_class_ids, gt_masks = _perfect_case()
    wrong = np.array([3, 3])
    mAP, *_ = compute_ap(gt_boxes, gt_class_ids, gt_masks,
                         gt_boxes, wrong, np.array([0.9, 0.8]), gt_masks)
    assert mAP == 0.0


def test_compute_ap_range_runs():
    gt_boxes, gt_class_ids, gt_masks = _perfect_case()
    ap = compute_ap_range(gt_boxes, gt_class_ids, gt_masks,
                          gt_boxes, gt_class_ids, np.array([0.9, 0.8]),
                          gt_masks, verbose=0)
    assert ap == 1.0


def test_compute_recall():
    gt_boxes, *_ = _perfect_case()
    recall, ids = compute_recall(gt_boxes, gt_boxes, 0.5)
    assert recall == 1.0
