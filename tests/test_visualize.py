"""Rendering utilities: apply_mask blend numerics + headless smoke runs."""

import os

import numpy as np

from mulit_view_object_detection_tpu.utils import visualize as V


def _fixture():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
    boxes = np.array([[2, 2, 12, 12], [5, 5, 20, 25], [0, 0, 0, 0]])
    masks = np.zeros((32, 32, 3), bool)
    masks[3:10, 3:10, 0] = True
    masks[6:18, 6:22, 1] = True
    return img, boxes, masks, np.array([1, 2, 0]), np.array([0.9, 0.8, 0.0])


def test_apply_mask_blend():
    """Vectorized blend == the per-channel formula: on-mask pixels become
    pixel*(1-alpha) + alpha*color*255, truncated into the image dtype."""
    img, _, masks, _, _ = _fixture()
    color = (1.0, 0.5, 0.2)
    out = V.apply_mask(img.astype(np.uint32).copy(), masks[:, :, 0], color)
    ref = img.astype(np.uint32).copy()
    for c in range(3):
        ref[:, :, c] = np.where(masks[:, :, 0] == 1,
                                ref[:, :, c] * 0.5 + 0.5 * color[c] * 255,
                                ref[:, :, c])
    np.testing.assert_array_equal(out, ref)
    # off-mask pixels untouched
    assert (out[~masks[:, :, 0]] == img.astype(np.uint32)[
        ~masks[:, :, 0]]).all()


def test_headless_rendering(tmp_path):
    img, boxes, masks, cids, scores = _fixture()
    names = ["BG", "a", "b"]
    ax = V.display_instances(img, boxes, masks, cids, names, scores)
    assert ax is not None
    for mode in (0, 1, 2, 3):
        p = V.save_image(img, f"t{mode}", boxes, masks, cids, scores,
                         names, save_dir=str(tmp_path), mode=mode)
        assert os.path.exists(p)
    V.draw_boxes(img, boxes=boxes, refined_boxes=boxes.astype(np.float32),
                 masks=masks, captions=["x", "y", "z"],
                 visibilities=[0, 1, 2])
    V.plot_precision_recall(0.5, np.array([1, 0.5]), np.array([0, 1]))
    canvas = V.draw_box(img.copy(), [2, 2, 12, 12], (255, 0, 0))
    assert (canvas[2, 2:12] == (255, 0, 0)).all()


def test_debug_renderers():
    """Smoke the notebook-oriented renderers: image grids, ROI debug view,
    detection contours, per-class mask panels, IoU overlap heatmap."""
    img, boxes, masks, cids, scores = _fixture()
    names = ["BG", "a", "b"]
    fig = V.display_images([img, img, img], titles=["1", "2", "3"], cols=2)
    assert fig is not None
    ax = V.draw_rois(img, boxes.astype(np.float32),
                     boxes.astype(np.float32) + 1.0, masks, cids, names,
                     limit=2)
    assert ax is not None
    ax = V.display_detections(img, boxes, boxes, masks, cids, names, scores)
    assert ax is not None
    V.display_top_masks(img, masks, cids, names, limit=2)
    overlaps = np.array([[0.8, 0.1], [0.2, 0.6]])
    V.plot_overlaps(np.array([1, 2]), np.array([1, 1]),
                    np.array([0.9, 0.7]), overlaps, names)


def test_fixed_colors_deterministic():
    assert V.fixed_colors(5) == V.fixed_colors(5)
    assert len(V.random_colors(7)) == 7
