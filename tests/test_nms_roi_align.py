import jax
import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.ops import boxes as B
from mulit_view_object_detection_tpu.ops.nms import nms
from mulit_view_object_detection_tpu.ops.roi_align import (
    crop_and_resize_pairs, pyramid_roi_align, roi_levels)


def random_boxes(rng, n):
    y1 = rng.uniform(0, 0.7, n)
    x1 = rng.uniform(0, 0.7, n)
    h = rng.uniform(0.05, 0.3, n)
    w = rng.uniform(0.05, 0.3, n)
    return np.stack([y1, x1, y1 + h, x1 + w], axis=1).astype(np.float32)


def test_nms_matches_numpy_oracle(rng):
    boxes = random_boxes(rng, 64)
    scores = rng.uniform(0.1, 1.0, 64).astype(np.float32)
    keep_ref = B.non_max_suppression_np(boxes, scores, 0.5)
    keep_idx, keep_valid = jax.jit(
        lambda b, s: nms(b, s, 64, 0.5))(jnp.asarray(boxes),
                                         jnp.asarray(scores))
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, keep_ref)


def test_nms_max_output_truncates(rng):
    boxes = random_boxes(rng, 32)
    # spread boxes so nothing overlaps: all should survive but K caps it
    boxes = np.stack([np.linspace(0, 0.9, 32),
                      np.linspace(0, 0.9, 32),
                      np.linspace(0, 0.9, 32) + 0.01,
                      np.linspace(0, 0.9, 32) + 0.01], axis=1).astype(np.float32)
    scores = rng.uniform(size=32).astype(np.float32)
    keep_idx, keep_valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 5, 0.5)
    assert int(keep_valid.sum()) == 5
    # selections in descending score order
    s = scores[np.asarray(keep_idx)]
    assert np.all(np.diff(s) <= 0)


def test_class_gated_nms_equals_per_class(rng):
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0.1, 1.0, 40).astype(np.float32)
    class_ids = rng.randint(1, 4, 40)
    keep_idx, keep_valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 40,
                               0.4, class_ids=jnp.asarray(class_ids))
    got = set(np.asarray(keep_idx)[np.asarray(keep_valid)].tolist())
    expect = set()
    for c in np.unique(class_ids):
        ix = np.where(class_ids == c)[0]
        kept = B.non_max_suppression_np(boxes[ix], scores[ix], 0.4)
        expect.update(ix[kept].tolist())
    assert got == expect


def test_fixed_point_nms_equals_sequential(rng):
    """Property test: the MXU fixed-point NMS == the direct greedy loop,
    with and without class gating, across many random instances."""
    from mulit_view_object_detection_tpu.ops.nms import nms_sequential

    for trial in range(10):
        n = 48
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        class_ids = rng.randint(1, 4, n)
        valid = rng.rand(n) > 0.2
        for cls in (None, jnp.asarray(class_ids)):
            a_idx, a_val = nms(jnp.asarray(boxes), jnp.asarray(scores), 20,
                               0.45, valid_mask=jnp.asarray(valid),
                               class_ids=cls)
            b_idx, b_val = nms_sequential(
                jnp.asarray(boxes), jnp.asarray(scores), 20, 0.45,
                valid_mask=jnp.asarray(valid), class_ids=cls)
            np.testing.assert_array_equal(np.asarray(a_val),
                                          np.asarray(b_val))
            np.testing.assert_array_equal(
                np.asarray(a_idx)[np.asarray(a_val)],
                np.asarray(b_idx)[np.asarray(b_val)])


def _crop_and_resize_oracle(image, box, size):
    """Numpy oracle of tf.image.crop_and_resize bilinear semantics."""
    h, w, c = image.shape
    sh, sw = size
    y1, x1, y2, x2 = box
    out = np.zeros((sh, sw, c), dtype=np.float32)
    for i in range(sh):
        for j in range(sw):
            if sh > 1:
                y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (sh - 1)
            else:
                y = 0.5 * (y1 + y2) * (h - 1)
            if sw > 1:
                x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (sw - 1)
            else:
                x = 0.5 * (x1 + x2) * (w - 1)
            if y < 0 or y > h - 1 or x < 0 or x > w - 1:
                continue
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            ly, lx = y - y0, x - x0
            out[i, j] = (image[y0, x0] * (1 - ly) * (1 - lx)
                         + image[y0, x1i] * (1 - ly) * lx
                         + image[y1i, x0] * ly * (1 - lx)
                         + image[y1i, x1i] * ly * lx)
    return out


def test_crop_and_resize_matches_oracle(rng):
    images = rng.rand(3, 16, 24, 2).astype(np.float32)
    boxes = np.array([
        [0.1, 0.2, 0.6, 0.9],
        [-0.1, 0.0, 0.5, 1.21],  # partially out of range -> zeros there
        [0.0, 0.0, 1.0, 1.0],
    ], dtype=np.float32)
    out = np.asarray(crop_and_resize_pairs(jnp.asarray(images),
                                           jnp.asarray(boxes), (7, 7)))
    for i in range(3):
        expect = _crop_and_resize_oracle(images[i], boxes[i], (7, 7))
        np.testing.assert_allclose(out[i], expect, atol=1e-4)


def test_roi_levels():
    image_shape = (1024, 1024)
    # a 224x224-pixel roi maps to P4 -> level index 2
    side = 224 / 1023.0
    boxes = jnp.array([[[0.0, 0.0, side, side],           # ~P4
                        [0.0, 0.0, side / 4, side / 4],   # small -> P2
                        [0.0, 0.0, 0.9, 0.9]]])           # large -> P5
    lvl = np.asarray(roi_levels(boxes, image_shape))
    assert lvl.tolist() == [[2, 0, 3]]


def test_pyramid_roi_align_matches_single_level(rng):
    """Boxes forced to one level must equal plain crop_and_resize there."""
    b, c = 2, 8
    image_shape = (256, 256)
    fms = [jnp.asarray(rng.rand(b, 256 // s, 256 // s, c).astype(np.float32))
           for s in (4, 8, 16, 32)]
    # tiny boxes -> all level 0 (P2)
    boxes = np.stack([random_tiny_boxes(rng, 6) for _ in range(b)])
    out = np.asarray(pyramid_roi_align(jnp.asarray(boxes), fms,
                                       image_shape, 7))
    for bi in range(b):
        expect = np.asarray(crop_and_resize_pairs(
            jnp.repeat(fms[0][bi][None], 6, axis=0),
            jnp.asarray(boxes[bi]), (7, 7)))
        np.testing.assert_allclose(out[bi], expect, atol=1e-4)


def random_tiny_boxes(rng, n):
    y1 = rng.uniform(0.1, 0.8, n)
    x1 = rng.uniform(0.1, 0.8, n)
    h = rng.uniform(0.02, 0.05, n)
    w = rng.uniform(0.02, 0.05, n)
    return np.stack([y1, x1, y1 + h, x1 + w], axis=1).astype(np.float32)
