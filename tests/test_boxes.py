import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.ops import boxes as B


def random_boxes(rng, n, scale=1.0):
    y1 = rng.uniform(0, 0.8, n)
    x1 = rng.uniform(0, 0.8, n)
    h = rng.uniform(0.05, 0.2, n)
    w = rng.uniform(0.05, 0.2, n)
    return np.stack([y1, x1, y1 + h, x1 + w], axis=1).astype(np.float32) * scale


def test_apply_refine_roundtrip(rng):
    b1 = random_boxes(rng, 32)
    b2 = random_boxes(rng, 32)
    deltas = B.box_refinement(jnp.asarray(b1), jnp.asarray(b2))
    out = B.apply_box_deltas(jnp.asarray(b1), deltas)
    np.testing.assert_allclose(np.asarray(out), b2, atol=1e-5)


def test_refinement_matches_numpy(rng):
    b1 = random_boxes(rng, 16)
    b2 = random_boxes(rng, 16)
    d_np = B.box_refinement_np(b1, b2)
    d_jx = np.asarray(B.box_refinement(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(d_jx, d_np, atol=2e-4)  # f32 vs f64 log


def test_overlaps_matches_numpy(rng):
    b1 = random_boxes(rng, 20)
    b2 = random_boxes(rng, 15)
    ov_np = B.compute_overlaps_np(b1, b2)
    ov_jx = np.asarray(B.overlaps(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ov_jx, ov_np, atol=1e-5)


def test_overlaps_identity():
    b = np.array([[0.1, 0.1, 0.5, 0.5]], dtype=np.float32)
    ov = np.asarray(B.overlaps(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(ov, [[1.0]], atol=1e-6)


def test_clip_boxes():
    b = jnp.array([[-0.1, 0.2, 0.5, 1.3], [0.0, 0.0, 1.0, 1.0]])
    out = np.asarray(B.clip_boxes(b, jnp.array([0.0, 0.0, 1.0, 1.0])))
    np.testing.assert_allclose(out, [[0.0, 0.2, 0.5, 1.0], [0, 0, 1, 1]])


def test_norm_denorm_roundtrip(rng):
    px = np.array([[10, 20, 200, 300], [0, 0, 480, 640]], dtype=np.int32)
    shape = (480, 640)
    normed = B.norm_boxes_np(px, shape)
    back = B.denorm_boxes_np(normed, shape)
    np.testing.assert_array_equal(back, px)
    # jnp variant matches numpy variant
    normed_j = np.asarray(B.norm_boxes(jnp.asarray(px), shape))
    np.testing.assert_allclose(normed_j, normed, atol=1e-6)


def test_nms_np_basic():
    boxes = np.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],   # overlaps first heavily
        [20, 20, 30, 30],
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7])
    keep = B.non_max_suppression_np(boxes, scores, 0.3)
    assert list(keep) == [0, 2]


def test_extract_bboxes():
    mask = np.zeros((20, 20, 2), dtype=bool)
    mask[5:10, 3:8, 0] = True
    out = B.extract_bboxes_np(mask)
    np.testing.assert_array_equal(out[0], [5, 3, 10, 8])
    np.testing.assert_array_equal(out[1], [0, 0, 0, 0])
