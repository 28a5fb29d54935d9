import jax
import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.ops.detection import refine_detections
from mulit_view_object_detection_tpu.ops.proposals import generate_proposals
from mulit_view_object_detection_tpu.ops.targets import (
    build_rpn_targets, detection_targets)


def test_generate_proposals_shapes_and_padding(rng):
    a = 300
    anchors = np.stack([
        rng.uniform(0, 0.7, a), rng.uniform(0, 0.7, a),
        rng.uniform(0, 0.7, a) + 0.2, rng.uniform(0, 0.7, a) + 0.2,
    ], axis=1).astype(np.float32)
    probs = rng.rand(2, a, 2).astype(np.float32)
    deltas = (rng.randn(2, a, 4) * 0.1).astype(np.float32)
    props = generate_proposals(
        jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
        proposal_count=50, nms_threshold=0.7, pre_nms_limit=100,
        bbox_std_dev=[0.1, 0.1, 0.2, 0.2])
    props = np.asarray(props)
    assert props.shape == (2, 50, 4)
    # all boxes clipped to [0, 1]
    assert props.min() >= 0.0 and props.max() <= 1.0


def test_generate_proposals_picks_best_box():
    """One dominant anchor must be the first proposal with zero delta."""
    anchors = np.array([[0.1, 0.1, 0.3, 0.3],
                        [0.5, 0.5, 0.9, 0.9],
                        [0.11, 0.11, 0.31, 0.31]], dtype=np.float32)
    probs = np.array([[[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]]], dtype=np.float32)
    deltas = np.zeros((1, 3, 4), dtype=np.float32)
    props = np.asarray(generate_proposals(
        jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
        proposal_count=3, nms_threshold=0.5, pre_nms_limit=3,
        bbox_std_dev=[0.1, 0.1, 0.2, 0.2]))
    np.testing.assert_allclose(props[0, 0], anchors[0], atol=1e-6)
    # anchor 2 suppressed by anchor 0 (IoU > 0.5); anchor 1 survives
    np.testing.assert_allclose(props[0, 1], anchors[1], atol=1e-6)
    np.testing.assert_allclose(props[0, 2], 0.0, atol=1e-6)


def test_refine_detections_basic():
    n, c = 8, 4
    rois = np.tile(np.array([[0.1, 0.1, 0.4, 0.4]], dtype=np.float32),
                   (n, 1))
    rois[4:] = [0.6, 0.6, 0.9, 0.9]
    probs = np.zeros((n, c), dtype=np.float32)
    probs[:4, 1] = 0.95   # class 1, identical boxes -> NMS keeps one
    probs[:4, 0] = 0.05
    probs[4:, 2] = 0.9    # class 2 at another location -> keeps one
    probs[4:, 0] = 0.1
    deltas = np.zeros((n, c, 4), dtype=np.float32)
    window = np.array([[0.0, 0.0, 1.0, 1.0]], dtype=np.float32)
    det = np.asarray(refine_detections(
        rois[None], probs[None], deltas[None], window,
        bbox_std_dev=[0.1, 0.1, 0.2, 0.2], detection_min_confidence=0.7,
        detection_max_instances=10, detection_nms_threshold=0.3))
    assert det.shape == (1, 10, 6)
    valid = det[0][det[0, :, 4] > 0]
    assert len(valid) == 2
    assert set(valid[:, 4].astype(int).tolist()) == {1, 2}
    # highest score first
    assert valid[0, 5] >= valid[1, 5]


def test_refine_detections_confidence_filter():
    rois = np.array([[[0.1, 0.1, 0.4, 0.4]]], dtype=np.float32)
    probs = np.array([[[0.4, 0.6, 0.0]]], dtype=np.float32)  # below 0.7
    deltas = np.zeros((1, 1, 3, 4), dtype=np.float32)
    window = np.array([[0.0, 0.0, 1.0, 1.0]], dtype=np.float32)
    det = np.asarray(refine_detections(
        rois, probs, deltas, window,
        bbox_std_dev=[0.1, 0.1, 0.2, 0.2], detection_min_confidence=0.7,
        detection_max_instances=5, detection_nms_threshold=0.3))
    assert np.all(det == 0)


def test_detection_targets_sampling(rng):
    p, g = 64, 5
    key = jax.random.PRNGKey(0)
    gt_boxes = np.array([[0.1, 0.1, 0.3, 0.3],
                         [0.5, 0.5, 0.8, 0.8],
                         [0.2, 0.6, 0.4, 0.9],
                         [0, 0, 0, 0], [0, 0, 0, 0]], dtype=np.float32)
    gt_class_ids = np.array([1, 2, 3, 0, 0], dtype=np.int32)
    gt_masks = np.ones((g, 28, 28), dtype=np.float32)
    # proposals: half on GT boxes (positives), half elsewhere (negatives)
    props = np.zeros((p, 4), dtype=np.float32)
    for i in range(0, 24):
        props[i] = gt_boxes[i % 3] + rng.uniform(-0.01, 0.01, 4)
    for i in range(24, 56):
        y = rng.uniform(0.0, 0.05)
        props[i] = [y, 0.85, y + 0.1, 0.99]
    # rest remain zero padding
    rois, cls, deltas, masks = detection_targets(
        key, jnp.asarray(props), jnp.asarray(gt_class_ids),
        jnp.asarray(gt_boxes), jnp.asarray(gt_masks),
        train_rois_per_image=32, roi_positive_ratio=0.33,
        mask_shape=(28, 28), use_mini_mask=True,
        bbox_std_dev=[0.1, 0.1, 0.2, 0.2])
    rois, cls, deltas, masks = map(np.asarray, (rois, cls, deltas, masks))
    assert rois.shape == (32, 4) and masks.shape == (32, 28, 28)
    n_pos = int((cls > 0).sum())
    pos_cap = int(32 * 0.33)  # = 10
    assert 0 < n_pos <= pos_cap
    # positives carry nonzero deltas and masks; everything finite
    assert np.isfinite(deltas).all() and np.isfinite(masks).all()
    assert masks[:n_pos].sum() > 0
    # negatives zero-padded targets
    assert np.all(deltas[cls == 0] == 0)


def test_build_rpn_targets(rng):
    from mulit_view_object_detection_tpu.config import Config

    class C(Config):
        NUM_CLASSES = 4
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        RPN_TRAIN_ANCHORS_PER_IMAGE = 64

    cfg = C()
    anchors = np.stack([
        rng.uniform(0, 100, 500), rng.uniform(0, 100, 500),
        rng.uniform(0, 100, 500) + 20, rng.uniform(0, 100, 500) + 20,
    ], axis=1).astype(np.float32)
    gt_boxes = np.array([[10, 10, 40, 40], [60, 60, 100, 100]],
                        dtype=np.float32)
    gt_class_ids = np.array([1, 2], dtype=np.int32)
    rpn_match, rpn_bbox = build_rpn_targets(anchors, gt_class_ids, gt_boxes,
                                            cfg)
    assert rpn_match.shape == (500,)
    assert rpn_bbox.shape == (64, 4)
    n_pos = (rpn_match == 1).sum()
    n_neg = (rpn_match == -1).sum()
    assert n_pos >= 2  # at least the per-GT best anchors
    assert n_pos <= 32
    assert n_pos + n_neg <= 64
    assert np.isfinite(rpn_bbox).all()


def test_stable_topk_with_const_spans_matches_full_topk(rng):
    """The split top-k over constant spans must match lax.top_k over the
    full array bit-for-bit — including lowest-index-first tie handling
    (exercised by making the constants EQUAL to some real scores)."""
    import jax.numpy as jnp
    from mulit_view_object_detection_tpu.ops.proposals import (
        _stable_topk_with_const_spans)

    a_total = 400
    k = 60
    scores = rng.rand(a_total).astype(np.float32)
    # two constant spans, one of them tying real scores exactly
    scores[0:150] = 0.5
    scores[200:260] = 0.25
    scores[300] = 0.5        # exact tie with the first span's constant
    scores[310] = 0.25
    const_spans = ((0, 150, 1), (200, 60, 1))

    ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), k)
    got_v, got_i = _stable_topk_with_const_spans(
        jnp.asarray(scores), k, const_spans, a_total)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))


def test_stable_topk_periodic_const_spans(rng):
    """The folded RPN tiles k DISTINCT per-ratio constants over a zeroed
    level (detector.py folds on a 1x1 tile -> [B, k, 2], tiled over
    cells), so a constant span's scores repeat with period k, NOT as one
    flat constant. The split top-k must still match lax.top_k
    bit-for-bit — this is the regression test for the span-assumed-flat
    bug (the old code read only scores[start] and mislabeled/misordered
    the other ratio slots)."""
    import jax.numpy as jnp
    from mulit_view_object_detection_tpu.ops.proposals import (
        _stable_topk_with_const_spans)

    a_total, k, period = 500, 80, 3
    scores = rng.rand(a_total).astype(np.float32)
    # span 1: period-3 constants with the HIGHEST value NOT at residue 0
    scores[0:150] = np.tile(np.array([0.1, 0.9, 0.2], np.float32), 50)
    # span 2: period-3 constants, one residue tying span 1's top value
    scores[200:290] = np.tile(np.array([0.9, 0.05, 0.4], np.float32), 30)
    # a real anchor tying the constants too
    scores[400] = 0.9
    const_spans = ((0, 150, period), (200, 90, period))

    ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), k)
    got_v, got_i = _stable_topk_with_const_spans(
        jnp.asarray(scores), k, const_spans, a_total)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    # span sizes that don't divide the period must also be exact
    got_v2, got_i2 = _stable_topk_with_const_spans(
        jnp.asarray(scores[:491]), k, ((0, 150, period), (200, 89, period)),
        491)
    ref_v2, ref_i2 = jax.lax.top_k(jnp.asarray(scores[:491]), k)
    np.testing.assert_array_equal(np.asarray(ref_i2), np.asarray(got_i2))
    np.testing.assert_array_equal(np.asarray(ref_v2), np.asarray(got_v2))


def test_stable_topk_const_spans_fuzz(rng):
    """Randomized layouts: arbitrary span positions/sizes/periods,
    heavy exact ties, k larger and smaller than the span sizes — every
    case must match lax.top_k bit-for-bit."""
    import jax.numpy as jnp
    from mulit_view_object_detection_tpu.ops.proposals import (
        _stable_topk_with_const_spans)

    for trial in range(25):
        a_total = int(rng.randint(50, 400))
        k = int(rng.randint(1, a_total))
        # quantized scores force plenty of exact ties
        scores = (rng.randint(0, 12, a_total) / 11.0).astype(np.float32)
        spans, pos = [], 0
        while pos < a_total - 10 and len(spans) < 3 and rng.rand() < 0.8:
            start = pos + int(rng.randint(0, 5))
            size = int(rng.randint(1, min(120, a_total - start)))
            period = int(rng.randint(1, 5))
            consts = (rng.randint(0, 12, period) / 11.0).astype(np.float32)
            scores[start:start + size] = np.resize(
                np.tile(consts, size // period + 1), size)
            spans.append((start, size, period))
            pos = start + size
        ref_v, ref_i = jax.lax.top_k(jnp.asarray(scores), k)
        got_v, got_i = _stable_topk_with_const_spans(
            jnp.asarray(scores), k, tuple(spans), a_total)
        np.testing.assert_array_equal(
            np.asarray(ref_i), np.asarray(got_i),
            err_msg=f"trial {trial}: spans={spans} k={k} a={a_total}")
        np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))


def test_generate_proposals_const_spans_equivalent(rng):
    """generate_proposals with const_spans == without (same NMS input
    order, same proposals) when the spans really are constant."""
    from mulit_view_object_detection_tpu.ops.proposals import (
        generate_proposals)

    a = 256
    anchors = np.sort(rng.rand(a, 4).astype(np.float32), axis=1)
    anchors = anchors[:, [0, 2, 1, 3]] * 0.9
    probs = rng.rand(2, a, 2).astype(np.float32)
    # period-3 constant span (a "zeroed level"): one constant per ratio
    probs[:, :96, 1] = np.tile(np.array([0.31, 0.62, 0.17], np.float32), 32)
    deltas = (rng.randn(2, a, 4) * 0.05).astype(np.float32)

    kw = dict(proposal_count=16, nms_threshold=0.7, pre_nms_limit=64,
              bbox_std_dev=np.array([0.1, 0.1, 0.2, 0.2]))
    ref = np.asarray(generate_proposals(
        jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
        **kw))
    got = np.asarray(generate_proposals(
        jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
        const_spans=((0, 96, 3),), **kw))
    np.testing.assert_array_equal(ref, got)
