"""Golden parity against REAL TensorFlow kernel outputs.

tests/fixtures/golden_tf.npz was produced by tools/gen_golden_fixtures.py
running the actual tf.image.crop_and_resize / tf.image.non_max_suppression
kernels (and a tf.keras Conv2DTranspose) that the reference calls — these
tests check the TPU re-implementations against TF's numerics, independent
of this repo's own code. The fixture is checked in; TF is not needed at
test time.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from mulit_view_object_detection_tpu.ops.detection import refine_detections
from mulit_view_object_detection_tpu.ops.nms import nms
from mulit_view_object_detection_tpu.ops.roi_align import (
    crop_and_resize_pairs)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_tf.npz")


@pytest.fixture(scope="module")
def golden():
    assert os.path.exists(FIXTURE), \
        "run tools/gen_golden_fixtures.py to (re)create the fixture"
    return np.load(FIXTURE)


@pytest.mark.parametrize("size", [(7, 7), (1, 1), (3, 5)])
def test_crop_and_resize_matches_tf(golden, size):
    key = f"car_{size[0]}x{size[1]}"
    images = golden[f"{key}_images"]
    boxes = golden[f"{key}_boxes"]
    expected = golden[f"{key}_expected"]
    got = np.asarray(crop_and_resize_pairs(jnp.asarray(images),
                                           jnp.asarray(boxes), size))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_tf(golden, thresh):
    """Same survivors, same order — including the score-tie block where
    selection order decides who suppresses whom."""
    boxes = golden["nms_boxes"]
    scores = golden["nms_scores"]
    expected = golden[f"nms_{thresh}_selected"]
    keep_idx, keep_valid = nms(jnp.asarray(boxes), jnp.asarray(scores),
                               max_output_size=32, iou_threshold=thresh)
    got = np.asarray(keep_idx)[np.asarray(keep_valid)]
    np.testing.assert_array_equal(got, expected)


def test_refine_detections_matches_tf(golden):
    """Full DetectionLayer semantics vs the per-class TF-NMS reference:
    same boxes, classes, scores, order and zero padding."""
    det = refine_detections(
        jnp.asarray(golden["refine_rois"])[None],
        jnp.asarray(golden["refine_probs"])[None],
        jnp.asarray(golden["refine_deltas"])[None],
        jnp.asarray(golden["refine_window"])[None],
        bbox_std_dev=np.array([0.1, 0.1, 0.2, 0.2]),
        detection_min_confidence=0.3,
        detection_max_instances=16,
        detection_nms_threshold=0.3)
    np.testing.assert_allclose(np.asarray(det[0]),
                               golden["refine_expected"],
                               rtol=1e-4, atol=1e-5)


def test_deconv_import_matches_tf_keras(golden):
    """h5 importer's ConvTranspose transform applied to a REAL tf.keras
    Conv2DTranspose kernel must reproduce the real layer's output."""
    import flax.linen as nn

    kernel = golden["deconv_kernel"]          # [kh, kw, out, in]
    flax_kernel = np.transpose(kernel[::-1, ::-1], (0, 1, 3, 2))
    mod = nn.ConvTranspose(kernel.shape[2], kernel.shape[:2],
                           strides=(2, 2))
    y = mod.apply({"params": {"kernel": jnp.asarray(flax_kernel),
                              "bias": jnp.asarray(golden["deconv_bias"])}},
                  jnp.asarray(golden["deconv_x"]))
    np.testing.assert_allclose(np.asarray(y), golden["deconv_expected"],
                               rtol=1e-5, atol=1e-5)
