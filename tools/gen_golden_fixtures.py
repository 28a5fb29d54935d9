"""Generate golden parity fixtures from the REAL TensorFlow kernels the
reference calls (mrcnn/model.py:421-423, 598-600 crop_and_resize;
model.py:277-281, 720-723 non_max_suppression; model.py:684-823
refine_detections_graph), so the repo's TPU re-implementations are checked
against TF's actual numerics rather than a self-oracle.

Run (writes tests/fixtures/golden_tf.npz — the fixture is CHECKED IN, so
tests never need TF at runtime):

    python tools/gen_golden_fixtures.py

The refine-detections reference here is an independent numpy+TF-NMS
transcription of the documented algorithm (argmax class -> per-class box
refinement -> window clip -> confidence gate -> per-class TF NMS -> global
top-k by score), written against the algorithm description, not the
repo's ops/detection.py.
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "golden_tf.npz")


def _boxes_with_edge_cases(rng, n):
    """Normalized boxes incl. out-of-frame, inverted and degenerate ones."""
    lo = rng.uniform(-0.2, 0.9, (n, 2))
    hi = lo + rng.uniform(0.0, 0.6, (n, 2))
    boxes = np.concatenate([lo[:, :1], lo[:, 1:], hi[:, :1], hi[:, 1:]],
                           axis=1).astype(np.float32)
    boxes[0] = [0.0, 0.0, 1.0, 1.0]      # full frame
    boxes[1] = [0.5, 0.5, 0.5, 0.5]      # degenerate point
    boxes[2] = [0.7, 0.7, 0.2, 0.2]      # inverted (y2 < y1)
    boxes[3] = [-0.5, -0.5, 1.5, 1.5]    # mostly outside
    return boxes


def gen_crop_and_resize(tf, rng, out):
    images = rng.randn(6, 9, 11, 3).astype(np.float32)
    boxes = _boxes_with_edge_cases(rng, 6)
    for size in ((7, 7), (1, 1), (3, 5)):
        got = tf.image.crop_and_resize(
            images, boxes, tf.range(6), size, extrapolation_value=0.0)
        key = f"car_{size[0]}x{size[1]}"
        out[f"{key}_images"] = images
        out[f"{key}_boxes"] = boxes
        out[f"{key}_expected"] = np.asarray(got)


def gen_nms(tf, rng, out):
    n = 64
    centers = rng.uniform(0.2, 0.8, (n, 2))
    sizes = rng.uniform(0.05, 0.4, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=1).astype(np.float32)
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    # deliberate score ties: TF's top-k resolves ties to the lower index
    scores[10] = scores[11] = scores[12] = 0.75
    # near-identical boxes so tie order decides who survives
    boxes[11] = boxes[10] + 0.001
    for thresh in (0.3, 0.5, 0.7):
        sel = tf.image.non_max_suppression(
            boxes, scores, max_output_size=32, iou_threshold=thresh)
        out[f"nms_{thresh}_selected"] = np.asarray(sel)
    out["nms_boxes"] = boxes
    out["nms_scores"] = scores


def _apply_deltas_np(boxes, deltas):
    hw = boxes[:, 2:4] - boxes[:, 0:2]
    ctr = boxes[:, 0:2] + 0.5 * hw
    ctr = ctr + deltas[:, 0:2] * hw
    hw = hw * np.exp(deltas[:, 2:4])
    lo = ctr - 0.5 * hw
    return np.concatenate([lo, lo + hw], axis=1)


def _refine_reference(tf, rois, probs, deltas, window, bbox_std_dev,
                      min_conf, max_inst, nms_thresh):
    """Independent transcription of refine_detections_graph
    (model.py:684-823): per-class NMS via the real TF kernel."""
    n = rois.shape[0]
    class_ids = probs.argmax(axis=1)
    scores = probs[np.arange(n), class_ids]
    specific = deltas[np.arange(n), class_ids] * bbox_std_dev
    refined = _apply_deltas_np(rois, specific)
    wy1, wx1, wy2, wx2 = window
    refined = np.stack([refined[:, 0].clip(wy1, wy2),
                        refined[:, 1].clip(wx1, wx2),
                        refined[:, 2].clip(wy1, wy2),
                        refined[:, 3].clip(wx1, wx2)], axis=1)
    keep = class_ids > 0
    if min_conf:
        keep &= scores >= min_conf
    survivors = []
    for cls in np.unique(class_ids[keep]):
        idx = np.nonzero(keep & (class_ids == cls))[0]
        sel = np.asarray(tf.image.non_max_suppression(
            refined[idx], scores[idx], max_output_size=max_inst,
            iou_threshold=nms_thresh))
        survivors.extend(idx[sel].tolist())
    survivors = np.asarray(sorted(
        survivors, key=lambda i: -scores[i])[:max_inst], dtype=np.int64)
    det = np.zeros((max_inst, 6), np.float32)
    det[:survivors.size, :4] = refined[survivors]
    det[:survivors.size, 4] = class_ids[survivors]
    det[:survivors.size, 5] = scores[survivors]
    return det


def gen_refine_detections(tf, rng, out):
    n, c = 48, 5
    rois = _boxes_with_edge_cases(rng, n)
    rois = np.clip(rois, 0.0, 1.0)
    logits = rng.randn(n, c).astype(np.float32) * 2.0
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    deltas = (rng.randn(n, c, 4) * 0.5).astype(np.float32)
    window = np.array([0.05, 0.05, 0.95, 0.95], np.float32)
    std = np.array([0.1, 0.1, 0.2, 0.2], np.float32)
    expected = _refine_reference(tf, rois, probs.astype(np.float32), deltas,
                                 window, std, min_conf=0.3, max_inst=16,
                                 nms_thresh=0.3)
    out["refine_rois"] = rois
    out["refine_probs"] = probs.astype(np.float32)
    out["refine_deltas"] = deltas
    out["refine_window"] = window
    out["refine_expected"] = expected


def gen_deconv(tf, rng, out):
    """Real tf.keras Conv2DTranspose forward + its kernel, for the h5
    importer's flip+transpose transform."""
    layer = tf.keras.layers.Conv2DTranspose(5, 2, strides=2,
                                            padding="same")
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    y = np.asarray(layer(x))
    kernel = np.asarray(layer.weights[0])    # [kh, kw, out, in]
    assert kernel.shape == (2, 2, 5, 3), kernel.shape
    bias = np.asarray(layer.weights[1])
    out["deconv_x"] = x
    out["deconv_kernel"] = kernel
    out["deconv_bias"] = bias
    out["deconv_expected"] = y


def main():
    import tensorflow as tf
    rng = np.random.RandomState(20260816)
    out = {"tf_version": np.str_(tf.__version__)}
    gen_crop_and_resize(tf, rng, out)
    gen_nms(tf, rng, out)
    gen_refine_detections(tf, rng, out)
    gen_deconv(tf, rng, out)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **out)
    print(f"wrote {os.path.normpath(FIXTURE)} "
          f"({len(out)} arrays, tf {tf.__version__})")


if __name__ == "__main__":
    main()
