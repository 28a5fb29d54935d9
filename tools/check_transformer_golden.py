"""Repo-side check of the TRANSFORMER-FUSION full-graph golden.

Reconstructs the reference's weights from the inventory fixture
(tests/fixtures/golden_transformer_layers.json + the shared name-seeded
value rule), loads them through the repo's h5 importer — exercising the
encoder checkpoint mapping (per-layer wq/wk/wv/out Dense -> flax MHA
head-split kernels, FFN, LayerNormalization backport gamma/beta, the
final token projection; utils/h5_import.py::_assign_transformer_layer)
— runs the repo's engine with XFORMER_FAITHFUL_PAIRING=True (the
reference unproj_vector's feature-scale rays + transposed ray/feature
pairing + transposed output unflattening, see
ops/projection.py::unproject_rays), and compares detections against
tests/fixtures/golden_transformer.npz (produced by EXECUTING the
reference's model_transformer.py graph, tools/gen_transformer_golden.py).
BASELINE config #4's whole-graph check.

    JAX_PLATFORMS=cpu python tools/check_transformer_golden.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.gen_transformer_golden import (  # noqa: E402
    GOLDEN_XF, fixture_paths)


def build_config():
    from mulit_view_object_detection_tpu.config import Config
    g = GOLDEN_XF

    class GoldenXFConfig(Config):
        NAME = "golden_transformer"
        GPU_COUNT = 1
        IMAGES_PER_GPU = 1
        NUM_CLASSES = g["num_classes"]
        NUM_VIEWS = g["num_views"]
        BACKBONE = "resnet50"
        # the fork's 5-block stage 4 (model_transformer.py:600)
        RESNET50_STAGE4_BLOCKS = 5
        TOP_DOWN_PYRAMID_SIZE = g["top_down"]
        FPN_CLASSIF_FC_LAYERS_SIZE = g["fc_size"]
        IMAGE_MIN_DIM = g["image_size"]
        IMAGE_MAX_DIM = g["image_size"]
        RPN_ANCHOR_SCALES = tuple(g["anchor_scales"])
        PRE_NMS_LIMIT = 512
        POST_NMS_ROIS_INFERENCE = 100
        DETECTION_MAX_INSTANCES = 10
        DETECTION_MIN_CONFIDENCE = 0.0
        TRANSFORMER = True
        # the reference's hardcoded encoder (model_transformer.py:361)
        XFORMER_NUM_LAYERS = 6
        XFORMER_D_MODEL = g["top_down"]
        XFORMER_NUM_HEADS = 8
        XFORMER_DFF = 256
        XFORMER_TARGET_SIZE = g["image_size"] // 32
        XFORMER_FAITHFUL_PAIRING = True
        samples = g["samples"]
        COMPUTE_DTYPE = "float32"
        USE_PALLAS = False

    return GoldenXFConfig()


def run_check():
    import jax

    # parity must be f32-exact: XLA:CPU on AMX hosts otherwise lowers
    # default-precision f32 convs/matmuls through bf16 fastmath (see
    # tools/check_multiview_golden.py::run_check)
    with jax.default_matmul_precision("highest"):
        return _run_check_inner()


def _run_check_inner():
    from mulit_view_object_detection_tpu.compat.model import MaskRCNN
    from mulit_view_object_detection_tpu.eval.metrics import (
        greedy_box_matches)
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_h5_from_inventory)

    fixture, inventory_path = fixture_paths()
    fx = np.load(fixture)
    with open(inventory_path) as f:
        inventory = json.load(f)

    h5 = "/tmp/check_transformer_golden.h5"
    write_h5_from_inventory(h5, inventory, seed=GOLDEN_XF["seed"])

    cfg = build_config()
    engine = MaskRCNN("inference", cfg, "/tmp/check_xf_logs")
    engine.load_weights(h5, by_name=True)

    views = np.asarray(fx["views"])
    g = engine.run_graph([views], outputs=["detections", "mrcnn_masks"],
                         Rcam=np.asarray(fx["Rcam"]),
                         Kmat=np.asarray(fx["Kmat"]),
                         depths=np.asarray(fx["depths"]))
    molded, _, windows = engine.mold_inputs(views)
    rois_px, class_ids, scores, masks = engine.unmold_detections(
        np.asarray(g["detections"])[0], np.asarray(g["mrcnn_masks"])[0],
        views[0].shape, molded[0].shape, windows[0])

    raw_det_err = float(np.max(np.abs(
        np.asarray(g["detections"])[0] - fx["raw_detections"])))
    raw_mask_err = float(np.max(np.abs(
        np.asarray(g["mrcnn_masks"])[0] - fx["raw_masks"])))

    g_rois = np.asarray(fx["rois"], np.float32)
    g_cls = np.asarray(fx["class_ids"])
    g_scores = np.asarray(fx["scores"])
    g_masks = np.asarray(fx["masks"])
    n_gold, n_ours = len(g_cls), len(class_ids)

    matches = greedy_box_matches(g_rois, g_cls,
                                 np.asarray(rois_px, np.float32),
                                 class_ids, iou_threshold=0.9)
    matched, score_err, mask_iou_min = len(matches), 0.0, 1.0
    for gi, oi, _ in matches:
        score_err = max(score_err,
                        abs(float(scores[oi]) - float(g_scores[gi])))
        gm = g_masks[..., gi]
        om = np.asarray(masks[..., oi]).astype(bool)
        union = np.logical_or(gm, om).sum()
        if union:
            mask_iou_min = min(mask_iou_min,
                               np.logical_and(gm, om).sum() / union)

    ok = (matched >= n_gold - 1 and abs(n_gold - n_ours) <= 1
          and score_err < 0.02
          and raw_mask_err < 5e-3 and raw_det_err < 1e-4)
    result = {
        "metric": "transformer_fullgraph_parity",
        "reference_detections": int(n_gold),
        "our_detections": int(n_ours),
        "matched_iou90_same_class": int(matched),
        "max_score_err": round(score_err, 5),
        "min_mask_iou": round(float(mask_iou_min), 4),
        "raw_det_err": round(raw_det_err, 6),
        "raw_mask_err": round(raw_mask_err, 6),
        "ok": bool(ok),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    res = run_check()
    out = os.path.join(REPO, "TRANSFORMER_PARITY_r04.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    raise SystemExit(0 if res["ok"] else 1)
