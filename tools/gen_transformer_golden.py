"""Generate a FULL-GRAPH TRANSFORMER-FUSION parity golden from the reference.

Runs the reference's complete transformer-fusion inference pipeline
(mrcnn/model_transformer.py:2330-2600 build + :3053-3120 detect — per-view
resnet50/FPN, depth-conditioned unproj_vector ray lift, 3-axis sinusoidal
positional encoding, the hardcoded 6-layer/72-d/8-head/dff-256 encoder
(model_transformer.py:361), token projection to the 20x20 P5 grid, P5
residual add with every other level zeroed (:2419-2438), RPN/heads/
DetectionLayer) on deterministic name-seeded weights and a fixed 2-view
input with known extrinsics/intrinsics/depths. Saves inputs + detections
+ raw detection/mask probabilities to
tests/fixtures/golden_transformer.npz and the weight inventory to
tests/fixtures/golden_transformer_layers.json.

tools/check_transformer_golden.py reconstructs the same weights from the
inventory, loads them through the repo's h5 importer (exercising the
encoder checkpoint mapping: per-layer wq/wk/wv/out Dense -> flax MHA
head-split kernels, FFN, LayerNormalization gamma/beta, final token
projection), runs the repo's engine with XFORMER_FAITHFUL_PAIRING=True
(reproducing the reference's feature-scale ray vectors and transposed
ray/feature pairing — see ops/projection.py::unproject_rays), and
compares detections. This is BASELINE config #4's whole-graph check.

Run (CPU, ~5-15 min): python tools/gen_transformer_golden.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H5_PATH = "/tmp/golden_transformer.h5"

# shared operating point (mirrored by tools/check_transformer_golden.py).
# d_model=72=TOP_DOWN_PYRAMID_SIZE and the 6/8/256 encoder are the
# reference's hardcoded call-site values (model_transformer.py:361,
# interior_transformer.py:378-407); anchors keep the faithful config.py:76
# ladder — with random weights the winning proposals are the 512 px P5
# anchors, which ROUTE back to the only informative (fused) level.
GOLDEN_XF = dict(num_classes=4, num_views=2, top_down=72, fc_size=128,
                 image_size=640, samples=1, seed=17, image_seed=31,
                 depth_seed=43,
                 anchor_scales=(32, 64, 128, 256, 512))


def fixture_paths():
    fixture = os.path.join(REPO, "tests", "fixtures",
                           "golden_transformer.npz")
    inventory = os.path.join(REPO, "tests", "fixtures",
                             "golden_transformer_layers.json")
    return fixture, inventory


def install_transformer_shims(tf):
    """On top of install_multiview_shims: the TF1 APIs that only the
    transformer path touches."""
    # utils.LayerNormalization's non-fused path (always taken: its
    # epsilon 1e-6 < the fused floor 1.001e-5, utils.py:129) calls
    # nn.moments(..., keep_dims=True) — renamed keepdims in TF2. Patch
    # via the pre-registered tensorflow.nn module so mrcnn/utils.py's
    # `import tensorflow.nn` (utils.py:21) cannot rebind it away.
    sys.modules.setdefault("tensorflow.nn", tf.nn)
    sys.modules.setdefault("tensorflow.math", tf.math)
    _moments = tf.nn.moments

    def _tf1_moments(x, axes, shift=None, name=None, keep_dims=None,
                     keepdims=None):
        if keepdims is None:
            keepdims = bool(keep_dims)
        return _moments(x, axes, shift=shift, keepdims=keepdims, name=name)

    tf.nn.moments = _tf1_moments
    return tf


def reference_config_cls(Config):
    g = GOLDEN_XF

    class GoldenXFConfig(Config):
        NAME = "golden_transformer"
        GPU_COUNT = 1
        IMAGES_PER_GPU = 1
        NUM_CLASSES = g["num_classes"]
        NUM_VIEWS = g["num_views"]
        BACKBONE = "resnet50"
        TOP_DOWN_PYRAMID_SIZE = g["top_down"]
        FPN_CLASSIF_FC_LAYERS_SIZE = g["fc_size"]
        IMAGE_MIN_DIM = g["image_size"]
        IMAGE_MAX_DIM = g["image_size"]
        RPN_ANCHOR_SCALES = g["anchor_scales"]
        PRE_NMS_LIMIT = 512
        POST_NMS_ROIS_INFERENCE = 100
        DETECTION_MAX_INSTANCES = 10
        DETECTION_MIN_CONFIDENCE = 0.0
        TRANSFORMER = True
        VANILLA = False
        GRID_REAS = "ident"        # unused on the transformer path
        samples = g["samples"]

    return GoldenXFConfig


def golden_inputs():
    """Deterministic 2-view input + per-view 20x20 metric depth maps."""
    from tools.gen_multiview_golden import GOLDEN_MV, golden_views
    g = GOLDEN_XF
    # reuse the multiview golden's camera geometry; re-seed the images
    saved = dict(GOLDEN_MV)
    GOLDEN_MV["image_seed"] = g["image_seed"]
    GOLDEN_MV["num_views"] = g["num_views"]
    GOLDEN_MV["image_size"] = g["image_size"]
    try:
        views, Rcam, Kmat = golden_views()
    finally:
        GOLDEN_MV.update(saved)
    s = g["image_size"] // 32
    rng = np.random.RandomState(g["depth_seed"])
    depths = (2.0 + 5.0 * rng.rand(1, g["num_views"], s, s)).astype(
        np.float32)
    return views, Rcam, Kmat, depths


def main():
    sys.path.insert(0, REPO)
    from tools.gen_multiview_golden import (
        install_multiview_shims, patch_modellib)

    fixture, inventory_path = fixture_paths()
    tf = install_multiview_shims()
    install_transformer_shims(tf)

    sys.path.insert(0, "/root/reference")
    from mrcnn import model_transformer as modellib
    from mrcnn.config import Config

    patch_modellib(tf, modellib)   # repeat_tensor + DetectionLayer re-pin

    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_h5_from_inventory)

    cfg = reference_config_cls(Config)()
    model = modellib.MaskRCNN("inference", cfg, "/tmp/golden_xf_logs")

    # same keras-2.0.8 predict slicing semantics as the multiview golden
    _orig_predict = model.keras_model.predict

    def _sliced_predict(inputs, **kw):
        b = cfg.BATCH_SIZE
        return _orig_predict([a[:b] for a in inputs], **kw)

    model.keras_model.predict = _sliced_predict

    inventory = []
    for layer in model.keras_model.layers:
        if layer.weights:
            inventory.append({
                "layer": layer.name,
                "weights": [{"name": w.name,
                             "shape": [int(d) for d in w.shape]}
                            for w in layer.weights],
            })
    with open(inventory_path, "w") as f:
        json.dump(inventory, f, indent=1)

    write_h5_from_inventory(H5_PATH, inventory, seed=GOLDEN_XF["seed"])
    model.load_weights(H5_PATH, by_name=True)

    views, Rcam, Kmat, depths = golden_inputs()
    r = model.detect([views], Rcam, Kmat, depths, verbose=0)[0]

    import keras.models as KM
    km = model.keras_model
    sub = KM.Model(km.inputs, [km.get_layer("mrcnn_detection").output,
                               km.get_layer("mrcnn_mask").output])
    molded, metas, _ = model.mold_inputs(views)
    anchors = model.get_anchors(molded[0].shape)
    raw_det, raw_masks = sub.predict(
        [molded[None], metas[None][:, 0], anchors[None], Rcam, Kmat,
         depths], verbose=0)

    np.savez_compressed(
        fixture,
        views=views, Rcam=Rcam, Kmat=Kmat, depths=depths,
        rois=r["rois"].astype(np.float32),
        class_ids=r["class_ids"].astype(np.int32),
        scores=r["scores"].astype(np.float32),
        masks=r["masks"].astype(bool),
        raw_detections=raw_det[0].astype(np.float32),
        raw_masks=raw_masks[0].astype(np.float32),
        **{f"cfg_{k}": np.asarray(v) for k, v in GOLDEN_XF.items()})
    print(f"wrote {fixture}: {len(r['class_ids'])} detections, "
          f"masks {r['masks'].shape}, "
          f"scores [{r['scores'].min():.4f}, {r['scores'].max():.4f}]")


if __name__ == "__main__":
    main()
