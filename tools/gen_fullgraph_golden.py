"""Generate a FULL-GRAPH single-view parity golden from the reference.

Runs the reference's complete inference graph (mrcnn/model.py:2489-2545:
MaskRCNN('inference').detect -> mold_inputs -> keras graph -> NMS ->
unmold) on deterministic seeded weights and a fixed image, and saves the
input + final detections/masks to tests/fixtures/golden_fullgraph.npz.

tests/test_fullgraph_parity.py then reconstructs the SAME weights via
utils.h5_fixture.write_matterport_h5 (byte-exact keras-2 h5 layout, same
seed), loads them through the repo's h5 importer, runs the repo's compat
engine on the same image, and compares — whole-graph, weights-through-
detections parity against the actually-executed reference (BASELINE
config #1), not a re-derivation.

The reference is TF1/keras-2 code; this environment has TF 2.21 +
tf_keras. The shims below bridge exactly what the reference touches:
TF1 aliases removed from the tf namespace, a 'keras' module tree backed
by tf_keras, and a stub 'skimage' (not installed here; the reference
only calls it for image RESIZING, which a pre-sized input never hits).

Run (CPU, ~2-4 min):

    python tools/gen_fullgraph_golden.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "golden_fullgraph.npz")
H5_PATH = "/tmp/golden_fullgraph.h5"

# one shared definition of the golden operating point — the test must
# build the identical network (imported from here by the parity test)
GOLDEN = dict(num_classes=4, architecture="resnet50", top_down=64,
              fc_size=128, mask_filters=256, seed=7, image_size=128,
              image_seed=11)


def install_shims():
    import tensorflow as tf

    # TF1 symbols the TF1-era reference calls (model.py uses tf.log,
    # tf.random_shuffle, tf.sparse_tensor_to_dense,
    # tf.sets.set_intersection)
    tf.log = tf.math.log
    tf.random_shuffle = tf.compat.v1.random_shuffle
    tf.sparse_tensor_to_dense = tf.compat.v1.sparse_tensor_to_dense
    tf.sets.set_intersection = tf.sets.intersection
    tf.to_float = lambda x: tf.cast(x, tf.float32)

    import tf_keras
    from tf_keras.src.engine.base_layer import Layer
    from tf_keras.src.saving.legacy import hdf5_format

    eng = types.ModuleType("keras.engine")
    eng.Layer = Layer
    saving = types.ModuleType("keras.engine.saving")

    # keras 2.x passed a LIST of layers; tf_keras wants a model object
    def _wrap_loader(fn):
        def load(f, layers, **kw):
            ls = list(layers)
            shim = types.SimpleNamespace(
                layers=ls, _flatten_layers=lambda *a, **k: iter(ls))
            return fn(f, shim, **kw)
        return load

    saving.load_weights_from_hdf5_group = \
        _wrap_loader(hdf5_format.load_weights_from_hdf5_group)
    saving.load_weights_from_hdf5_group_by_name = \
        _wrap_loader(hdf5_format.load_weights_from_hdf5_group_by_name)
    eng.saving = saving
    # `import keras.engine as KE` binds KE via getattr(keras, "engine")
    tf_keras.engine = eng

    # keras 2.0.8 accepted None dims in Reshape target shapes (the
    # reference's mrcnn_bbox head does Reshape((num_rois=None, C, 4)),
    # model.py fpn_classifier_graph); TF2-era keras wants -1
    _Reshape = tf_keras.layers.Reshape

    class _NoneSafeReshape(_Reshape):
        def __init__(self, target_shape, **kw):
            super().__init__(tuple(-1 if d is None else d
                                   for d in target_shape), **kw)

    tf_keras.layers.Reshape = _NoneSafeReshape
    sys.modules["keras"] = tf_keras
    sys.modules["keras.engine"] = eng
    sys.modules["keras.engine.saving"] = saving
    sys.modules["keras.layers"] = tf_keras.layers
    sys.modules["keras.backend"] = tf_keras.backend
    sys.modules["keras.models"] = tf_keras.models
    sys.modules["keras.utils"] = tf_keras.utils
    sys.modules["keras.initializers"] = tf_keras.initializers
    sys.modules["keras.regularizers"] = tf_keras.regularizers

    # skimage stub: mrcnn/utils.py imports it at module level. The
    # pre-sized golden input skips image resizing, but unmold_mask
    # (utils.py:829) resizes each 28x28 mask to its box via
    # skimage.transform.resize(order=1, preserve_range=True,
    # anti_aliasing=False) — reproduce that bilinear warp exactly
    # (output pixel centers mapped to input coords, constant padding).
    def _resize(image, output_shape, order=1, mode="constant", cval=0,
                clip=True, preserve_range=False, anti_aliasing=False,
                anti_aliasing_sigma=None):
        import scipy.ndimage as ndi
        img = np.asarray(image, np.float64)
        in_h, in_w = img.shape[:2]
        out_h, out_w = int(output_shape[0]), int(output_shape[1])
        rows = (np.arange(out_h) + 0.5) * (in_h / out_h) - 0.5
        cols = (np.arange(out_w) + 0.5) * (in_w / out_w) - 0.5
        rr, cc = np.meshgrid(rows, cols, indexing="ij")
        coords = np.stack([rr, cc])
        if img.ndim == 2:
            out = ndi.map_coordinates(img, coords, order=order,
                                      mode="constant", cval=cval)
        else:
            out = np.stack([
                ndi.map_coordinates(img[..., c], coords, order=order,
                                    mode="constant", cval=cval)
                for c in range(img.shape[-1])], axis=-1)
        if clip:
            out = np.clip(out, img.min(), img.max())
        return out

    def _unused(*a, **k):
        raise RuntimeError("skimage stub called on an unimplemented "
                           "function — the golden path should not need it")

    sk = types.ModuleType("skimage")
    sk.__version__ = "0.19.0"
    for sub in ("color", "io", "transform"):
        m = types.ModuleType(f"skimage.{sub}")
        for fn in ("gray2rgb", "imread"):
            setattr(m, fn, _unused)
        m.resize = _resize
        setattr(sk, sub, m)
        sys.modules[f"skimage.{sub}"] = m
    sys.modules["skimage"] = sk
    return tf


def golden_image():
    rng = np.random.RandomState(GOLDEN["image_seed"])
    s = GOLDEN["image_size"]
    # blocky structure + noise: gives the random-weight RPN spatially
    # varying responses (pure noise images make every anchor score
    # near-identical and tie-order noise dominates)
    img = rng.randint(0, 255, (s // 16, s // 16, 3), np.uint8)
    img = np.kron(img, np.ones((16, 16, 1), np.uint8))
    img = img.astype(np.int32) + rng.randint(-20, 20, (s, s, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def reference_config_cls(Config):
    g = GOLDEN

    class GoldenConfig(Config):
        NAME = "golden_fullgraph"
        GPU_COUNT = 1
        IMAGES_PER_GPU = 1
        NUM_CLASSES = g["num_classes"]
        BACKBONE = g["architecture"]
        TOP_DOWN_PYRAMID_SIZE = g["top_down"]
        FPN_CLASSIF_FC_LAYERS_SIZE = g["fc_size"]
        IMAGE_MIN_DIM = g["image_size"]
        IMAGE_MAX_DIM = g["image_size"]
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        PRE_NMS_LIMIT = 512
        POST_NMS_ROIS_INFERENCE = 100
        DETECTION_MAX_INSTANCES = 10
        # random weights give arbitrary confidences; 0 keeps a full,
        # deterministic set of detections to compare
        DETECTION_MIN_CONFIDENCE = 0.0

    return GoldenConfig


HEADS_FIXTURE = os.path.join(REPO, "tests", "fixtures",
                             "golden_heads.npz")


def gen_head_goldens(modellib, model, cfg, molded, metas, anchors):
    """STRICT kernel-level goldens for the two head subgraphs the
    full-graph match only covers loosely: the classifier conv-as-FC
    stack (model.py:904-957 fpn_classifier_graph) and the mask deconv
    head (model.py:960-1003 build_fpn_mask_graph). Runs the reference's
    own head graphs — weights copied from the loaded full model — on the
    real FPN features and a FIXED seeded ROI set (no NMS in the loop, so
    outputs are directly comparable at tight tolerance)."""
    import keras.layers as KL
    import keras.models as KM

    km = model.keras_model
    p_names = ["fpn_p2", "fpn_p3", "fpn_p4", "fpn_p5"]
    feat_model = KM.Model(
        km.inputs, [km.get_layer(n).output for n in p_names])
    feats = feat_model.predict([molded, metas, anchors[None]], verbose=0)

    rng = np.random.RandomState(23)
    n_rois = 32
    y1x1 = rng.uniform(0.0, 0.8, (1, n_rois, 2)).astype(np.float32)
    hw = rng.uniform(0.05, 0.5, (1, n_rois, 2)).astype(np.float32)
    rois = np.concatenate([y1x1, np.minimum(y1x1 + hw, 1.0)], axis=-1)
    rois[0, 0] = [0.0, 0.0, 1.0, 1.0]          # full frame
    rois[0, 1] = [0.25, 0.25, 0.25, 0.25]      # degenerate
    rois[0, 2] = [0.0, 0.0, 0.0, 0.0]          # zero padding convention

    rois_in = KL.Input(shape=[n_rois, 4])
    meta_in = KL.Input(shape=[metas.shape[1]])
    feat_ins = [KL.Input(shape=f.shape[1:]) for f in feats]
    _, probs, bbox = modellib.fpn_classifier_graph(
        rois_in, feat_ins, meta_in, cfg.POOL_SIZE, cfg.NUM_CLASSES,
        train_bn=False, fc_layers_size=cfg.FPN_CLASSIF_FC_LAYERS_SIZE)
    cls_model = KM.Model([rois_in, meta_in] + feat_ins, [probs, bbox])

    rois_in2 = KL.Input(shape=[n_rois, 4])
    meta_in2 = KL.Input(shape=[metas.shape[1]])
    feat_ins2 = [KL.Input(shape=f.shape[1:]) for f in feats]
    masks = modellib.build_fpn_mask_graph(
        rois_in2, feat_ins2, meta_in2, cfg.MASK_POOL_SIZE,
        cfg.NUM_CLASSES, train_bn=False)
    mask_model = KM.Model([rois_in2, meta_in2] + feat_ins2, masks)

    head_layers = ["mrcnn_class_conv1", "mrcnn_class_bn1",
                   "mrcnn_class_conv2", "mrcnn_class_bn2",
                   "mrcnn_class_logits", "mrcnn_bbox_fc"]
    mask_layers = [f"mrcnn_mask_conv{i}" for i in range(1, 5)] + \
                  [f"mrcnn_mask_bn{i}" for i in range(1, 5)] + \
                  ["mrcnn_mask_deconv", "mrcnn_mask"]
    for name in head_layers:
        cls_model.get_layer(name).set_weights(
            km.get_layer(name).get_weights())
    for name in mask_layers:
        mask_model.get_layer(name).set_weights(
            km.get_layer(name).get_weights())

    g_probs, g_bbox = cls_model.predict(
        [rois, metas] + list(feats), verbose=0)
    g_masks = mask_model.predict([rois, metas] + list(feats), verbose=0)

    np.savez_compressed(
        HEADS_FIXTURE, rois=rois, meta=metas.astype(np.float32),
        probs=g_probs, bbox=g_bbox, masks=g_masks,
        **{n: f for n, f in zip(p_names, feats)})
    print(f"wrote {HEADS_FIXTURE}: probs {g_probs.shape} "
          f"bbox {g_bbox.shape} masks {g_masks.shape}")


def main():
    tf = install_shims()

    sys.path.insert(0, "/root/reference")
    from mrcnn import model as modellib
    from mrcnn.config import Config

    # keras 2.0.8 pinned custom-layer output shapes from
    # compute_output_shape; tf_keras leaves the ROI count dynamic (the
    # ProposalLayer top-k uses a tensor k), and refine_detections_graph
    # then hits `tf.range(probs.shape[0]=None)`. Re-pin the static
    # shapes the TF1 build used to see.
    _det_call = modellib.DetectionLayer.call

    def _pinned_det_call(self, inputs):
        rois, probs, deltas, meta = inputs
        b = self.config.BATCH_SIZE
        n = self.config.POST_NMS_ROIS_INFERENCE
        rois.set_shape((b, n, 4))
        probs.set_shape((b, n, self.config.NUM_CLASSES))
        deltas.set_shape((b, n, self.config.NUM_CLASSES, 4))
        return _det_call(self, [rois, probs, deltas, meta])

    modellib.DetectionLayer.call = _pinned_det_call

    sys.path.insert(0, REPO)
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_matterport_h5)

    g = GOLDEN
    write_matterport_h5(
        H5_PATH, num_classes=g["num_classes"],
        architecture=g["architecture"], top_down=g["top_down"],
        fc_size=g["fc_size"], mask_filters=g["mask_filters"],
        seed=g["seed"], init="fanin")

    cfg = reference_config_cls(Config)()
    model = modellib.MaskRCNN("inference", cfg, "/tmp/golden_logs")
    # exercises the reference's own by-name h5 loader on the
    # reconstructed file — a layout mismatch would fail loudly here
    model.load_weights(H5_PATH, by_name=True)

    image = golden_image()
    r = model.detect([image], verbose=0)[0]
    molded, metas, windows = model.mold_inputs([image])
    anchors = model.get_anchors(molded[0].shape)

    # intermediate proposals for diagnosability (best-effort)
    extras = {}
    try:
        import keras.models as KM
        sub = KM.Model(model.keras_model.inputs,
                       model.keras_model.get_layer("ROI").output)
        extras["proposals"] = sub.predict(
            [molded, metas, anchors[None]], verbose=0)[0]
    except Exception as e:  # pragma: no cover
        print("proposals capture skipped:", e)

    gen_head_goldens(modellib, model, cfg, molded, metas, anchors)

    out = dict(
        image=image,
        rois=r["rois"].astype(np.float32),
        class_ids=r["class_ids"].astype(np.int32),
        scores=r["scores"].astype(np.float32),
        masks=r["masks"].astype(bool),
        anchors=anchors.astype(np.float32),
        **{f"cfg_{k}": np.asarray(v) for k, v in g.items()},
        **extras,
    )
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    np.savez_compressed(FIXTURE, **out)
    print(f"wrote {FIXTURE}: {len(r['class_ids'])} detections, "
          f"masks {r['masks'].shape}, "
          f"scores [{r['scores'].min():.4f}, {r['scores'].max():.4f}]")


if __name__ == "__main__":
    main()
