"""Generate a FULL-GRAPH MULTI-VIEW parity golden from the reference.

Runs the reference's complete multi-view inference pipeline
(mrcnn/model_multi.py:2300-2560 build + :3019-3082 detect — per-view
resnet50/FPN, unproj_feat voxel unprojection, conv3d U-Net grid fusion,
proj_grid reprojection, depth_sampling collapse, zeroed PG2/PG3 memory
cap, RPN/heads/DetectionLayer) on deterministic name-seeded weights and
a fixed 2-view input with known extrinsics/intrinsics, then saves input
+ detections/masks to tests/fixtures/golden_multiview.npz and the weight
INVENTORY (layer/weight names + shapes) to
tests/fixtures/golden_multiview_layers.json.

tools/check_multiview_golden.py reconstructs the same weights from the
inventory (utils.h5_fixture.write_h5_from_inventory), loads them through
the repo's h5 importer — exercising the multi-view fork's checkpoint
protocol end to end — runs the repo's engine on the same input, and
compares final detections. This is BASELINE config #2's whole-graph
check: projection geometry, fusion, collapse, routing and heads all sit
between input and output.

The graph is built at the reference's REQUIRED 640^2 geometry
(proj_grid sizes are hardcoded to 160/80/40/20/10 at
model_multi.py:2393-2397), with a small voxel grid (16^3, samples=4) to
keep the CPU run tractable.

Run (CPU, ~5-15 min): python tools/gen_multiview_golden.py
"""

from __future__ import annotations

import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
H5_PATH = "/tmp/golden_multiview.h5"

# shared operating point (mirrored by tools/check_multiview_golden.py)
GOLDEN_MV = dict(num_classes=4, num_views=2, top_down=64, fc_size=128,
                 image_size=640, nvox=16, nvox_z=16, vmin=-2.0, vmax=2.0,
                 vmin_z=1.0, vmax_z=7.0, samples=4, seed=13, image_seed=29,
                 # anchors x2 vs default: top-k proposals come from the
                 # 256 px tier, which ROUTES to the fused P4 — with the
                 # default ladder every winning proposal is a 128 px box
                 # that routes to the ZEROED P3 and classifies BG
                 anchor_scales=(64, 128, 256, 512, 1024))


def install_multiview_shims():
    """Everything model_multi.py needs on top of gen_fullgraph_golden's
    shims: more TF1 aliases, the keras session bootstrap, contrib.slim,
    closure-captured-KerasTensor Lambdas, and a stubbed mrcnn.recurrent
    (conv3d fusion never instantiates the ConvLSTM)."""
    from tools.gen_fullgraph_golden import install_shims
    tf = install_shims()

    tf.matrix_transpose = tf.linalg.matrix_transpose
    tf.matrix_triangular_solve = tf.linalg.triangular_solve
    tf.variable_scope = tf.compat.v1.variable_scope
    tf.ConfigProto = tf.compat.v1.ConfigProto
    tf.Session = tf.compat.v1.Session

    import tf_keras
    tb = types.ModuleType("keras.backend.tensorflow_backend")
    tb.set_session = lambda sess: None
    sys.modules["keras.backend.tensorflow_backend"] = tb
    tf_keras.backend.tensorflow_backend = tb

    contrib = types.ModuleType("tensorflow.contrib")
    slim = types.ModuleType("tensorflow.contrib.slim")
    slim.initializers = types.SimpleNamespace(
        xavier_initializer=lambda *a, **k: "glorot_uniform")
    contrib.slim = slim
    sys.modules["tensorflow.contrib"] = contrib
    sys.modules["tensorflow.contrib.slim"] = slim
    tf.contrib = contrib

    # keras 2.0.8 Lambdas may CAPTURE symbolic tensors in their closure
    # (model_multi.py:438 concats `deconv1` from an enclosing scope);
    # tf_keras requires every symbolic input to flow through the call.
    # Lift closure-captured KerasTensors into extra inputs and rebind
    # the closure cells to the traced tensors at call time.
    from tf_keras.src.engine.keras_tensor import KerasTensor
    _KL_Lambda = tf_keras.layers.Lambda

    def closure_lifting_lambda(function, **kwargs):
        cells, kts = [], []
        for cell in (function.__closure__ or ()):
            try:
                v = cell.cell_contents
            except ValueError:
                continue
            if isinstance(v, KerasTensor):
                cells.append(cell)
                kts.append(v)
        if not kts:
            return _KL_Lambda(function, **kwargs)

        class _Bound:
            def __call__(self, inputs, **ckw):
                orig_is_list = isinstance(inputs, (list, tuple))
                orig = list(inputs) if orig_is_list else [inputs]
                n = len(orig)

                def wrapped(args):
                    for cell, t in zip(cells, args[n:]):
                        cell.cell_contents = t
                    base = args[:n]
                    return function(base if orig_is_list else base[0])

                return _KL_Lambda(wrapped, **kwargs)(orig + kts, **ckw)

        return _Bound()

    tf_keras.layers.Lambda = closure_lifting_lambda

    # The reference computes unclipped bilinear taps and relies on
    # tf.gather_nd's GPU zero-fill for out-of-bounds indices
    # (model_multi.py:190-215); on CPU the same op ERRORS. Reproduce the
    # GPU semantics: clip for safety, zero the invalid rows. (The repo's
    # ops/projection.py implements exactly this contract natively.)
    _gnd = tf.gather_nd

    def _gpu_like_gather_nd(params, indices, **kw):
        nd = indices.shape[-1]
        lims = tf.cast(tf.shape(params)[:nd], indices.dtype)
        valid = tf.reduce_all((indices >= 0) & (indices < lims), axis=-1)
        out = _gnd(params, tf.clip_by_value(indices, 0, lims - 1), **kw)
        extra = params.shape.rank - int(nd)
        v = tf.reshape(
            tf.cast(valid, out.dtype),
            tf.concat([tf.shape(valid),
                       tf.ones([extra], tf.int32)], axis=0))
        return out * v

    tf.gather_nd = _gpu_like_gather_nd

    # TF1 tf.zeros tolerated float dims (the zeroed-PG shapes use `/`)
    _tf_zeros = tf.zeros
    tf.zeros = lambda shape, *a, **k: _tf_zeros(
        [int(s) if isinstance(s, float) else s for s in shape]
        if isinstance(shape, (list, tuple)) else shape, *a, **k)

    rec = types.ModuleType("mrcnn.recurrent")

    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError("ConvRNN3D/ConvLSTMCell stubbed out — the "
                               "conv3d golden never builds lstm3d; "
                               "lstm3d runs install_recurrent_shims")

    rec.ConvRNN3D = _Unavailable
    rec.ConvLSTMCell = _Unavailable
    sys.modules["mrcnn.recurrent"] = rec
    return tf


def install_recurrent_shims(tf):
    """The keras-2.0.8 internals mrcnn/recurrent.py imports, mapped onto
    tf_keras, so the reference's REAL ConvRNN3D/ConvLSTMCell (fused
    'weights_lstm3d' gate conv, K.rnn over the view axis,
    recurrent.py:28-478) executes for the lstm3d golden. Replaces the
    _Unavailable stub installed above."""
    import inspect

    import tf_keras
    from tf_keras.src.engine.base_layer import Layer
    from tf_keras.src.engine.input_spec import InputSpec
    from tf_keras.src.layers.rnn import rnn_utils
    from tf_keras.src.utils import conv_utils

    # ConvLSTMCell.call reads x.shape[-1].value (TF1 Dimension API)
    tf.compat.v1.disable_v2_tensorshape()

    # keras.layers.recurrent: _standardize_args kept the same signature
    # in tf_keras; _generate_dropout_mask is imported but never called
    krec = types.ModuleType("keras.layers.recurrent")
    krec.RNN = tf_keras.layers.RNN
    krec._standardize_args = rnn_utils.standardize_args
    krec._generate_dropout_mask = None
    sys.modules["keras.layers.recurrent"] = krec

    # keras 2.0.8's InputSpec stored whatever it was given; tf_keras
    # validates dims. ConvRNN3D.build puts whole TensorShapes into its
    # state_spec dims (recurrent.py:133-137) — coerce those to None
    # (the state_spec is only consumed on the explicit-initial-state
    # path, which the reference never takes).
    class _LaxInputSpec(InputSpec):
        def __init__(self, shape=None, **kw):
            if shape is not None:
                dims = []
                for d in shape:
                    try:
                        dims.append(None if d is None else int(d))
                    except TypeError:
                        dims.append(None)
                shape = tuple(dims)
            super().__init__(shape=shape, **kw)

    base_layer = types.ModuleType("keras.engine.base_layer")
    base_layer.InputSpec = _LaxInputSpec
    base_layer.Layer = Layer
    sys.modules["keras.engine.base_layer"] = base_layer

    gen = types.ModuleType("keras.utils.generic_utils")

    def has_arg(fn, name, accept_all=False):
        sig = inspect.signature(fn)
        if accept_all and any(p.kind == p.VAR_KEYWORD
                              for p in sig.parameters.values()):
            return True
        return name in sig.parameters

    def to_list(x, allow_tuple=False):
        if isinstance(x, list):
            return x
        if allow_tuple and isinstance(x, tuple):
            return list(x)
        return [x]

    def transpose_shape(shape, target_format, spatial_axes):
        if target_format == "channels_last":      # the only format used
            return shape
        raise NotImplementedError(target_format)

    gen.has_arg = has_arg
    gen.to_list = to_list
    gen.transpose_shape = transpose_shape
    sys.modules["keras.utils.generic_utils"] = gen
    tf_keras.utils.conv_utils = conv_utils      # `from keras.utils import`
    sys.modules["keras.utils.conv_utils"] = conv_utils

    # imported at recurrent.py:18-19, never used at runtime
    legacy = types.ModuleType("keras.legacy")
    legacy.interfaces = types.ModuleType("keras.legacy.interfaces")
    legacy_layers = types.ModuleType("keras.legacy.layers")
    legacy_layers.Recurrent = type("Recurrent", (), {})
    legacy_layers.ConvRecurrent2D = type("ConvRecurrent2D", (), {})
    legacy.layers = legacy_layers
    sys.modules["keras.legacy"] = legacy
    sys.modules["keras.legacy.interfaces"] = legacy.interfaces
    sys.modules["keras.legacy.layers"] = legacy_layers
    sys.modules["keras.activations"] = tf_keras.activations
    sys.modules["keras.constraints"] = tf_keras.constraints

    # tf_keras dropped ConvRNN2D (generalized to ConvRNN); the reference
    # ConvRNN3D overrides every spatial method, so RNN with the keras-2
    # constructor contract is the needed base. keras-2 RNNs used
    # _num_constants=None as the "no constants" sentinel (tf_keras uses
    # 0), and ConvRNN3D.build branches on `is not None`.
    class ConvRNN2D(tf_keras.layers.RNN):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._num_constants = None

    tf_keras.layers.ConvRNN2D = ConvRNN2D

    # TF1 API shims: LSTMStateTuple as a K.rnn-flattenable plain list
    # (matches get_initial_state's [state, state]); tf.nn.convolution
    # took padding as the 3rd POSITIONAL arg in TF1 (recurrent.py:457)
    contrib_rnn = types.ModuleType("tensorflow.contrib.rnn")
    contrib_rnn.LSTMStateTuple = lambda c, h: [c, h]
    tf.contrib.rnn = contrib_rnn
    sys.modules["tensorflow.contrib.rnn"] = contrib_rnn

    # mrcnn/utils.py:21 does `import tensorflow.nn as nn`, which
    # re-imports the submodule and REBINDS tf.nn to a fresh module
    # object, clobbering any patched attribute; pre-registering the
    # current module under its dotted path makes that import a no-op.
    sys.modules.setdefault("tensorflow.nn", tf.nn)
    sys.modules.setdefault("tensorflow.math", tf.math)

    _conv = tf.nn.convolution

    def _tf1_convolution(inp, filters, *args, **kw):
        if args and isinstance(args[0], str):
            kw.setdefault("padding", args[0])
            args = args[1:]
        return _conv(inp, filters, *args, **kw)

    tf.nn.convolution = _tf1_convolution

    # real module this time
    sys.modules.pop("mrcnn.recurrent", None)
    import mrcnn.recurrent as recurrent

    # keras 2.0.8 handed build() plain int tuples; tf_keras passes
    # TensorShape, which breaks ConvRNN3D.build's tuple concatenation
    # (recurrent.py:102). Re-pin the keras-2 contract.
    _orig_build = recurrent.ConvRNN3D.build

    def _tuple_build(self, input_shape):
        if hasattr(input_shape, "as_list"):
            input_shape = tuple(input_shape.as_list())
        elif isinstance(input_shape, list):
            input_shape = [tuple(s.as_list()) if hasattr(s, "as_list")
                           else s for s in input_shape]
        return _orig_build(self, input_shape)

    recurrent.ConvRNN3D.build = _tuple_build
    return recurrent


def patch_modellib(tf, modellib):
    def repeat_tensor_tf2(T, nrep, rep_dim=1):
        """model_multi.py:331-336 builds the tile vector via a
        tf.Variable scatter-assign, which can't be created inside a
        tf.function; same expand+tile with the one-hot update expressed
        functionally."""
        repT = tf.expand_dims(T, rep_dim)
        r = tf.rank(repT)
        tile_dim = (tf.ones([r], tf.int32)
                    + tf.one_hot(rep_dim, r, dtype=tf.int32) * (nrep - 1))
        return tf.tile(repT, tile_dim)

    modellib.repeat_tensor = repeat_tensor_tf2

    # same static-shape re-pin as the single-view golden
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


def fixture_paths(grid_reas):
    """conv3d keeps the original unsuffixed fixture names."""
    sfx = "" if grid_reas == "conv3d" else f"_{grid_reas}"
    fixture = os.path.join(REPO, "tests", "fixtures",
                           f"golden_multiview{sfx}.npz")
    inventory = os.path.join(REPO, "tests", "fixtures",
                             f"golden_multiview_layers{sfx}.json")
    return fixture, inventory


def reference_config_cls(Config, grid_reas="conv3d"):
    g = GOLDEN_MV

    class GoldenMVConfig(Config):
        NAME = "golden_multiview"
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
        GRID_REAS = grid_reas
        VANILLA = False
        nvox = g["nvox"]
        nvox_z = g["nvox_z"]
        vmin = g["vmin"]
        vmax = g["vmax"]
        vmin_z = g["vmin_z"]
        vmax_z = g["vmax_z"]
        vsize = float(g["vmax"] - g["vmin"]) / g["nvox"]
        vsize_z = float(g["vmax_z"] - g["vmin_z"]) / g["nvox_z"]
        samples = g["samples"]

    return GoldenMVConfig


def golden_views():
    """Deterministic 2-view input: blocky structure + noise, plus the
    InteriorNet-style intrinsics and a small-baseline second camera."""
    g = GOLDEN_MV
    rng = np.random.RandomState(g["image_seed"])
    s = g["image_size"]
    views = []
    for _ in range(g["num_views"]):
        img = rng.randint(0, 255, (s // 32, s // 32, 3), np.uint8)
        img = np.kron(img, np.ones((32, 32, 1), np.uint8))
        img = img.astype(np.int32) + rng.randint(-20, 20, (s, s, 3))
        views.append(np.clip(img, 0, 255).astype(np.uint8))
    Kmat = np.array([[[600.0, 0, 320], [0, 600, 320], [0, 0, 1]]],
                    np.float32)
    # cam->world [R|t]: view 0 at origin, view 1 shifted + slightly
    # rotated about y
    th = 0.08
    Ry = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]], np.float32)
    Rcam = np.zeros((1, g["num_views"], 3, 4), np.float32)
    Rcam[0, 0, :, :3] = np.eye(3)
    Rcam[0, 1, :, :3] = Ry
    Rcam[0, 1, :, 3] = [0.3, 0.05, 0.1]
    return np.stack(views), Rcam, Kmat


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--grid-reas", default="conv3d",
                    choices=["conv3d", "ident", "add", "lstm3d"],
                    help="fusion family to capture (one per process: the "
                         "reference's reused_lay layer cache is a module "
                         "GLOBAL, so a second build in the same process "
                         "would silently share weights)")
    args = ap.parse_args()
    fixture, inventory_path = fixture_paths(args.grid_reas)

    sys.path.insert(0, REPO)
    tf = install_multiview_shims()

    sys.path.insert(0, "/root/reference")
    if args.grid_reas == "lstm3d":
        install_recurrent_shims(tf)       # real recurrent.py, not the stub
    from mrcnn import model_multi as modellib
    from mrcnn.config import Config

    patch_modellib(tf, modellib)

    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_h5_from_inventory)

    cfg = reference_config_cls(Config, args.grid_reas)()
    model = modellib.MaskRCNN("inference", cfg, "/tmp/golden_mv_logs")

    # model_multi.detect feeds image_metas with a [NUM_VIEWS, meta] lead
    # dim against batch-1 everything else (model_multi.py:3043/3068).
    # keras 2.0.8's predict sliced every input to the batch range, so the
    # graph only ever saw meta[0:1] (view 0's meta); tf_keras validates
    # cardinality instead. Reproduce the original slicing.
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
                "weights": [{"name": w.name, "shape": [int(d) for d in
                                                       w.shape]}
                            for w in layer.weights],
            })
    with open(inventory_path, "w") as f:
        json.dump(inventory, f, indent=1)

    write_h5_from_inventory(H5_PATH, inventory, seed=GOLDEN_MV["seed"])
    # the reference's own by-name loader consumes the reconstructed file
    model.load_weights(H5_PATH, by_name=True)

    views, Rcam, Kmat = golden_views()
    r = model.detect([views], Rcam, Kmat, verbose=0)[0]

    # raw detections + per-detection 28x28 mask PROBABILITIES: random-
    # weight mask logits can hover near the 0.5 binarization threshold,
    # where unmolded-mask IoU amplifies tiny numeric drift — the raw
    # field is the numerically comparable contract
    import keras.models as KM
    km = model.keras_model
    sub = KM.Model(km.inputs, [km.get_layer("mrcnn_detection").output,
                               km.get_layer("mrcnn_mask").output])
    molded, metas, _ = model.mold_inputs(views)
    anchors = model.get_anchors(molded[0].shape)
    raw_det, raw_masks = sub.predict(
        [molded[None], metas[None][:, 0], anchors[None], Rcam, Kmat],
        verbose=0)

    np.savez_compressed(
        fixture,
        views=views, Rcam=Rcam, Kmat=Kmat,
        rois=r["rois"].astype(np.float32),
        class_ids=r["class_ids"].astype(np.int32),
        scores=r["scores"].astype(np.float32),
        masks=r["masks"].astype(bool),
        raw_detections=raw_det[0].astype(np.float32),
        raw_masks=raw_masks[0].astype(np.float32),
        **{f"cfg_{k}": np.asarray(v) for k, v in GOLDEN_MV.items()})
    print(f"wrote {fixture}: {len(r['class_ids'])} detections, "
          f"masks {r['masks'].shape}, "
          f"scores [{r['scores'].min():.4f}, {r['scores'].max():.4f}]")


if __name__ == "__main__":
    main()
