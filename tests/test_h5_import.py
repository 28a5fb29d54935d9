"""h5 weight importer test against a synthetically constructed keras-layout
h5 file (the real mask_rcnn_coco.h5 is not downloadable in this
environment; the layout mirrors keras save_weights: model_weights/<layer>/
<layer>/<weight>:0)."""

import h5py
import jax
import numpy as np
import pytest

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.models.detector import (
    MaskRCNN, make_dummy_batch)
from mulit_view_object_detection_tpu.utils.h5_import import load_h5_weights


class H5Cfg(Config):
    NAME = "h5cfg"
    NUM_CLASSES = 4
    NUM_VIEWS = 1
    BACKBONE = "resnet50"
    TOP_DOWN_PYRAMID_SIZE = 32
    FPN_CLASSIF_FC_LAYERS_SIZE = 64
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    PRE_NMS_LIMIT = 128
    POST_NMS_ROIS_INFERENCE = 16
    DETECTION_MAX_INSTANCES = 8
    MAX_GT_INSTANCES = 8


@pytest.fixture(scope="module")
def model_vars():
    cfg = H5Cfg()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    return model.init(rngs, batch, training=False)


def _write_keras_h5(path, entries):
    """entries: {layer_name: {weight_name: array}}."""
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for layer, weights in entries.items():
            lg = g.create_group(layer).create_group(layer)
            for wname, arr in weights.items():
                lg.create_dataset(f"{wname}:0", data=arr)


def test_h5_import_maps_layers(model_vars, tmp_path):
    params = model_vars["params"]
    batch_stats = model_vars["batch_stats"]

    conv1_shape = np.asarray(
        params["backbone"]["conv1"]["kernel"]).shape     # (7,7,3,64)
    res2a_shape = np.asarray(
        params["backbone"]["res2a"]["conv2a"]["kernel"]).shape
    fpn_shape = np.asarray(params["fpn"]["fpn_c5p5"]["kernel"]).shape
    rpn_shape = np.asarray(
        params["rpn"]["rpn_conv_shared"]["kernel"]).shape
    cls_shape = np.asarray(
        params["classifier_head"]["mrcnn_class_logits"]["kernel"]).shape
    deconv_shape = np.asarray(
        params["mask_head"]["mrcnn_mask_deconv"]["kernel"]).shape

    rng = np.random.RandomState(0)
    entries = {
        "conv1": {"kernel": rng.randn(*conv1_shape).astype(np.float32),
                  "bias": rng.randn(conv1_shape[-1]).astype(np.float32)},
        "bn_conv1": {
            "gamma": rng.rand(64).astype(np.float32),
            "beta": rng.randn(64).astype(np.float32),
            "moving_mean": rng.randn(64).astype(np.float32),
            "moving_variance": rng.rand(64).astype(np.float32),
        },
        "res2a_branch2a": {
            "kernel": rng.randn(*res2a_shape).astype(np.float32),
            "bias": rng.randn(res2a_shape[-1]).astype(np.float32)},
        "fpn_c5p5": {"kernel": rng.randn(*fpn_shape).astype(np.float32),
                     "bias": rng.randn(fpn_shape[-1]).astype(np.float32)},
        "rpn_conv_shared": {
            "kernel": rng.randn(*rpn_shape).astype(np.float32),
            "bias": rng.randn(rpn_shape[-1]).astype(np.float32)},
        "mrcnn_class_logits": {
            "kernel": rng.randn(*cls_shape).astype(np.float32),
            "bias": rng.randn(cls_shape[-1]).astype(np.float32)},
        # keras Conv2DTranspose stores [kh, kw, OUT, IN]
        "mrcnn_mask_deconv": {
            "kernel": rng.randn(deconv_shape[0], deconv_shape[1],
                                deconv_shape[3], deconv_shape[2]
                                ).astype(np.float32),
            "bias": rng.randn(deconv_shape[3]).astype(np.float32)},
        "some_unknown_layer": {"kernel": np.zeros((1, 1, 1, 1), np.float32)},
    }
    path = str(tmp_path / "w.h5")
    _write_keras_h5(path, entries)

    new_params, new_bs, report = load_h5_weights(path, params, batch_stats)

    np.testing.assert_array_equal(
        new_params["backbone"]["conv1"]["kernel"],
        entries["conv1"]["kernel"])
    np.testing.assert_array_equal(
        new_params["backbone"]["res2a"]["conv2a"]["kernel"],
        entries["res2a_branch2a"]["kernel"])
    np.testing.assert_array_equal(
        new_params["backbone"]["bn_conv1"]["BatchNorm_0"]["scale"],
        entries["bn_conv1"]["gamma"])
    np.testing.assert_array_equal(
        new_bs["backbone"]["bn_conv1"]["BatchNorm_0"]["mean"],
        entries["bn_conv1"]["moving_mean"])
    np.testing.assert_array_equal(
        new_params["fpn"]["fpn_c5p5"]["kernel"],
        entries["fpn_c5p5"]["kernel"])
    np.testing.assert_array_equal(
        new_params["rpn"]["rpn_conv_shared"]["kernel"],
        entries["rpn_conv_shared"]["kernel"])
    np.testing.assert_array_equal(
        new_params["classifier_head"]["mrcnn_class_logits"]["kernel"],
        entries["mrcnn_class_logits"]["kernel"])
    # deconv: spatially flipped + channel-transposed into flax's
    # fractionally-strided-correlation layout (see test_deconv_semantics)
    np.testing.assert_array_equal(
        new_params["mask_head"]["mrcnn_mask_deconv"]["kernel"],
        np.transpose(entries["mrcnn_mask_deconv"]["kernel"][::-1, ::-1],
                     (0, 1, 3, 2)))
    assert "conv1" in report["loaded"]
    assert "some_unknown_layer" in report["skipped"]
    # untouched layers keep their init values
    np.testing.assert_array_equal(
        new_params["fpn"]["fpn_p2"]["kernel"],
        np.asarray(params["fpn"]["fpn_p2"]["kernel"]))


def test_deconv_semantics():
    """The importer's Conv2DTranspose transform (spatial flip + channel
    transpose) must make flax nn.ConvTranspose reproduce TF/Keras
    gradient-of-conv deconvolution numerics exactly."""
    import flax.linen as nn
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    K = rng.randn(2, 2, 5, 3).astype(np.float32)   # keras [kh, kw, out, in]
    b = rng.randn(5).astype(np.float32)

    # TF Conv2DTranspose(strides=2, kernel=2x2) oracle: the gradient of a
    # stride-2 VALID conv — with stride == kernel size the taps don't
    # overlap, so y[2i+di, 2j+dj, o] = sum_c x[i,j,c] * K[di,dj,o,c] + b.
    y_ref = np.zeros((2, 8, 8, 5), np.float32)
    for di in range(2):
        for dj in range(2):
            y_ref[:, di::2, dj::2] = np.einsum("bhwc,oc->bhwo", x, K[di, dj])
    y_ref += b

    # the exact transform load_h5_weights applies to "deconv" kernels
    kernel = np.transpose(K[::-1, ::-1], (0, 1, 3, 2))
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2))
    y = mod.apply({"params": {"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(b)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


def _keras_layer_name(path):
    """Our param-tree path -> (keras layer name, enclosing nested model) per
    the real mask_rcnn_coco.h5 layout (reference model.py:878-897 nests the
    RPN inside a Model named 'rpn_model'; everything else is top-level)."""
    import re
    top = path[0]
    if top == "backbone":
        mod = path[1]
        if mod in ("conv1", "bn_conv1"):
            return mod, None
        stage, block = re.match(r"res(\d)(\w+)", mod).groups()
        sub = path[2]                       # conv2a | bn2a | conv1 | bn1
        kind = "res" if sub.startswith("conv") else "bn"
        branch = sub.replace("conv", "").replace("bn", "")
        return f"{kind}{stage}{block}_branch{branch}", None
    if top == "fpn":
        return path[1], None
    if top == "rpn":
        return path[1], "rpn_model"
    if top in ("classifier_head", "mask_head"):
        return path[1], None
    raise AssertionError(f"unexpected top-level module {top}")


def test_h5_import_full_matterport_layout(tmp_path):
    """Reconstructs the real mask_rcnn_coco.h5 group structure — resnet101
    backbone naming, COCO 81 classes, and the NESTED rpn_model submodel —
    from this framework's own parameter tree, then asserts the importer
    loads EVERY parameter (zero skips, zero untouched leaves)."""
    import re

    class CocoCfg(Config):
        NAME = "coco-layout"
        NUM_CLASSES = 81
        BACKBONE = "resnet101"
        TOP_DOWN_PYRAMID_SIZE = 32
        FPN_CLASSIF_FC_LAYERS_SIZE = 64
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 64
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        PRE_NMS_LIMIT = 64
        POST_NMS_ROIS_INFERENCE = 8
        DETECTION_MAX_INSTANCES = 4
        MAX_GT_INSTANCES = 4

    cfg = CocoCfg()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, training=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # build the keras-2 h5 group tree from our own tree
    rng = np.random.RandomState(0)
    path_ = str(tmp_path / "coco_layout.h5")
    with h5py.File(path_, "w") as f:
        root = f.create_group("model_weights")

        def put(layer, nested, wname, shape):
            host = root.require_group(nested) if nested else \
                root.require_group(layer).require_group(layer)
            grp = host.require_group(layer) if nested else host
            grp.create_dataset(f"{wname}:0",
                               data=rng.randn(*shape).astype(np.float32))

        seen = set()
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        for pth, leaf in flat:
            keys = tuple(getattr(k, "key", str(k)) for k in pth)
            is_bn = "BatchNorm_0" in keys
            mod_path = keys[:keys.index("BatchNorm_0")] if is_bn \
                else keys[:-1]
            layer, nested = _keras_layer_name(mod_path)
            if (layer, nested) in seen:
                continue
            seen.add((layer, nested))
            if is_bn:
                dim = np.asarray(leaf).shape[0]
                for w in ("gamma", "beta", "moving_mean",
                          "moving_variance"):
                    put(layer, nested, w, (dim,))
            else:
                kshape = np.asarray(
                    params[mod_path[0]][mod_path[1]]["kernel"].shape
                    if len(mod_path) == 2 else
                    params[mod_path[0]][mod_path[1]][mod_path[2]][
                        "kernel"].shape)
                kshape = tuple(int(x) for x in kshape)
                if "deconv" in layer:  # keras stores [kh, kw, out, in]
                    kshape = kshape[:2] + (kshape[3], kshape[2])
                put(layer, nested, "kernel", kshape)
                bdim = kshape[2] if "deconv" in layer else kshape[-1]
                put(layer, nested, "bias", (bdim,))

    new_params, new_bs, report = load_h5_weights(path_, params, batch_stats)

    assert not report["skipped"], f"skipped layers: {report['skipped']}"
    # the nested rpn_model's inner layers arrived
    for rpn_layer in ("rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred"):
        assert rpn_layer in report["loaded"]
    # resnet101: stage 4 has 23 blocks (a + b..w)
    s4 = {l for l in report["loaded"] if re.match(r"res4\w+_branch2a", l)}
    assert len(s4) == 23, sorted(s4)
    # EVERY param and batch-stat leaf was overwritten
    for (pth, old), new in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_leaves(new_params)):
        name = "/".join(getattr(k, "key", str(k)) for k in pth)
        assert not np.array_equal(np.asarray(old), np.asarray(new)), \
            f"param untouched by import: {name}"
    for (pth, old), new in zip(
            jax.tree_util.tree_flatten_with_path(batch_stats)[0],
            jax.tree_util.tree_leaves(new_bs)):
        name = "/".join(getattr(k, "key", str(k)) for k in pth)
        assert not np.array_equal(np.asarray(old), np.asarray(new)), \
            f"batch stat untouched by import: {name}"


def test_h5_import_attrs_protocol_real_layout(tmp_path):
    """Independent cross-check: the fixture in utils/h5_fixture.py rebuilds
    the real mask_rcnn_coco.h5 tree from the Matterport BUILD ORDER spec
    (root-level layer groups + layer_names/weight_names attrs + the nested
    rpn_model + weightless layers), at true COCO dimensions. The importer
    must consume it through the attrs protocol with zero skips and land
    every value in the right leaf."""
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_matterport_h5)

    class CocoDims(Config):
        NAME = "coco-dims"
        NUM_CLASSES = 81
        BACKBONE = "resnet101"
        TOP_DOWN_PYRAMID_SIZE = 256
        FPN_CLASSIF_FC_LAYERS_SIZE = 1024
        IMAGE_MIN_DIM = 64        # weight shapes don't depend on image dim
        IMAGE_MAX_DIM = 64
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        PRE_NMS_LIMIT = 64
        POST_NMS_ROIS_INFERENCE = 8
        DETECTION_MAX_INSTANCES = 4
        MAX_GT_INSTANCES = 4

    cfg = CocoDims()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda: model.init(rngs, batch, training=False))()
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    path = str(tmp_path / "mask_rcnn_coco.h5")
    written = write_matterport_h5(path, num_classes=81,
                                  architecture="resnet101", seed=3)

    new_params, new_bs, report = load_h5_weights(path, params, batch_stats)

    assert not report["skipped"], f"skipped: {report['skipped']}"
    # spot checks across every module family, incl. the nested rpn_model
    np.testing.assert_array_equal(
        new_params["backbone"]["conv1"]["kernel"],
        written["conv1"]["conv1/kernel"])
    np.testing.assert_array_equal(
        new_params["backbone"]["res4w"]["conv2b"]["kernel"],
        written["res4w_branch2b"]["res4w_branch2b/kernel"])
    np.testing.assert_array_equal(
        new_bs["backbone"]["res4w"]["bn2c"]["BatchNorm_0"]["var"],
        written["bn4w_branch2c"]["bn4w_branch2c/moving_variance"])
    np.testing.assert_array_equal(
        new_params["rpn"]["rpn_conv_shared"]["kernel"],
        written["rpn_model"]["rpn_conv_shared/kernel"])
    np.testing.assert_array_equal(
        new_params["rpn"]["rpn_bbox_pred"]["bias"],
        written["rpn_model"]["rpn_bbox_pred/bias"])
    np.testing.assert_array_equal(
        new_params["classifier_head"]["mrcnn_bbox_fc"]["kernel"],
        written["mrcnn_bbox_fc"]["mrcnn_bbox_fc/kernel"])
    np.testing.assert_array_equal(
        new_params["mask_head"]["mrcnn_mask_deconv"]["kernel"],
        np.transpose(
            written["mrcnn_mask_deconv"]["mrcnn_mask_deconv/kernel"]
            [::-1, ::-1], (0, 1, 3, 2)))
    # every leaf overwritten (the fixture covers the whole tree)
    for (pth, old), new in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_leaves(new_params)):
        name = "/".join(getattr(k, "key", str(k)) for k in pth)
        assert not np.array_equal(np.asarray(old), np.asarray(new)), \
            f"param untouched: {name}"


def test_h5_import_exclude(tmp_path):
    """exclude= keeps the listed keras layers at their current values —
    the reference's head-swap transfer recipe (model.py:2102-2144,
    interior_multi.py:447-452 excludes the class-specific heads)."""
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_matterport_h5)

    cfg = H5Cfg()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda: model.init(rngs, batch, training=False))()
    params = variables["params"]

    path = str(tmp_path / "w.h5")
    write_matterport_h5(
        path, num_classes=cfg.NUM_CLASSES, architecture="resnet50",
        top_down=cfg.TOP_DOWN_PYRAMID_SIZE,
        fc_size=cfg.FPN_CLASSIF_FC_LAYERS_SIZE)

    exclude = ["mrcnn_class_logits", "mrcnn_bbox_fc", "mrcnn_mask"]
    new_params, _, report = load_h5_weights(
        path, params, variables["batch_stats"], exclude=exclude)

    for lname in exclude:
        assert lname in report["excluded"]
    np.testing.assert_array_equal(
        new_params["classifier_head"]["mrcnn_class_logits"]["kernel"],
        np.asarray(params["classifier_head"]["mrcnn_class_logits"]
                   ["kernel"]))
    # non-excluded layers did load
    assert not np.array_equal(
        np.asarray(new_params["backbone"]["conv1"]["kernel"]),
        np.asarray(params["backbone"]["conv1"]["kernel"]))

    # exclude by the SAVED (outer) name: "rpn_model" is the nested
    # submodel the reference excludes as one unit; its inner layers
    # (rpn_conv_shared etc.) must all stay untouched
    new_params2, _, report2 = load_h5_weights(
        path, params, variables["batch_stats"], exclude=["rpn_model"])
    assert any(l.startswith("rpn_") for l in report2["excluded"]), \
        report2["excluded"]
    for lname in ("rpn_conv_shared", "rpn_class_raw", "rpn_bbox_pred"):
        np.testing.assert_array_equal(
            np.asarray(new_params2["rpn"][lname]["kernel"]),
            np.asarray(params["rpn"][lname]["kernel"]))
    assert not np.array_equal(
        np.asarray(new_params2["backbone"]["conv1"]["kernel"]),
        np.asarray(params["backbone"]["conv1"]["kernel"]))


@pytest.mark.slow
def test_coco_h5_end_to_end_detect_1024(tmp_path):
    """BASELINE config #1 shape, end-to-end through the PUBLIC API: build
    the inference engine at the COCO operating point (resnet101, 81
    classes, 1024^2 molding), load a reconstructed-layout
    mask_rcnn_coco.h5 via compat.MaskRCNN.load_weights('.h5', exclude=),
    and run detect() on a 1024^2 image (model.py:2102-2144 +
    demo workflow)."""
    from mulit_view_object_detection_tpu import compat
    from mulit_view_object_detection_tpu.utils.h5_fixture import (
        write_matterport_h5)

    class CocoInferConfig(Config):
        NAME = "coco"
        NUM_CLASSES = 81
        BACKBONE = "resnet101"
        TOP_DOWN_PYRAMID_SIZE = 256
        FPN_CLASSIF_FC_LAYERS_SIZE = 1024
        IMAGE_MIN_DIM = 800
        IMAGE_MAX_DIM = 1024
        RPN_ANCHOR_SCALES = (32, 64, 128, 256, 512)
        # loop sizes trimmed for the 1-core CPU CI host; the molded image
        # shape (1024^2) and every weight shape are the real COCO ones
        PRE_NMS_LIMIT = 256
        POST_NMS_ROIS_INFERENCE = 32
        DETECTION_MAX_INSTANCES = 16
        MAX_GT_INSTANCES = 16
        IMAGES_PER_GPU = 1

    h5_path = str(tmp_path / "mask_rcnn_coco.h5")
    write_matterport_h5(h5_path, num_classes=81, architecture="resnet101",
                        seed=11, scale=0.02)

    model = compat.MaskRCNN(mode="inference", config=CocoInferConfig(),
                            model_dir=str(tmp_path))
    model.load_weights(h5_path, by_name=True)
    report = model._last_h5_report
    assert not report["skipped"], report["skipped"]

    rng = np.random.RandomState(0)
    image = (rng.rand(1024, 1024, 3) * 255).astype(np.uint8)
    results = model.detect([image])
    assert len(results) == 1
    r = results[0]
    n = r["rois"].shape[0]
    assert r["class_ids"].shape == (n,)
    assert r["scores"].shape == (n,)
    assert r["masks"].shape[:2] == (1024, 1024)
    assert np.isfinite(r["scores"]).all()


def _fake_xf_tree(d=8, heads=2, dff=16, seq=32, target=16, layers=1):
    """Minimal view_transformer param tree shaped like
    models/transformer.py::ViewFusionTransformer for unit-testing
    _assign_transformer_layer's structural mapping."""
    dh = d // heads
    z = np.zeros
    def mha_proj(out=False):
        if out:
            return {"kernel": z((heads, dh, d), np.float32),
                    "bias": z((d,), np.float32)}
        return {"kernel": z((d, heads, dh), np.float32),
                "bias": z((heads, dh), np.float32)}
    tree = {}
    for i in range(layers):
        tree[f"layer{i}"] = {
            "mha": {"query": mha_proj(), "key": mha_proj(),
                    "value": mha_proj(), "out": mha_proj(out=True)},
            "ffn1": {"kernel": z((d, dff), np.float32),
                     "bias": z((dff,), np.float32)},
            "ffn2": {"kernel": z((dff, d), np.float32),
                     "bias": z((d,), np.float32)},
            "ln1": {"scale": z((d,), np.float32),
                    "bias": z((d,), np.float32)},
            "ln2": {"scale": z((d,), np.float32),
                    "bias": z((d,), np.float32)},
        }
    tree["token_proj"] = {"kernel": z((seq, target), np.float32),
                          "bias": z((target,), np.float32)}
    return {"view_transformer": tree}


def test_xf_import_counter_offset():
    """Keras Dense/LayerNormalization auto-counters are session-global:
    a checkpoint saved after other unnamed layers existed carries offset
    counters (dense_7, ...). The importer must normalize by the group's
    minimum counter, not assume 0-based."""
    from mulit_view_object_detection_tpu.utils.h5_import import (
        _assign_transformer_layer, _xf_counter_bases)

    d, heads, dff, seq, target = 8, 2, 16, 32, 16
    params = _fake_xf_tree(d, heads, dff, seq, target, layers=1)
    # offset group: dense_7..dense_12 are layer 0's wq/wk/wv/out/ffn1/
    # ffn2; dense_13 is the final token projection; layer_normalization_3
    # and _4 are layer 0's ln1/ln2.
    shapes = [(d, d), (d, d), (d, d), (d, d), (d, dff), (dff, d),
              (seq, target)]
    layer_w = {}
    for k, shape in enumerate(shapes):
        name = f"dense_{7 + k}"
        layer_w[name] = {
            "kernel": np.full(shape, float(k + 1), np.float32),
            "bias": np.full((shape[1],), float(k + 1), np.float32)}
    for k in range(2):
        layer_w[f"layer_normalization_{3 + k}"] = {
            "gamma": np.full((d,), 10.0 + k, np.float32),
            "beta": np.full((d,), 20.0 + k, np.float32)}
    outer_of = {name: "transformer" for name in layer_w}
    bases = _xf_counter_bases(layer_w, outer_of)
    assert bases == (7, 3)
    for name, w in layer_w.items():
        assert _assign_transformer_layer(params, name, w, bases)

    root = params["view_transformer"]
    assert root["layer0"]["mha"]["query"]["kernel"].flat[0] == 1.0
    assert root["layer0"]["mha"]["out"]["kernel"].flat[0] == 4.0
    assert root["layer0"]["ffn1"]["kernel"].flat[0] == 5.0
    assert root["layer0"]["ffn2"]["kernel"].flat[0] == 6.0
    assert root["token_proj"]["kernel"].flat[0] == 7.0
    assert root["layer0"]["ln1"]["scale"].flat[0] == 10.0
    assert root["layer0"]["ln2"]["scale"].flat[0] == 11.0
    assert root["layer0"]["ln2"]["bias"].flat[0] == 21.0


def test_xf_import_skipped_layer_is_untouched():
    """A transformer inner layer whose bias mismatches must raise WITHOUT
    having installed its kernel — 'skipped' means untouched (keras
    by_name semantics), not half-written."""
    from mulit_view_object_detection_tpu.utils.h5_import import (
        _assign_transformer_layer)

    d = 8
    params = _fake_xf_tree(d=d, layers=1)
    bad = {"kernel": np.full((d, d), 5.0, np.float32),
           "bias": np.full((d * 3,), 5.0, np.float32)}  # size mismatch
    with pytest.raises(KeyError):
        _assign_transformer_layer(params, "dense", bad, (0, 0))
    q = params["view_transformer"]["layer0"]["mha"]["query"]
    assert q["kernel"].flat[0] == 0.0 and q["bias"].flat[0] == 0.0
