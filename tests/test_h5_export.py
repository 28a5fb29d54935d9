"""Round-trip contract of utils/h5_export.py: flax -> reference h5 ->
flax must be bit-exact, covering every inverse weight transform
(ConvTranspose flip+transpose, DepthwiseConv layout, fused ConvLSTM
gates, BatchNorm param/stat split, nested rpn_model group). This is the
machinery behind same-weights cross-framework parity (VERDICT r4 #5):
our trained checkpoint exported here loads into the executed TF
reference graph via its own by_name loader (model_multi.py:2592-2642).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import pytest

from mulit_view_object_detection_tpu.models.detector import (
    MaskRCNN as Model, make_dummy_batch)
from mulit_view_object_detection_tpu.utils.h5_export import save_h5_weights
from mulit_view_object_detection_tpu.utils.h5_import import load_h5_weights
from tools.train_to_ap import build_config


def _init(cfg):
    model = Model(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    return jax.jit(
        lambda r, b: model.init(r, b, training=False))(rngs, batch)


def _randomized(tree, seed=7):
    """Fresh random values in every leaf (so the round trip can't pass
    by luck of two inits agreeing)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    rng = np.random.RandomState(seed)
    out = [np.asarray(rng.randn(*np.shape(x)), np.float32) for x in leaves]
    return jax.tree_util.tree_unflatten(treedef, out)


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_flatten_with_path(a)[0]
    fb = jax.tree_util.tree_flatten_with_path(b)[0]
    assert len(fa) == len(fb)
    for (pa, va), (pb, vb) in zip(fa, fb):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=str(pa))


@pytest.mark.parametrize("grid_reas", ["conv3d", "lstm3d", "ident"])
def test_export_import_roundtrip(tmp_path, grid_reas):
    cfg = build_config(64, 2)
    cfg.GRID_REAS = grid_reas
    cfg.nvox = cfg.nvox_z = 8
    cfg.samples = 2
    variables = _init(cfg)
    params = _randomized(variables["params"], seed=3)
    stats = _randomized(variables.get("batch_stats", {}), seed=4)
    # variance must be positive to be a plausible checkpoint
    stats = jax.tree_util.tree_map(np.abs, stats)

    path = str(tmp_path / "export.h5")
    report = save_h5_weights(path, params, stats)
    assert not report["unmapped"], report["unmapped"]
    assert "rpn_model" in report["layers"]

    base = _init(cfg)   # fresh init; import must overwrite EVERY leaf
    p2, s2, rep = load_h5_weights(path, base["params"],
                                  base.get("batch_stats", {}))
    assert not rep["skipped"], rep["skipped"]
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)


def test_export_writes_reference_protocol(tmp_path):
    import h5py

    cfg = build_config(64, 2)
    cfg.GRID_REAS = "conv3d"
    cfg.nvox = cfg.nvox_z = 8
    cfg.samples = 2
    variables = _init(cfg)
    path = str(tmp_path / "export.h5")
    save_h5_weights(path, variables["params"],
                    variables.get("batch_stats", {}))
    with h5py.File(path, "r") as f:
        names = [n.decode() for n in f.attrs["layer_names"]]
        # keras-2 protocol attrs the reference's loader switches on
        kv = f.attrs["keras_version"]
        assert (kv.decode() if isinstance(kv, bytes) else kv) == "2.0.8"
        # nested rpn submodel: ONE saved layer, inner weight paths
        assert "rpn_model" in names
        wnames = [w.decode() for w in f["rpn_model"].attrs["weight_names"]]
        assert "rpn_conv_shared/kernel:0" in wnames
        # Keras zips a nested submodel's stored list against
        # layer.weights in BUILD order (shared -> class -> bbox);
        # alphabetical order cross-loads the three convs
        # (model_multi.py:845-870). Caught live by tf_keras'
        # by-name loader in tools/crosscheck_reference.py.
        assert wnames == ["rpn_conv_shared/kernel:0",
                         "rpn_conv_shared/bias:0",
                         "rpn_class_raw/kernel:0",
                         "rpn_class_raw/bias:0",
                         "rpn_bbox_pred/kernel:0",
                         "rpn_bbox_pred/bias:0"]
        # deconv stored in keras [kh,kw,kd, out,in] layout => dataset
        # exists under the deconv layer name the reference builds
        assert any("grid_reas_P" in n and "_3D_conv_deconv_1" in n
                   for n in names)
        assert any(n == "mrcnn_mask_deconv" for n in names)
