"""FOLD_BN serving mode: the folded model must reproduce the unfolded
model's inference numerics (same params, BNs baked into convs)."""

import jax
import numpy as np
import pytest

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.models.detector import (
    MaskRCNN, make_dummy_batch)
from mulit_view_object_detection_tpu.utils.bn_fold import fold_bn_variables


class FoldCfg(Config):
    NAME = "foldcfg"
    NUM_CLASSES = 5
    NUM_VIEWS = 2
    BACKBONE = "resnet50"
    TOP_DOWN_PYRAMID_SIZE = 32
    FPN_CLASSIF_FC_LAYERS_SIZE = 64
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    PRE_NMS_LIMIT = 64
    POST_NMS_ROIS_INFERENCE = 16
    DETECTION_MAX_INSTANCES = 8
    MAX_GT_INSTANCES = 8
    nvox = 8
    nvox_z = 8
    samples = 4
    COMPUTE_DTYPE = "float32"


def _randomized_variables(model, batch, seed=0):
    """init + randomize BN stats/params so folding is non-trivial."""
    rngs = {"params": jax.random.PRNGKey(seed),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda: model.init(rngs, batch, training=False))()
    variables = jax.tree_util.tree_map(np.asarray, variables)
    rng = np.random.RandomState(seed)

    def walk(tree, in_stats=False, in_bn=False):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, in_stats, in_bn or k == "BatchNorm_0")
            elif in_bn:
                arr = np.asarray(v)
                if k in ("var",):
                    tree[k] = (0.5 + rng.rand(*arr.shape)).astype(arr.dtype)
                else:
                    tree[k] = (0.2 * rng.randn(*arr.shape)).astype(
                        arr.dtype) + (1.0 if k == "scale" else 0.0)

    walk(variables["batch_stats"], in_stats=True)
    walk(variables["params"])
    return variables


@pytest.mark.parametrize("grid_reas", ["conv3d", "add"])
def test_folded_matches_unfolded(grid_reas):
    cfg = FoldCfg()
    cfg.GRID_REAS = grid_reas
    cfg.FOLD_BN = False
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rng = np.random.RandomState(0)
    batch["images"] = rng.randn(*batch["images"].shape).astype(
        np.float32) * 20.0

    variables = _randomized_variables(model, batch)
    out_ref = jax.jit(
        lambda v, b: model.apply(v, b, training=False))(variables, batch)

    folded_vars, report = fold_bn_variables(variables)
    assert report["folded"], "no BNs folded"
    if grid_reas == "add":
        assert "fuse_bn" in report["affine"]

    cfg2 = FoldCfg()
    cfg2.GRID_REAS = grid_reas
    cfg2.FOLD_BN = True
    model_f = MaskRCNN(cfg2)
    out_fold = jax.jit(
        lambda v, b: model_f.apply(v, b, training=False))(
            folded_vars, batch)

    # float32 end to end: the fold reassociates one multiply per conv
    np.testing.assert_allclose(
        np.asarray(out_ref["detections"]), np.asarray(out_fold["detections"]),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_ref["mrcnn_masks"]), np.asarray(out_fold["mrcnn_masks"]),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_ref["rpn_probs"]), np.asarray(out_fold["rpn_probs"]),
        rtol=2e-4, atol=2e-4)


def test_fold_is_idempotent():
    cfg = FoldCfg()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    variables = _randomized_variables(model, batch)
    once, _ = fold_bn_variables(variables)
    twice, report2 = fold_bn_variables(once)
    for a, b in zip(jax.tree_util.tree_leaves(once),
                    jax.tree_util.tree_leaves(twice)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_folded_param_tree_identical():
    """The FOLD_BN model's variable tree must match the regular model's
    exactly (same paths, shapes, dtypes) so checkpoints/h5 interop."""
    cfg = FoldCfg()
    cfg.FOLD_BN = False
    cfg2 = FoldCfg()
    cfg2.FOLD_BN = True
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    v1 = jax.eval_shape(
        lambda: MaskRCNN(cfg).init(rngs, batch, training=False))
    v2 = jax.eval_shape(
        lambda: MaskRCNN(cfg2).init(rngs, batch, training=False))
    p1 = jax.tree_util.tree_flatten_with_path(v1)[0]
    p2 = jax.tree_util.tree_flatten_with_path(v2)[0]
    assert len(p1) == len(p2)
    for (k1, l1), (k2, l2) in zip(p1, p2):
        assert k1 == k2
        assert l1.shape == l2.shape and l1.dtype == l2.dtype, k1
