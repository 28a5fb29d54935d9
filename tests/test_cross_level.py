"""CROSS_LEVEL_FUSION serving mode: the grouped cross-level fusion
(one feature_group_count=L U-Net over channel-concatenated voxel grids,
models/fusion.py::GroupedGridFusion) must reproduce the per-level path's
inference numerics exactly, with weights built from the trained
per-level parameters by utils.bn_fold.group_fusion_variables."""

import jax
import numpy as np
import pytest

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.models.detector import (
    MaskRCNN, make_dummy_batch)
from mulit_view_object_detection_tpu.utils.bn_fold import (
    fold_bn_variables, group_fusion_variables)
from test_bn_fold import _randomized_variables


class CrossCfg(Config):
    NAME = "crosscfg"
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
    ZERO_PG_LEVELS = (0, 1)   # faithful memory cap -> P4/P5/P6 active


@pytest.mark.parametrize("grid_reas", ["conv3d", "ident"])
def test_grouped_matches_per_level(grid_reas):
    cfg = CrossCfg()
    cfg.GRID_REAS = grid_reas
    cfg.FOLD_BN = False
    cfg.CROSS_LEVEL_FUSION = False
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rng = np.random.RandomState(0)
    batch["images"] = rng.randn(*batch["images"].shape).astype(
        np.float32) * 20.0

    variables = _randomized_variables(model, batch)
    out_ref = jax.jit(
        lambda v, b: model.apply(v, b, training=False))(variables, batch)

    folded, _ = fold_bn_variables(variables)
    active = [li for li in range(5) if li not in cfg.ZERO_PG_LEVELS]
    grouped_vars = group_fusion_variables(folded, active, mode=grid_reas)
    gp = grouped_vars["params"]["grid_fusion_grouped"]
    if grid_reas == "conv3d":
        assert set(gp) == {"down1", "down2", "up1", "up2"}
        assert gp["down1"]["kernel"].shape[-1] == len(active) * 32 * 2
    else:
        assert set(gp) == {"ident_conv"}

    cfg2 = CrossCfg()
    cfg2.GRID_REAS = grid_reas
    cfg2.FOLD_BN = True
    cfg2.CROSS_LEVEL_FUSION = True
    model_g = MaskRCNN(cfg2)
    out_g = jax.jit(
        lambda v, b: model_g.apply(v, b, training=False))(
            grouped_vars, batch)

    for key in ("detections", "mrcnn_masks", "rpn_probs"):
        np.testing.assert_allclose(
            np.asarray(out_ref[key]), np.asarray(out_g[key]),
            rtol=2e-4, atol=2e-4, err_msg=key)


def test_group_transform_requires_folded_tree():
    cfg = CrossCfg()
    cfg.GRID_REAS = "conv3d"
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    variables = _randomized_variables(model, batch)
    with pytest.raises(ValueError, match="fold_bn_variables"):
        group_fusion_variables(variables, [2, 3, 4], mode="conv3d")


def test_grouped_via_compat_engine(tmp_path):
    """The engine path: detect() with a CROSS_LEVEL_FUSION eval config
    must transform the per-level trained state transparently
    (compat.MaskRCNN._maybe_fold) and match the plain engine."""
    from mulit_view_object_detection_tpu.compat.model import (
        MaskRCNN as Engine)

    cfg = CrossCfg()
    cfg.GRID_REAS = "conv3d"
    engine = Engine("inference", cfg, str(tmp_path))
    state = engine._ensure_state()
    # randomize so the comparison is non-trivial
    variables = _randomized_variables(
        MaskRCNN(cfg), make_dummy_batch(cfg, training=False))
    engine._state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])

    rng = np.random.RandomState(1)
    views = (rng.rand(cfg.NUM_VIEWS, 64, 64, 3) * 255).astype(np.uint8)
    Rcam = np.zeros((1, cfg.NUM_VIEWS, 3, 4), np.float32)
    Rcam[:, :, :3, :3] = np.eye(3)
    Rcam[:, 1, 0, 3] = 0.3
    Kmat = np.array([[[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]]],
                    np.float32)
    r_ref = engine.detect([views], Rcam=Rcam, Kmat=Kmat)[0]

    class CrossEval(CrossCfg):
        GRID_REAS = "conv3d"
        FOLD_BN = True
        CROSS_LEVEL_FUSION = True
    engine_g = Engine("inference", CrossEval(), str(tmp_path))
    # keep engine_g's own apply_fn (the CROSS_LEVEL_FUSION model):
    # replace only the trained numbers, as train_to_ap's evaluate does
    engine_g._state = engine_g._ensure_state().replace(
        params=variables["params"],
        batch_stats=variables["batch_stats"])
    r_g = engine_g.detect([views], Rcam=Rcam, Kmat=Kmat)[0]

    assert r_ref["class_ids"].shape == r_g["class_ids"].shape
    np.testing.assert_array_equal(r_ref["class_ids"], r_g["class_ids"])
    np.testing.assert_allclose(r_ref["scores"], r_g["scores"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(r_ref["rois"], r_g["rois"],
                               rtol=2e-3, atol=0.5)
