"""Matterport-compat engine API tests (tiny shapes, synthetic data)."""

import numpy as np
import pytest

from mulit_view_object_detection_tpu import compat as mrcnn
from mulit_view_object_detection_tpu.data.synthetic import (
    SyntheticMultiViewDataset)


class TinyCfg(mrcnn.Config):
    NAME = "compat_tiny"
    NUM_CLASSES = 4
    NUM_VIEWS = 2
    BACKBONE = "resnet50"
    TOP_DOWN_PYRAMID_SIZE = 18
    FPN_CLASSIF_FC_LAYERS_SIZE = 32
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    PRE_NMS_LIMIT = 256
    POST_NMS_ROIS_TRAINING = 32
    POST_NMS_ROIS_INFERENCE = 32
    TRAIN_ROIS_PER_IMAGE = 16
    DETECTION_MAX_INSTANCES = 8
    DETECTION_MIN_CONFIDENCE = 0.0
    MAX_GT_INSTANCES = 8
    GRID_REAS = "add"
    nvox = 8
    nvox_z = 8
    vmin, vmax = -2.0, 2.0
    vmin_z, vmax_z = 1.0, 5.0
    samples = 4


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    cfg = TinyCfg()
    return mrcnn.MaskRCNN(mode="inference", config=cfg,
                          model_dir=str(tmp_path_factory.mktemp("logs")))


def test_mold_inputs(model):
    images = [np.random.randint(0, 255, (48, 64, 3), np.uint8)]
    molded, metas, windows = model.mold_inputs(images)
    assert molded.shape == (1, 64, 64, 3)
    assert metas.shape == (1, model.config.IMAGE_META_SIZE)
    # 48x64 scaled to 64x85 -> capped to 64 wide; window centered
    assert windows.shape == (1, 4)


def test_unmold_detections(model):
    det = np.zeros((8, 6), np.float32)
    det[0] = [0.25, 0.25, 0.75, 0.75, 2, 0.9]
    masks = np.random.rand(8, 28, 28, 4).astype(np.float32)
    boxes, class_ids, scores, full_masks = model.unmold_detections(
        det, masks, (64, 64, 3), (64, 64, 3), (0, 0, 64, 64))
    assert len(class_ids) == 1
    assert class_ids[0] == 2
    assert scores[0] == pytest.approx(0.9)
    assert full_masks.shape == (64, 64, 1)
    # box roughly centered half-size
    y1, x1, y2, x2 = boxes[0]
    assert 10 < y1 < 22 and 42 < y2 < 54


def test_detect_synthetic(model):
    ds = SyntheticMultiViewDataset(num_scenes=1, num_views=2)
    view_ids = ds.load_view(2, "s0_v0")
    views = np.stack([ds.load_image(v) for v in view_ids])
    R = np.stack([ds.load_R(v) for v in view_ids])[None]
    K = ds.K[None].astype(np.float32)
    results = model.detect([views], Rcam=R, Kmat=K)
    assert len(results) == 1
    r = results[0]
    assert set(r) == {"rois", "class_ids", "scores", "masks"}
    n = len(r["class_ids"])
    assert r["rois"].shape == (n, 4)
    assert r["masks"].shape[-1] == n


def test_run_graph(model):
    ds = SyntheticMultiViewDataset(num_scenes=1, num_views=2)
    view_ids = ds.load_view(2, "s0_v0")
    views = np.stack([ds.load_image(v) for v in view_ids])
    R = np.stack([ds.load_R(v) for v in view_ids])[None]
    K = ds.K[None].astype(np.float32)
    out = model.run_graph([views], outputs=["proposals", "rpn_probs"],
                          Rcam=R, Kmat=K)
    assert set(out) == {"proposals", "rpn_probs"}
    assert out["proposals"].shape == (1, 32, 4)


def test_save_load_weights(model, tmp_path):
    import jax

    path = str(tmp_path / "w")
    model.save_weights(path, step=3)
    state_before = model._state
    # perturb then restore
    model._state = state_before.replace(
        params=jax.tree_util.tree_map(lambda x: x * 0, state_before.params))
    model.load_weights(path)
    leaf_b = jax.tree_util.tree_leaves(state_before.params)[0]
    leaf_a = jax.tree_util.tree_leaves(model._state.params)[0]
    np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b))
    # epoch bookkeeping resumes from the checkpoint (the reference calls
    # set_log_dir(filepath) inside load_weights, model_multi.py:2642) so
    # train(epochs=N) continues instead of re-running finished stages
    assert model.epoch == 3


def test_ancestor_name_search():
    """ancestor(): regex search over graph output names (the analog of
    model_multi.py:3164-3190's Keras graph walk)."""
    from mulit_view_object_detection_tpu import compat

    class TinyCfg(compat.Config):
        NAME = "anc"
        NUM_CLASSES = 3
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 64
        RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
        PRE_NMS_LIMIT = 32
        POST_NMS_ROIS_INFERENCE = 8
        DETECTION_MAX_INSTANCES = 4
        MAX_GT_INSTANCES = 4

    model = compat.MaskRCNN("inference", TinyCfg(), "/tmp/anc_logs")
    assert model.ancestor(r"^rpn_") == [
        "rpn_class_logits", "rpn_probs", "rpn_bbox"]
    image = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(
        np.uint8)
    out = model.ancestor(r"detections|proposals", images=[image])
    assert set(out) == {"detections", "proposals"}
    assert out["proposals"].shape[1] == 8


def test_detect_uint8_transfer_exactness(model):
    """detect() with UINT8_IMAGE_TRANSFER (raw uint8 to the device,
    on-device mold) must match the host-molded float path bit-for-bit."""
    ds = SyntheticMultiViewDataset(num_scenes=1, num_views=2)
    view_ids = ds.load_view(2, "s0_v0")
    views = np.stack([ds.load_image(v) for v in view_ids])
    R = np.stack([ds.load_R(v) for v in view_ids])[None]
    K = ds.K[None].astype(np.float32)

    r_f32 = model.detect([views], Rcam=R, Kmat=K)[0]
    model.config.UINT8_IMAGE_TRANSFER = True
    try:
        molded, _, _ = model.mold_inputs(list(views))
        assert molded.dtype == np.uint8
        r_u8 = model.detect([views], Rcam=R, Kmat=K)[0]
    finally:
        model.config.UINT8_IMAGE_TRANSFER = False
    np.testing.assert_array_equal(r_f32["rois"], r_u8["rois"])
    np.testing.assert_array_equal(r_f32["class_ids"], r_u8["class_ids"])
    np.testing.assert_array_equal(r_f32["scores"], r_u8["scores"])
    np.testing.assert_array_equal(r_f32["masks"], r_u8["masks"])


def test_uint8_transfer_float_input_falls_back_to_host_mold(model):
    """A float-dtype input under UINT8_IMAGE_TRANSFER cannot ride the
    uint8 path (the device only de-molds uint8 batches) — mold_inputs
    must mean-subtract on host instead of shipping raw 0-255 floats."""
    img_u8 = np.random.randint(0, 255, (48, 64, 3)).astype(np.uint8)
    img_f = img_u8.astype(np.float32)
    model.config.UINT8_IMAGE_TRANSFER = True
    try:
        molded, _, _ = model.mold_inputs([img_f])
        assert molded.dtype == np.float32
        assert molded.min() < 0  # mean-subtracted, not raw pixels
        # mixed batch: uint8 + float must ALSO fall back (one batch dtype)
        mixed, _, _ = model.mold_inputs([img_u8, img_f])
        assert mixed.dtype == np.float32 and mixed.min() < 0
        # pure uint8 batch still rides the fast path
        raw, _, _ = model.mold_inputs([img_u8])
        assert raw.dtype == np.uint8
    finally:
        model.config.UINT8_IMAGE_TRANSFER = False
