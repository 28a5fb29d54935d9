"""Engine-level regression tests for the round-2 fixes: train() must honor
its learning_rate argument (reference recompiles per stage at LR/10,
interior_multi.py:483-501), run validation every epoch, and thread
augmentation into the data pipeline."""

import jax
import numpy as np
import pytest

from mulit_view_object_detection_tpu.compat.model import MaskRCNN
from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.data.augment import (
    AdditiveNoise, Fliplr, Multiply, Rot90, Sequential, Sometimes)
from mulit_view_object_detection_tpu.data.generator import load_image_gt
from mulit_view_object_detection_tpu.data.synthetic import (
    SyntheticMultiViewDataset)


class EngineCfg(Config):
    NAME = "engine"
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
    MAX_GT_INSTANCES = 8
    GRID_REAS = "add"
    nvox = 8
    nvox_z = 8
    vmin, vmax = -2.0, 2.0
    vmin_z, vmax_z = 1.0, 7.0
    samples = 4
    STEPS_PER_EPOCH = 1
    VALIDATION_STEPS = 1


def _params_delta(engine, before):
    after = engine._state.params
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    return np.sqrt(sum(float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
                       for a, b in zip(flat_a, flat_b)))


def _one_epoch_delta(ds, lr, tmp_path, with_val=False, callbacks=None):
    cfg = EngineCfg()
    engine = MaskRCNN("training", cfg, str(tmp_path))
    state = engine._ensure_state()
    before = jax.tree_util.tree_map(np.asarray, state.params)
    engine.train(ds, ds if with_val else None, learning_rate=lr, epochs=1,
                 layers="all", prefetch_threads=1,
                 custom_callbacks=callbacks)
    return _params_delta(engine, before)


@pytest.fixture(scope="module")
def ds():
    return SyntheticMultiViewDataset(num_scenes=2, num_views=2,
                                     image_size=64, num_classes=4, seed=3)


def test_train_honors_learning_rate(ds, tmp_path):
    """One SGD step from zero momentum moves params by exactly lr *
    clipped_grad, so halving train()'s learning_rate must scale the first
    epoch's parameter delta proportionally (the round-1 bug trained stage 3
    at 10x the requested LR)."""
    d_hi = _one_epoch_delta(ds, 1e-3, tmp_path / "hi")
    d_lo = _one_epoch_delta(ds, 1e-4, tmp_path / "lo")
    ratio = d_hi / d_lo
    assert 9.0 < ratio < 11.0, f"LR not honored: delta ratio {ratio:.2f}"


def test_train_reports_validation(ds, tmp_path):
    """With a val_dataset, every epoch must report val_* losses computed
    from VALIDATION_STEPS validation batches."""
    seen = []
    _one_epoch_delta(ds, 1e-3, tmp_path / "val", with_val=True,
                     callbacks=[lambda epoch, metrics: seen.append(metrics)])
    assert seen, "callback never invoked"
    metrics = seen[-1]
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])
    for part in ("rpn_class_loss", "mrcnn_mask_loss"):
        assert f"val_{part}" in metrics
    # observability parity: the loop writes per-epoch scalars both as
    # JSONL and as a TensorBoard event file (reference model.py:2346-2348)
    import glob
    from mulit_view_object_detection_tpu.utils.logging_utils import (
        read_tb_events)
    root = str(tmp_path / "val")
    (jsonl_path,) = glob.glob(f"{root}/**/metrics.jsonl", recursive=True)
    (tb_path,) = glob.glob(f"{root}/**/events.out.tfevents.*",
                           recursive=True)
    ((step, scalars),) = read_tb_events(tb_path)
    assert step == 1 and "val_loss" in scalars and "loss" in scalars


def test_load_image_gt_augmentation_flips_consistently(ds):
    """Fliplr(p=1) must flip the image and keep GT boxes consistent with the
    flipped masks (boxes are re-extracted from the augmented mask)."""
    cfg = EngineCfg()
    image_id = 0
    plain = load_image_gt(ds, cfg, image_id, use_mini_mask=False)
    flipped = load_image_gt(ds, cfg, image_id, use_mini_mask=False,
                            augmentation=Fliplr(p=1.0),
                            rnd=np.random.RandomState(0))
    np.testing.assert_array_equal(flipped[0], plain[0][:, ::-1])
    w = plain[0].shape[1]
    # flipped box x-range mirrors the original: x1' = W - x2, x2' = W - x1
    b_plain, b_flip = plain[3], flipped[3]
    assert b_plain.shape == b_flip.shape and b_plain.shape[0] > 0
    np.testing.assert_array_equal(b_flip[:, 1], w - b_plain[:, 3])
    np.testing.assert_array_equal(b_flip[:, 3], w - b_plain[:, 1])
    np.testing.assert_array_equal(b_flip[:, 0], b_plain[:, 0])


def test_augmenters_contract():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)
    mask = rng.rand(16, 16, 2) > 0.5
    aug = Sequential([Fliplr(0.5), Rot90(), Sometimes(0.5, Multiply()),
                      AdditiveNoise(4.0)])
    for seed in range(5):
        im2, m2 = aug(image.copy(), mask.copy(), np.random.RandomState(seed))
        assert im2.shape == image.shape and im2.dtype == image.dtype
        assert m2.shape == mask.shape
    # photometric ops never touch masks
    im3, m3 = Multiply(0.5, 0.5)(image, mask, rng)
    np.testing.assert_array_equal(m3, mask)
    assert not np.array_equal(im3, image)


def test_find_last_tolerates_unnamed_config(tmp_path):
    class NoName(EngineCfg):
        NAME = None
    engine = MaskRCNN("training", NoName(), str(tmp_path))
    with pytest.raises(FileNotFoundError):
        engine.find_last()  # no AttributeError from NAME=None


def test_transformer_config_validation():
    with pytest.raises(AssertionError, match="TOP_DOWN_PYRAMID_SIZE"):
        class Bad(EngineCfg):
            TRANSFORMER = True
            XFORMER_D_MODEL = 72          # != TOP_DOWN_PYRAMID_SIZE=18
        Bad()
    with pytest.raises(AssertionError, match="divisible by 3"):
        class Bad3(EngineCfg):
            TRANSFORMER = True
            TOP_DOWN_PYRAMID_SIZE = 16
            XFORMER_D_MODEL = 16
        Bad3()

    with pytest.raises(AssertionError, match="samples == 1"):
        class BadS(EngineCfg):
            TRANSFORMER = True
            TOP_DOWN_PYRAMID_SIZE = 18
            XFORMER_D_MODEL = 18
            XFORMER_NUM_HEADS = 2
            samples = 4       # depth-conditioned lift: one depth per ray
        BadS()

    class Good(EngineCfg):
        TRANSFORMER = True
        TOP_DOWN_PYRAMID_SIZE = 18
        XFORMER_D_MODEL = 18
        XFORMER_NUM_HEADS = 2
        samples = 1
    Good()


def test_init_distributed_single_process_is_noop(monkeypatch):
    """Without explicit args or cluster env vars, init_distributed must not
    touch JAX at all (the round-1 version called jax.process_count() first,
    which initialized the backend and made real multi-host init
    impossible)."""
    from mulit_view_object_detection_tpu.parallel import mesh as M
    for var in M._CLUSTER_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert M.init_distributed() is False
    assert not called
    # explicit args reach jax.distributed.initialize
    assert M.init_distributed(coordinator_address="127.0.0.1:1",
                              num_processes=2, process_id=0) is True
    assert called and called[0]["num_processes"] == 2
