"""End-to-end training smoke test: the full multi-view pipeline must LEARN
on synthetic scenes (fixed seed) — losses decrease over a few dozen steps.
This is the framework's substitute for the reference's manual notebook
training checks (SURVEY.md §4)."""

import jax
import numpy as np

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.data.generator import make_batch
from mulit_view_object_detection_tpu.data.synthetic import (
    SyntheticMultiViewDataset)
from mulit_view_object_detection_tpu.models.detector import MaskRCNN
from mulit_view_object_detection_tpu.train.step import (
    create_train_state, make_train_step)


class E2ECfg(Config):
    NAME = "e2e"
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
    LEARNING_RATE = 0.002


def test_training_reduces_losses():
    cfg = E2ECfg()
    ds = SyntheticMultiViewDataset(num_scenes=4, num_views=2,
                                   image_size=64, num_classes=4, seed=1)
    model = MaskRCNN(cfg)
    batch0 = make_batch(ds, cfg, rnd_state=0)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch0)
    train_step = make_train_step(cfg, stage="all", donate=False)

    rng = jax.random.PRNGKey(42)
    losses = []
    n_steps = 30
    for i in range(n_steps):
        batch = make_batch(ds, cfg, rnd_state=i % 4)
        rng, step_rng = jax.random.split(rng)
        state, metrics = train_step(state, batch, step_rng)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1]), f"non-finite loss at step {i}"

    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"
    # measurable progress on 4 fixed scenes in 30 steps
    assert last < 0.95 * first, f"insufficient progress: {first} -> {last}"
