"""End-to-end model forward/training-step smoke tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.models.detector import (
    MaskRCNN, make_dummy_batch)


class TinyBase(Config):
    NAME = "tiny"
    NUM_CLASSES = 4
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    BACKBONE = "resnet50"
    TOP_DOWN_PYRAMID_SIZE = 18   # divisible by 3 for the transformer
    FPN_CLASSIF_FC_LAYERS_SIZE = 32
    PRE_NMS_LIMIT = 256
    POST_NMS_ROIS_TRAINING = 32
    POST_NMS_ROIS_INFERENCE = 32
    TRAIN_ROIS_PER_IMAGE = 16
    DETECTION_MAX_INSTANCES = 8
    MAX_GT_INSTANCES = 8
    nvox = 8
    nvox_z = 8
    vmin, vmax = -2.0, 2.0
    vmin_z, vmax_z = 1.0, 5.0
    samples = 4
    XFORMER_NUM_LAYERS = 1
    XFORMER_D_MODEL = 18
    XFORMER_NUM_HEADS = 2
    XFORMER_DFF = 24


def _init_and_run(cfg, training):
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=training)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, training=training)
    out = model.apply(variables, batch, training=training,
                      rngs={"sampling": jax.random.PRNGKey(3),
                            "dropout": jax.random.PRNGKey(4)})
    return variables, out


def test_single_view_inference():
    class C(TinyBase):
        NUM_VIEWS = 1
    cfg = C()
    _, out = _init_and_run(cfg, training=False)
    assert out["detections"].shape == (1, 8, 6)
    assert out["mrcnn_masks"].shape == (1, 8, 28, 28, 4)
    assert out["proposals"].shape == (1, 32, 4)
    assert np.isfinite(np.asarray(out["detections"])).all()


def test_multiview_conv3d_inference():
    class C(TinyBase):
        NUM_VIEWS = 2
        GRID_REAS = "conv3d"
        IMAGES_PER_GPU = 1
    cfg = C()
    variables, out = _init_and_run(cfg, training=False)
    assert out["detections"].shape == (1, 8, 6)
    # SEPARATE fusion params per non-zeroed level (matches the reference's
    # per-level reused_lay scopes, model_multi.py:394-463)
    for li in (4, 5, 6):
        assert f"grid_fusion_p{li}" in variables["params"]
        assert f"depth_collapse_p{li}" in variables["params"]
    kp4 = variables["params"]["grid_fusion_p4"]
    kp5 = variables["params"]["grid_fusion_p5"]
    assert jax.tree_util.tree_structure(kp4) == \
        jax.tree_util.tree_structure(kp5)


def test_multiview_add_training_losses():
    class C(TinyBase):
        NUM_VIEWS = 2
        GRID_REAS = "add"
    cfg = C()
    from mulit_view_object_detection_tpu.train.step import compute_losses

    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=True)
    # put one GT box in each image so positives can exist
    batch["gt_class_ids"][:, 0] = 1
    batch["gt_boxes"][:, 0] = [0.3, 0.3, 0.6, 0.6]
    batch["gt_masks"][:, 0] = 1.0
    batch["rpn_match"] = np.zeros((1, batch["anchors"].shape[0]), np.int32)
    batch["rpn_match"][:, :8] = 1
    batch["rpn_match"][:, 8:64] = -1
    batch["rpn_bbox"] = np.zeros((1, cfg.RPN_TRAIN_ANCHORS_PER_IMAGE, 4),
                                 np.float32)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, training=True)
    out = model.apply(variables, batch, training=True,
                      rngs={"sampling": jax.random.PRNGKey(3),
                            "dropout": jax.random.PRNGKey(4)})
    assert out["rois"].shape == (1, 16, 4)
    losses = compute_losses(out, batch, cfg)
    for name, val in losses.items():
        v = float(val)
        assert np.isfinite(v), name
        assert v >= 0, name


def test_const_span_proposals_match_bruteforce_topk():
    """End-to-end check of the split top-k layout assumption: on a real
    forward pass with zeroed levels, (a) the folded RPN's scores in each
    zeroed span must be k-periodic constants (one per ratio slot — NOT
    one flat constant), and (b) the detector's proposals must equal
    generate_proposals recomputed with plain lax.top_k (no const_spans)
    on the same RPN outputs."""
    from mulit_view_object_detection_tpu.ops.anchors import (
        compute_backbone_shapes, get_anchors)
    from mulit_view_object_detection_tpu.ops.proposals import (
        generate_proposals)

    class C(TinyBase):
        NUM_VIEWS = 2
        GRID_REAS = "add"
        IMAGES_PER_GPU = 1
    cfg = C()
    assert tuple(cfg.ZERO_PG_LEVELS) == (0, 1)
    model = MaskRCNN(cfg)
    batch = {kk: jnp.asarray(v)
             for kk, v in make_dummy_batch(cfg, training=False).items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch, training=False)
    # fresh init has zero conv biases -> the zeroed levels' per-ratio
    # constants all coincide at 0.5 and nothing discriminates; set
    # distinct per-slot biases like a trained model has
    k = len(cfg.RPN_ANCHOR_RATIOS)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    # distinct per-slot (bg, fg) logit GAPS -> distinct fg probabilities
    variables["params"]["rpn"]["rpn_class_raw"]["bias"] = np.array(
        [0.0, 0.1, 0.0, 0.5, 0.0, 2.0][:2 * k], np.float32)
    out = model.apply(variables, batch, training=False,
                      rngs={"sampling": jax.random.PRNGKey(3),
                            "dropout": jax.random.PRNGKey(4)})

    probs = np.asarray(out["rpn_probs"])
    shapes = compute_backbone_shapes(cfg, cfg.IMAGE_SHAPE)
    counts = [int(h * w * k) for h, w in shapes[:5]]
    # (a) zeroed spans are k-periodic with k DISTINCT constants
    off = 0
    for li, n_l in enumerate(counts):
        span = probs[0, off:off + n_l, 1]
        if li in cfg.ZERO_PG_LEVELS:
            np.testing.assert_array_equal(
                span, np.tile(span[:k], n_l // k))
            assert len(set(span[:k].tolist())) == k  # distinct per slot
        off += n_l
    # (b) proposals == brute-force top-k path on the same RPN outputs
    anchors = get_anchors(cfg, cfg.IMAGE_SHAPE)
    brute = generate_proposals(
        jnp.asarray(out["rpn_probs"]), jnp.asarray(out["rpn_bbox"]),
        jnp.asarray(anchors, jnp.float32),
        proposal_count=cfg.POST_NMS_ROIS_INFERENCE,
        nms_threshold=cfg.RPN_NMS_THRESHOLD,
        pre_nms_limit=cfg.PRE_NMS_LIMIT,
        bbox_std_dev=np.asarray(cfg.RPN_BBOX_STD_DEV))
    np.testing.assert_array_equal(np.asarray(out["proposals"]),
                                  np.asarray(brute))


def test_rpn_anchor_stride_two_alignment():
    """RPN_ANCHOR_STRIDE=2: the folded-RPN tiling on zeroed levels must
    produce the strided conv's cell count (ceil(dim/stride)), keeping
    rpn outputs aligned with the anchor lattice — the old reps = lh*lw
    assumed stride 1 and silently misaligned scores with anchors."""
    from mulit_view_object_detection_tpu.ops.anchors import get_anchors

    class C(TinyBase):
        NUM_VIEWS = 2
        GRID_REAS = "add"
        RPN_ANCHOR_STRIDE = 2
    cfg = C()
    _, out = _init_and_run(cfg, training=False)
    anchors = get_anchors(cfg, cfg.IMAGE_SHAPE)
    assert out["rpn_probs"].shape[1] == anchors.shape[0]
    assert np.isfinite(np.asarray(out["detections"])).all()


def test_vanilla_and_transformer_paths():
    class CV(TinyBase):
        NUM_VIEWS = 2
        VANILLA = True
    _, out = _init_and_run(CV(), training=False)
    assert out["detections"].shape == (1, 8, 6)

    class CT(TinyBase):
        NUM_VIEWS = 2
        TRANSFORMER = True
        samples = 1
    cfg = CT()
    variables, out = _init_and_run(cfg, training=False)
    assert out["detections"].shape == (1, 8, 6)
    assert "view_transformer" in variables["params"]


def test_transformer_keep_main_levels():
    """XFORMER_KEEP_MAIN_LEVELS=True feeds the main view's features to the
    non-P5 levels instead of the reference's zeros: the P2 RPN response
    must vary spatially (a zeroed level yields one constant logit tile)."""
    class Zeroed(TinyBase):
        NUM_VIEWS = 2
        TRANSFORMER = True
        samples = 1

    class KeepMain(Zeroed):
        XFORMER_KEEP_MAIN_LEVELS = True

    def run(cfg):
        model = MaskRCNN(cfg)
        batch = make_dummy_batch(cfg, training=False)
        # non-constant images: a zero-filled batch makes every feature map
        # spatially constant, which would void the variance check below
        batch["images"] = np.random.RandomState(0).randn(
            *batch["images"].shape).astype(np.float32) * 50.0
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        rngs = {"params": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1),
                "dropout": jax.random.PRNGKey(2)}
        variables = model.init(rngs, batch, training=False)
        return model.apply(variables, batch, training=False,
                           rngs={"sampling": jax.random.PRNGKey(3),
                                 "dropout": jax.random.PRNGKey(4)})

    p2_anchors = 16 * 16 * 3   # 64px / stride 4, 3 ratios
    seg0 = np.asarray(run(Zeroed())["rpn_class_logits"][0, :p2_anchors])
    assert np.all(seg0.std(axis=0) < 1e-6)

    seg1 = np.asarray(run(KeepMain())["rpn_class_logits"][0, :p2_anchors])
    assert seg1.std(axis=0).max() > 1e-4


def test_uint8_image_transfer_exactness():
    """UINT8_IMAGE_TRANSFER ships raw resized uint8 and de-molds on device
    (detector.py intake); the result must be BIT-identical to the host-
    molded float path, because resize_image returns uint8 either way."""
    class C(TinyBase):
        NUM_VIEWS = 2
        GRID_REAS = "add"
        IMAGES_PER_GPU = 1
    cfg = C()
    model = MaskRCNN(cfg)

    rng = np.random.RandomState(3)
    raw = rng.randint(0, 256, size=(1, 2, 64, 64, 3)).astype(np.uint8)
    mean = np.asarray(cfg.MEAN_PIXEL, np.float32)

    batch_f32 = make_dummy_batch(cfg, training=False)
    batch_f32["images"] = raw.astype(np.float32) - mean  # host mold
    batch_u8 = dict(batch_f32)
    batch_u8["images"] = raw                             # device mold

    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, batch_f32, training=False)
    out_f = model.apply(variables, batch_f32, training=False)
    out_u = model.apply(variables, batch_u8, training=False)
    np.testing.assert_array_equal(np.asarray(out_f["detections"]),
                                  np.asarray(out_u["detections"]))
    np.testing.assert_array_equal(np.asarray(out_f["mrcnn_masks"]),
                                  np.asarray(out_u["mrcnn_masks"]))


def test_uint8_image_transfer_batch_plumbing():
    """make_batch + make_dummy_batch emit uint8 images when the config
    asks for the on-device mold, and the molded pixel values round-trip."""
    from mulit_view_object_detection_tpu.data.generator import make_batch
    from mulit_view_object_detection_tpu.data.synthetic import (
        SyntheticMultiViewDataset)

    class C(TinyBase):
        NUM_VIEWS = 2
        GRID_REAS = "add"
        UINT8_IMAGE_TRANSFER = True
        USE_MINI_MASK = True
        MINI_MASK_SHAPE = (14, 14)
    cfg = C()
    assert make_dummy_batch(cfg)["images"].dtype == np.uint8
    ds = SyntheticMultiViewDataset(num_scenes=1, num_views=2,
                                   image_size=64,
                                   num_classes=cfg.NUM_CLASSES, seed=0)
    s_u8 = make_batch(ds, cfg, rnd_state=0)
    assert s_u8["images"].dtype == np.uint8

    class Cf(C):
        UINT8_IMAGE_TRANSFER = False
    s_f = make_batch(ds, Cf(), rnd_state=0)
    assert s_f["images"].dtype == np.float32
    mean = np.asarray(cfg.MEAN_PIXEL, np.float32)
    np.testing.assert_array_equal(
        s_u8["images"].astype(np.float32) - mean, s_f["images"])
