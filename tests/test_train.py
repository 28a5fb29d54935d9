import jax
import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.train.optim import (
    clip_per_leaf_norm, l2_regularization, make_optimizer, mask_gradients)
from mulit_view_object_detection_tpu.train.step import lr_schedule
from mulit_view_object_detection_tpu.train.trainable import trainable_mask


def fake_params():
    return {
        "backbone": {
            "conv1": {"kernel": jnp.ones((3, 3, 3, 8))},
            "res3a": {"conv2a": {"kernel": jnp.ones((1, 1, 8, 8))}},
            "res4a": {"conv2a": {"kernel": jnp.ones((1, 1, 8, 8))}},
            "res5a": {"conv2a": {"kernel": jnp.ones((1, 1, 8, 8))},
                      "bn2a": {"BatchNorm_0": {"scale": jnp.ones((8,)),
                                               "bias": jnp.zeros((8,))}}},
        },
        "fpn": {"fpn_p2": {"kernel": jnp.ones((3, 3, 8, 8))}},
        "rpn": {"rpn_conv_shared": {"kernel": jnp.ones((3, 3, 8, 8))}},
        "classifier_head": {"mrcnn_class_conv1": {"kernel": jnp.ones((7, 7, 8, 8))}},
        "mask_head": {"mrcnn_mask_conv1": {"kernel": jnp.ones((3, 3, 8, 8))}},
        "grid_fusion_p4": {"down1": {"kernel": jnp.ones((3, 3, 3, 8, 8))}},
        "depth_collapse_p4": {"collapse": {"kernel": jnp.ones((1, 1, 4, 1))}},
    }


def _mask_of(stage):
    params = fake_params()
    mask = trainable_mask(params, stage)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    return {"/".join(getattr(k, "key", str(k)) for k in p): v
            for p, v in flat}


def test_trainable_stage_heads():
    m = _mask_of("heads")
    assert m["rpn/rpn_conv_shared/kernel"]
    assert m["fpn/fpn_p2/kernel"]
    assert m["classifier_head/mrcnn_class_conv1/kernel"]
    assert m["depth_collapse_p4/collapse/kernel"]
    assert not m["grid_fusion_p4/down1/kernel"]
    assert not m["backbone/conv1/kernel"]


def test_trainable_stage_grid():
    m = _mask_of("grid+")
    assert m["grid_fusion_p4/down1/kernel"]
    assert m["fpn/fpn_p2/kernel"]
    assert not m["backbone/res4a/conv2a/kernel"]
    m = _mask_of("grid_only")
    assert m["grid_fusion_p4/down1/kernel"]
    assert not m["rpn/rpn_conv_shared/kernel"]
    m = _mask_of("grid+-")
    assert not m["fpn/fpn_p2/kernel"]
    assert m["rpn/rpn_conv_shared/kernel"]


def test_trainable_stage_resnet():
    m = _mask_of("4+")
    assert m["backbone/res4a/conv2a/kernel"]
    assert m["backbone/res5a/conv2a/kernel"]
    assert not m["backbone/res3a/conv2a/kernel"]
    assert not m["backbone/conv1/kernel"]
    assert m["grid_fusion_p4/down1/kernel"]
    m = _mask_of("all")
    assert all(m.values())


def test_clip_per_leaf_norm():
    tx = clip_per_leaf_norm(1.0)
    grads = {"a": jnp.full((4,), 10.0), "b": jnp.full((4,), 0.1)}
    state = tx.init(grads)
    clipped, _ = tx.update(grads, state)
    np.testing.assert_allclose(
        np.sqrt(np.sum(np.square(np.asarray(clipped["a"])))), 1.0,
        rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["b"]),
                               np.asarray(grads["b"]))  # under the cap


def test_l2_regularization_excludes_bn():
    params = fake_params()
    mask = trainable_mask(params, "all")
    reg = float(l2_regularization(params, mask, weight_decay=1.0))
    # every non-BN leaf has mean(w^2)=1 -> reg = number of non-BN leaves
    n_leaves = len(jax.tree_util.tree_leaves(params))
    assert reg == n_leaves - 2  # scale+bias excluded


def test_mask_gradients():
    params = fake_params()
    mask = trainable_mask(params, "heads")
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = mask_gradients(grads, mask)
    assert float(jnp.sum(masked["backbone"]["conv1"]["kernel"])) == 0.0
    assert float(jnp.sum(masked["rpn"]["rpn_conv_shared"]["kernel"])) > 0


def test_sgd_momentum_step():
    tx = make_optimizer(0.1, momentum=0.9, clipnorm=100.0)
    params = {"w": jnp.zeros((2,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((2,))}
    updates, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)


def test_lr_schedule():
    fn = lr_schedule(0.001, [(301, 0.001), (4001, 0.001), (4501, 0.0001)])
    np.testing.assert_allclose(float(fn(0)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(fn(300)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(fn(301)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(fn(4001)), 0.0001, rtol=1e-6)
    np.testing.assert_allclose(float(fn(4500)), 0.0001, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from mulit_view_object_detection_tpu.train.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint)
    from mulit_view_object_detection_tpu.train.step import TrainState
    import optax

    params = fake_params()
    tx = make_optimizer(0.1)
    state = TrainState(step=jnp.asarray(7), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx,
                       apply_fn=None)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state)
    assert latest_step(ckpt) == 7

    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    blank = TrainState(step=jnp.asarray(0), params=zeros, batch_stats={},
                       opt_state=tx.init(zeros), tx=tx, apply_fn=None)
    restored = restore_checkpoint(ckpt, blank)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(restored.params["fpn"]["fpn_p2"]["kernel"]), 1.0)
