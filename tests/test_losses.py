"""Hand-computed oracle tests for the five losses (model.py:1016-1183
semantics: masked means over contributing elements only)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mulit_view_object_detection_tpu.models import losses as L


def softmax_ce(logits, label):
    e = np.exp(logits - logits.max())
    p = e / e.sum()
    return -np.log(p[label])


def test_smooth_l1():
    y = np.asarray(L.smooth_l1(jnp.array([0.0, 0.0, 0.0]),
                               jnp.array([0.5, 1.0, 3.0])))
    np.testing.assert_allclose(y, [0.125, 0.5, 2.5], atol=1e-6)


def test_rpn_class_loss_masks_neutral():
    # 3 anchors: positive, neutral (ignored), negative
    rpn_match = jnp.array([[1, 0, -1]])
    logits = jnp.array([[[0.2, 1.0], [5.0, 5.0], [2.0, -1.0]]])
    got = float(L.rpn_class_loss(rpn_match, logits))
    expect = (softmax_ce(np.array([0.2, 1.0]), 1)
              + softmax_ce(np.array([2.0, -1.0]), 0)) / 2
    assert got == pytest.approx(expect, rel=1e-5)


def test_rpn_bbox_loss_rank_packing():
    """The i-th positive anchor (in anchor order) must be compared against
    target row i (batch_pack_graph semantics, model.py:1051-1077)."""
    rpn_match = jnp.array([[0, 1, -1, 1]])     # positives at anchors 1, 3
    target = jnp.zeros((1, 4, 4)).at[0, 0].set(1.0).at[0, 1].set(2.0)
    pred = jnp.zeros((1, 4, 4))
    pred = pred.at[0, 1].set(1.0)              # matches target row 0
    pred = pred.at[0, 3].set(2.0)              # matches target row 1
    assert float(L.rpn_bbox_loss(target, rpn_match, pred)) == 0.0
    # swap: now both positives are off by +-1 -> smooth_l1(1) = 0.5 each
    pred2 = jnp.zeros((1, 4, 4)).at[0, 1].set(2.0).at[0, 3].set(1.0)
    assert float(L.rpn_bbox_loss(target, rpn_match, pred2)) == \
        pytest.approx(0.5, rel=1e-5)


def test_mrcnn_class_loss_active_weighting():
    target = jnp.array([[1, 0]])
    logits = jnp.array([[[0.0, 3.0, 0.0], [3.0, 0.0, 0.0]]])
    active = jnp.array([[1.0, 1.0, 1.0]])
    got = float(L.mrcnn_class_loss(target, logits, active))
    expect = (softmax_ce(np.array([0.0, 3.0, 0.0]), 1)
              + softmax_ce(np.array([3.0, 0.0, 0.0]), 0)) / 2
    assert got == pytest.approx(expect, rel=1e-5)
    # predictions of inactive classes are erased from the loss
    active2 = jnp.array([[1.0, 0.0, 1.0]])  # class 1 inactive; roi0 predicts 1
    got2 = float(L.mrcnn_class_loss(target, logits, active2))
    expect2 = softmax_ce(np.array([3.0, 0.0, 0.0]), 0)  # only roi1 counts
    assert got2 == pytest.approx(expect2, rel=1e-5)


def test_mrcnn_bbox_loss_class_specific():
    target_ids = jnp.array([[2, 0]])           # roi1 negative -> ignored
    target_bbox = jnp.zeros((1, 2, 4)).at[0, 0].set(1.0)
    pred = jnp.zeros((1, 2, 3, 4))
    pred = pred.at[0, 0, 2].set(1.0)           # class-2 deltas match
    pred = pred.at[0, 0, 1].set(9.0)           # wrong class ignored
    pred = pred.at[0, 1].set(9.0)              # negative roi ignored
    assert float(L.mrcnn_bbox_loss(target_bbox, target_ids, pred)) == 0.0


def test_mrcnn_mask_loss_bce():
    target_ids = jnp.array([[1, 0]])
    tmask = jnp.ones((1, 2, 2, 2))
    pred = jnp.full((1, 2, 2, 2, 3), 0.5)
    pred = pred.at[0, 0, :, :, 1].set(0.9)     # class-1 mask of positive roi
    got = float(L.mrcnn_mask_loss(tmask, target_ids, pred))
    assert got == pytest.approx(-np.log(0.9), rel=1e-4)


def test_total_loss_weights():
    parts = {"rpn_class_loss": 1.0, "rpn_bbox_loss": 2.0,
             "mrcnn_class_loss": 3.0, "mrcnn_bbox_loss": 4.0,
             "mrcnn_mask_loss": 5.0}
    w = {"rpn_class_loss": 2.0}
    assert float(L.total_loss(parts, w)) == 2.0 + 2 + 3 + 4 + 5


def test_all_zero_inputs_give_zero_losses():
    z = jnp.zeros
    assert float(L.rpn_class_loss(z((1, 4), jnp.int32),
                                  z((1, 4, 2)))) == 0.0
    assert float(L.rpn_bbox_loss(z((1, 4, 4)), z((1, 4), jnp.int32),
                                 z((1, 4, 4)))) == 0.0
    assert float(L.mrcnn_bbox_loss(z((1, 4, 4)), z((1, 4), jnp.int32),
                                   z((1, 4, 3, 4)))) == 0.0
    assert float(L.mrcnn_mask_loss(z((1, 4, 2, 2)), z((1, 4), jnp.int32),
                                   z((1, 4, 2, 2, 3)))) == 0.0
