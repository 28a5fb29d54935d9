import jax
import jax.numpy as jnp
import numpy as np

from mulit_view_object_detection_tpu.models.fpn import FPN
from mulit_view_object_detection_tpu.models.fusion import (
    ConvLSTM3D, DepthCollapse, GridFusion)
from mulit_view_object_detection_tpu.models.heads import (
    ClassifierHead, MaskHead)
from mulit_view_object_detection_tpu.models.resnet import ResNet
from mulit_view_object_detection_tpu.models.rpn import RPNHead
from mulit_view_object_detection_tpu.models.transformer import (
    ViewFusionTransformer, positional_encoding_3d)


def test_resnet_shapes():
    m = ResNet("resnet50")
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    c1, c2, c3, c4, c5 = m.apply(vars_, x)
    assert c1.shape == (1, 16, 16, 64)
    assert c2.shape == (1, 16, 16, 256)
    assert c3.shape == (1, 8, 8, 512)
    assert c4.shape == (1, 4, 4, 1024)
    assert c5.shape == (1, 2, 2, 2048)


def test_fpn_shapes():
    m = FPN(out_channels=32)
    shapes = [(1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024),
              (1, 2, 2, 2048)]
    cs = [jnp.zeros(s) for s in shapes]
    vars_ = m.init(jax.random.PRNGKey(0), *cs)
    p2, p3, p4, p5, p6 = m.apply(vars_, *cs)
    assert p2.shape == (1, 16, 16, 32)
    assert p5.shape == (1, 2, 2, 32)
    assert p6.shape == (1, 1, 1, 32)


def test_rpn_shared_weights():
    m = RPNHead(anchors_per_location=3)
    x = jnp.ones((2, 8, 8, 32))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    logits, probs, deltas = m.apply(vars_, x)
    assert logits.shape == (2, 8 * 8 * 3, 2)
    assert probs.shape == (2, 8 * 8 * 3, 2)
    assert deltas.shape == (2, 8 * 8 * 3, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, atol=1e-5)


def test_heads_shapes():
    ch = ClassifierHead(num_classes=5, pool_size=7, fc_layers_size=64)
    pooled = jnp.zeros((2, 10, 7, 7, 32))
    vars_ = ch.init(jax.random.PRNGKey(0), pooled)
    logits, probs, bbox = ch.apply(vars_, pooled)
    assert logits.shape == (2, 10, 5)
    assert bbox.shape == (2, 10, 5, 4)

    mh = MaskHead(num_classes=5, conv_filters=32)
    pooled = jnp.zeros((2, 10, 14, 14, 32))
    vars_ = mh.init(jax.random.PRNGKey(0), pooled)
    masks = mh.apply(vars_, pooled)
    assert masks.shape == (2, 10, 28, 28, 5)
    assert (np.asarray(masks) >= 0).all() and (np.asarray(masks) <= 1).all()


def test_fusion_modes():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 2, 4, 4, 4, 8)
                    .astype(np.float32))
    for mode in ("add", "mean", "ident", "conv3d", "lstm3d"):
        m = GridFusion(mode=mode, channels=8, num_views=2)
        vars_ = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vars_, x)
        assert out.shape == (1, 4, 4, 4, 8), mode
        assert np.isfinite(np.asarray(out)).all(), mode


def test_fusion_mean_is_mean():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 2, 2, 2, 4)
                    .astype(np.float32))
    m = GridFusion(mode="mean", channels=4, num_views=3)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x).mean(1),
                               atol=1e-6)


def test_convlstm_scan_matches_unroll():
    """lax.scan over views == manual per-view unrolled cell application."""
    from mulit_view_object_detection_tpu.models.fusion import ConvLSTMCell3D
    x = jnp.asarray(np.random.RandomState(1).rand(1, 3, 2, 2, 2, 4)
                    .astype(np.float32))
    m = ConvLSTM3D(filters=4)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(vars_, x))

    cell = ConvLSTMCell3D(filters=4)
    cell_vars = {"params": vars_["params"]["cell"]}
    carry = (jnp.zeros((1, 2, 2, 2, 4)), jnp.zeros((1, 2, 2, 2, 4)))
    for t in range(3):
        carry, _ = cell.apply(cell_vars, carry, x[:, t])
    np.testing.assert_allclose(out, np.asarray(carry[1]), atol=1e-5)


def test_convlstm_hoist_matches_scan():
    """Hoisted input conv (Config.LSTM_HOIST_INPUT) == scanned
    fused-gate cell: identical parameter tree, same output up to
    summation order (conv is linear in the channel concat)."""
    x = jnp.asarray(np.random.RandomState(2).rand(2, 4, 3, 3, 3, 6)
                    .astype(np.float32))
    ref = ConvLSTM3D(filters=5)
    vars_ = ref.init(jax.random.PRNGKey(0), x)
    want = np.asarray(ref.apply(vars_, x))

    hoist = ConvLSTM3D(filters=5, hoist_input=True)
    hshapes = jax.tree_util.tree_map(
        lambda a: a.shape, hoist.init(jax.random.PRNGKey(1), x))
    assert hshapes == jax.tree_util.tree_map(lambda a: a.shape, vars_)
    got = np.asarray(hoist.apply(vars_, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gridfusion_lstm_hoist_matches():
    """GridFusion(lstm3d) with lstm_hoist serves a scanned-path
    checkpoint unchanged."""
    x = jnp.asarray(np.random.RandomState(3).rand(1, 3, 4, 4, 4, 8)
                    .astype(np.float32))
    ref = GridFusion(mode="lstm3d", channels=8, num_views=3)
    vars_ = ref.init(jax.random.PRNGKey(0), x)
    want = np.asarray(ref.apply(vars_, x))
    hoist = GridFusion(mode="lstm3d", channels=8, num_views=3,
                       lstm_hoist=True)
    got = np.asarray(hoist.apply(vars_, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_depth_collapse_modes():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 8, 8, 16)
                    .astype(np.float32))
    for mode in ("conv3d", "add"):
        m = DepthCollapse(mode=mode, channels=16, samples=4)
        vars_ = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(vars_, x)
        assert out.shape == (1, 8, 8, 16), mode
        # the SAME module instance must apply to every pyramid level
        # (weights shared across levels, reused_lay in the reference)
        for s in (4, 2, 1):
            xs = jnp.asarray(np.random.RandomState(1)
                             .rand(1, 4, s, s, 16).astype(np.float32))
            out = m.apply(vars_, xs)
            assert out.shape == (1, s, s, 16), (mode, s)


def test_positional_encoding_3d():
    pos = jnp.asarray(np.random.RandomState(0).randn(1, 10, 3)
                      .astype(np.float32))
    pe = np.asarray(positional_encoding_3d(pos, 72))
    assert pe.shape == (1, 10, 72)
    assert np.abs(pe).max() <= 1.0 + 1e-6
    # zero position -> sin terms 0, cos terms 1
    pe0 = np.asarray(positional_encoding_3d(jnp.zeros((1, 1, 3)), 72))[0, 0]
    assert set(np.round(pe0, 6).tolist()) <= {0.0, 1.0}


def test_view_transformer():
    m = ViewFusionTransformer(num_layers=2, d_model=24, num_heads=4, dff=32,
                              target_size=4)
    tokens = jnp.asarray(np.random.RandomState(0).rand(1, 32, 24)
                         .astype(np.float32))
    pos = jnp.asarray(np.random.RandomState(1).randn(1, 32, 3)
                      .astype(np.float32))
    vars_ = m.init(jax.random.PRNGKey(0), tokens, pos)
    out = m.apply(vars_, tokens, pos)
    assert out.shape == (1, 4, 4, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_remat_grads_match():
    """REMAT changes the backward-pass schedule (recompute instead of
    store), never the math: params and gradients must agree with and
    without it (up to FP reassociation in the recomputed reductions)."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3)
                    .astype(np.float32))

    def run(remat):
        m = ResNet("resnet50", stage5=True, remat=remat)
        vars_ = m.init(jax.random.PRNGKey(0), x)

        def loss(params):
            outs = m.apply({"params": params,
                            "batch_stats": vars_["batch_stats"]}, x)
            return sum(jnp.sum(o ** 2) for o in outs if o is not None)

        return vars_["params"], jax.grad(loss)(vars_["params"])

    p0, g0 = run(False)
    p1, g1 = run(True)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p1)
    def close(a, b):
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)

    jax.tree_util.tree_map(close, g0, g1)


def test_view_transformer_zero_init_starts_silent():
    """XFORMER_ZERO_INIT (ReZero-style): with zero_init=True the final
    token projection's kernel is zeros, so the fused residual branch
    contributes EXACTLY nothing at init (only the projection bias, also
    zero) — the detector's P5 = main + fused reduces to main P5. The
    branch still trains: the kernel's gradient is nonzero because its
    inputs are."""
    m = ViewFusionTransformer(num_layers=2, d_model=24, num_heads=4, dff=32,
                              target_size=4, zero_init=True)
    tokens = jnp.asarray(np.random.RandomState(0).rand(1, 32, 24)
                         .astype(np.float32))
    pos = jnp.asarray(np.random.RandomState(1).randn(1, 32, 3)
                      .astype(np.float32))
    vars_ = m.init(jax.random.PRNGKey(0), tokens, pos)
    out = m.apply(vars_, tokens, pos)
    assert np.abs(np.asarray(out)).max() == 0.0

    def loss(v):
        return jnp.sum(m.apply(v, tokens, pos) ** 2.0) + jnp.sum(
            m.apply(v, tokens, pos))

    g = jax.grad(loss)(vars_)
    gk = np.asarray(g["params"]["token_proj"]["kernel"])
    assert np.abs(gk).max() > 0.0
