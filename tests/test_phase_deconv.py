"""PhaseConvTranspose3D exactness vs flax nn.ConvTranspose.

The serving-time phase decomposition (Config.PHASE_DECONV,
models/fusion.py::PhaseConvTranspose3D) must reproduce
nn.ConvTranspose(k=3, s=2, SAME) — the faithful lowering of the
reference's Conv3DTranspose (model_multi.py:406-441) — with identical
parameter trees, so trained checkpoints serve unchanged.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulit_view_object_detection_tpu.models.fusion import (
    GridFusion, PhaseConvTranspose3D)
from mulit_view_object_detection_tpu.models.heads import (
    MaskHead, _PhaseDeconv2x2)


def _ref_module(features):
    return nn.ConvTranspose(features, (3, 3, 3), strides=(2, 2, 2),
                            padding="SAME")


@pytest.mark.parametrize("shape,features", [
    ((1, 5, 5, 5, 8), 4),      # odd spatial size
    ((2, 10, 10, 10, 16), 8),  # flagship-like ratio (20^3 -> 40^3 scaled)
    ((1, 4, 6, 8, 3), 5),      # anisotropic
])
def test_matches_conv_transpose(shape, features):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref = _ref_module(features)
    params = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(params, x)

    phase = PhaseConvTranspose3D(features)
    # identical parameter tree: same names, same shapes
    pshapes = jax.tree_util.tree_map(
        lambda a: a.shape, phase.init(jax.random.PRNGKey(2), x))
    rshapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert pshapes == rshapes
    got = phase.apply(params, x)

    assert got.shape == want.shape == (
        shape[0], 2 * shape[1], 2 * shape[2], 2 * shape[3], features)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,features", [
    ((3, 14, 14, 8), 8),    # mask-head shape (scaled channels)
    ((1, 7, 5, 4), 6),      # odd/anisotropic
])
def test_phase_deconv_2x2_matches(shape, features):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref = nn.ConvTranspose(features, (2, 2), strides=(2, 2))
    params = ref.init(jax.random.PRNGKey(8), x)
    want = ref.apply(params, x)
    fast = _PhaseDeconv2x2(features)
    pshapes = jax.tree_util.tree_map(
        lambda a: a.shape, fast.init(jax.random.PRNGKey(9), x))
    assert pshapes == jax.tree_util.tree_map(lambda a: a.shape, params)
    got = fast.apply(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_mask_head_phase_deconv_matches_baseline():
    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(1, 6, 14, 14, 32).astype(np.float32))
    base = MaskHead(5, 32, phase_deconv=False)
    variables = base.init(jax.random.PRNGKey(11), x)
    want = base.apply(variables, x)
    got = MaskHead(5, 32, phase_deconv=True).apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gridfusion_phase_deconv_matches_baseline():
    """conv3d GridFusion with phase_deconv=True == baseline on the same
    trained parameters (the serving path's actual usage)."""
    rng = np.random.RandomState(3)
    # inputs_fused layout [B, X, Y, Z, V*C] as the Pallas epilogue emits
    x = jnp.asarray(np.maximum(
        rng.randn(1, 8, 8, 8, 2 * 16), 0).astype(np.float32))
    base = GridFusion("conv3d", 16, 2, train_bn=False, fold_bn=False,
                      inputs_fused=True, phase_deconv=False)
    variables = base.init(jax.random.PRNGKey(4), x)
    want = base.apply(variables, x)
    fast = GridFusion("conv3d", 16, 2, train_bn=False, fold_bn=False,
                      inputs_fused=True, phase_deconv=True)
    got = fast.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
