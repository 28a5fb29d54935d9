"""Z-fold U-Net conv exactness (Config.ZFOLD_FUSION).

The serving-time z-major lowering (models/fusion.py::ZfoldConv3D /
ZfoldPhaseConvTranspose3D) folds the kernel's z taps into input channels
and Z into the batch dim, so the conv3d U-Net's 3D convs run through
XLA:TPU's 2D emitters. It must reproduce nn.Conv / nn.ConvTranspose
(k=3, s=2, SAME) — the faithful lowerings of the reference MLF U-Net's
Conv3D/Conv3DTranspose (model_multi.py:406-441) — with identical
parameter trees, so trained checkpoints serve unchanged.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulit_view_object_detection_tpu.models.fusion import (
    GridFusion, ZfoldConv3D, ZfoldPhaseConvTranspose3D)


def _to_zmajor(x):
    return jnp.transpose(x, (0, 3, 1, 2, 4))


def _from_zmajor(x):
    return jnp.transpose(x, (0, 2, 3, 1, 4))


@pytest.mark.parametrize("shape,features", [
    ((1, 8, 8, 8, 6), 4),
    ((2, 4, 6, 8, 3), 5),      # anisotropic, batch 2
    ((1, 10, 10, 10, 16), 8),  # flagship-like ratio
])
def test_zfold_conv_matches_strided_conv(shape, features):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref = nn.Conv(features, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
    params = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(params, x)

    zf = ZfoldConv3D(features)
    # identical parameter tree: same names, same shapes
    chex_shapes = jax.tree_util.tree_map(
        lambda a: a.shape,
        zf.init(jax.random.PRNGKey(2), _to_zmajor(x)))
    assert chex_shapes == jax.tree_util.tree_map(lambda a: a.shape, params)
    got = _from_zmajor(zf.apply(params, _to_zmajor(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape,features", [
    ((1, 8, 8, 8, 6), 4),
    ((2, 4, 6, 8, 3), 5),
    ((1, 10, 10, 10, 16), 8),
])
def test_zfold_deconv_matches_conv_transpose(shape, features):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    ref = nn.ConvTranspose(features, (3, 3, 3), strides=(2, 2, 2),
                           padding="SAME")
    params = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(params, x)

    zf = ZfoldPhaseConvTranspose3D(features)
    chex_shapes = jax.tree_util.tree_map(
        lambda a: a.shape,
        zf.init(jax.random.PRNGKey(2), _to_zmajor(x)))
    assert chex_shapes == jax.tree_util.tree_map(lambda a: a.shape, params)
    got = _from_zmajor(zf.apply(params, _to_zmajor(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("inputs_fused", [False, True])
def test_gridfusion_zfold_matches_standard(inputs_fused):
    """Full conv3d GridFusion: zfold path == standard path on the same
    params, for both input layouts."""
    rng = np.random.RandomState(0)
    b, v, n, c = 1, 2, 8, 6
    if inputs_fused:
        x = jnp.asarray(
            np.maximum(rng.randn(b, n, n, n, v * c), 0).astype(np.float32))
    else:
        x = jnp.asarray(rng.randn(b, v, n, n, n, c).astype(np.float32))

    base = GridFusion("conv3d", channels=c, num_views=v,
                      inputs_fused=inputs_fused)
    params = base.init(jax.random.PRNGKey(1), x)
    want = base.apply(params, x)

    zf = GridFusion("conv3d", channels=c, num_views=v,
                    inputs_fused=inputs_fused, zfold=True)
    # same param tree -> checkpoints serve unchanged under ZFOLD_FUSION
    assert (jax.tree_util.tree_map(lambda a: a.shape,
                                   zf.init(jax.random.PRNGKey(2), x))
            == jax.tree_util.tree_map(lambda a: a.shape, params))
    got = zf.apply(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
