"""Space-to-depth stem (Config.STEM_S2D) exactness vs the plain 7x7/2 stem.

_S2DStemConv must reproduce nn.Conv(64, (7,7), strides=2, VALID) on the
pad-3 input — the reference's stage-1 conv (model.py:179-183) — with an
identical parameter tree ('kernel' [7,7,3,64], 'bias').
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mulit_view_object_detection_tpu.models.resnet import (
    ResNet, _S2DStemConv)


def test_stem_matches_plain_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 70, 70, 3).astype(np.float32))  # even
    ref = nn.Conv(64, (7, 7), strides=2, padding="VALID")
    params = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(params, x)

    s2d = _S2DStemConv(64)
    pshapes = jax.tree_util.tree_map(
        lambda a: a.shape, s2d.init(jax.random.PRNGKey(2), x))
    assert pshapes == jax.tree_util.tree_map(lambda a: a.shape, params)
    got = s2d.apply(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("size", [64, 65])  # 64+6 even -> s2d; 65+6 odd
                                            # -> plain-stem fallback
def test_backbone_stem_s2d_matches(size):
    """Full backbone with stem_s2d=True equals baseline on the same
    params (and falls back to the plain stem for odd padded sizes)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, size, size, 3).astype(np.float32))
    base = ResNet("resnet50", stage5=True)
    variables = base.init(jax.random.PRNGKey(4), x)
    want = base.apply(variables, x)
    fast = ResNet("resnet50", stage5=True, stem_s2d=True)
    got = fast.apply(variables, x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4)
