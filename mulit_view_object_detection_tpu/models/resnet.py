"""ResNet-50/101 backbone (Flax linen), bottleneck-v1 topology matching the
reference graph (model.py:95-206) so COCO h5 weights can be imported
layer-for-layer:

  stage 1: 7x7/2 conv (pad 3) + BN + relu + 3x3/2 same maxpool
  stage 2: conv_block(64,64,256, stride 1) + 2 identity blocks
  stage 3: conv_block(128,128,512) + 3 identity
  stage 4: conv_block(256,256,1024) + {resnet50: 3, resnet101: 22} identity
           (the reference's multi-view fork silently uses 5 for resnet50,
            model_multi.py:596 — reproducible via stage4_blocks)
  stage 5: conv_block(512,512,2048) + 2 identity

The view axis is folded into the batch axis by the caller (the TPU-native
equivalent of the reference's TimeDistributed wrapping, model_multi.py:497-502)
— the backbone itself is single-image.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

BLOCK_COUNTS = {"resnet50": 3, "resnet101": 22}


class _AffineBN(nn.Module):
    """Inference-only replacement for nn.BatchNorm with an IDENTICAL
    parameter/variable tree (scale/bias params + mean/var batch_stats, so
    checkpoints and the h5 importer are layout-compatible), computing the
    pre-folded affine x*scale + bias. Used via Config.FOLD_BN together
    with utils.bn_fold.fold_bn_variables, which bakes
    gamma/sqrt(var+eps) into the preceding conv (or into scale/bias here
    when no conv precedes): removes the per-BN rsqrt/mul scalar chains
    from the serving graph."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        self.variable("batch_stats", "mean",
                      lambda: jnp.zeros((c,), jnp.float32))
        self.variable("batch_stats", "var",
                      lambda: jnp.ones((c,), jnp.float32))
        return (x.astype(self.dtype) * scale.astype(self.dtype)
                + bias.astype(self.dtype))


class BatchNorm(nn.Module):
    """BN that is frozen (running stats) when train_bn is False — the
    reference's default regime (config.py:208, model_multi.py:71-86).
    With fold=True (Config.FOLD_BN serving mode) the frozen BN is the
    pre-folded affine form instead (same parameter tree)."""
    train_bn: bool = False
    dtype: Any = jnp.float32
    fold: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fold and not self.train_bn:
            return _AffineBN(self.dtype, name="BatchNorm_0")(x)
        return nn.BatchNorm(
            use_running_average=not self.train_bn,
            momentum=0.9, epsilon=1e-3, dtype=self.dtype,
            axis_name=None)(x)


class _S2DStemConv(nn.Module):
    """Space-to-depth form of the 7x7/2 stem conv (serving-time,
    Config.STEM_S2D). The stem's C_in=3 fills 3 of the MXU's 128 input
    lanes (~2% utilization — the single most byte/FLOP-inefficient conv
    in the flagship trace at 0.38 ms/frame). Rearranging the padded input
    into 2x2 phase blocks ([N, 646, 646, 3] -> [N, 323, 323, 12]) and the
    kernel into the matching [4, 4, 12, 64] makes the same convolution a
    stride-1 4x4 conv with 4x the input depth — identical output (the
    7->8 kernel zero-pad contributes nothing; exactness:
    tests/test_stem_s2d.py). Parameter tree matches nn.Conv
    ('kernel' [7,7,3,64], 'bias'), so trained/imported weights serve
    unchanged. (Same trick as MLPerf ResNet space-to-depth stems.)"""
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: the pad-3 input [N, H+6, W+6, 3] (even-sized)."""
        import jax.lax as lax
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        n, h, w, c = x.shape
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2,
                                                    4 * c)
        kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, c, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                    self.features)
        dn = lax.conv_dimension_numbers(xs.shape, kp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xs.astype(self.dtype), kp.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=dn)
        return y + bias.astype(self.dtype)


class _Bottleneck(nn.Module):
    """conv_block / identity_block (model.py:95-168)."""
    filters: tuple  # (f1, f2, f3)
    strides: int = 1
    conv_shortcut: bool = False
    train_bn: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x):
        f1, f2, f3 = self.filters
        shortcut = x
        y = nn.Conv(f1, (1, 1), strides=self.strides, name="conv2a",
                    dtype=self.dtype)(x)
        y = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn2a")(y)
        y = nn.relu(y)
        y = nn.Conv(f2, (3, 3), padding="SAME", name="conv2b",
                    dtype=self.dtype)(y)
        y = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn2b")(y)
        y = nn.relu(y)
        y = nn.Conv(f3, (1, 1), name="conv2c", dtype=self.dtype)(y)
        y = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn2c")(y)
        if self.conv_shortcut:
            shortcut = nn.Conv(f3, (1, 1), strides=self.strides, name="conv1",
                               dtype=self.dtype)(x)
            shortcut = BatchNorm(self.train_bn, self.dtype, self.fold_bn,
                                 name="bn1")(shortcut)
        return nn.relu(y + shortcut)


class ResNet(nn.Module):
    architecture: str = "resnet101"
    stage5: bool = True
    train_bn: bool = False
    stage4_blocks: int | None = None  # override (multi-view fork quirk)
    dtype: Any = jnp.float32
    fold_bn: bool = False
    # Rematerialize each bottleneck in the backward pass: the train step is
    # HBM-bound (BENCH_NOTES MFU table), so re-computing block activations
    # instead of reading them back from HBM trades cheap FLOPs for the
    # dominant byte traffic. Param paths are unchanged (names are explicit).
    remat: bool = False
    # Space-to-depth stem (Config.STEM_S2D serving mode): same parameters,
    # same output, 4x the stem conv's input-lane utilization.
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x):
        """x: [N, H, W, 3] molded images. Returns [C1, C2, C3, C4, C5]."""
        assert self.architecture in BLOCK_COUNTS
        Bottleneck = (nn.remat(_Bottleneck) if self.remat else _Bottleneck)
        # Stage 1 (explicit pad 3 + valid conv, model.py:179-183)
        y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        if self.stem_s2d and y.shape[1] % 2 == 0 and y.shape[2] % 2 == 0:
            y = _S2DStemConv(64, dtype=self.dtype, name="conv1")(y)
        else:
            y = nn.Conv(64, (7, 7), strides=2, padding="VALID",
                        name="conv1", dtype=self.dtype)(y)
        y = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="bn_conv1")(y)
        y = nn.relu(y)
        c1 = y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")

        # Stage 2
        y = Bottleneck((64, 64, 256), 1, True, self.train_bn, self.dtype,
                       fold_bn=self.fold_bn, name="res2a")(y)
        y = Bottleneck((64, 64, 256), train_bn=self.train_bn,
                       dtype=self.dtype, fold_bn=self.fold_bn, name="res2b")(y)
        c2 = y = Bottleneck((64, 64, 256), train_bn=self.train_bn,
                            dtype=self.dtype, fold_bn=self.fold_bn, name="res2c")(y)
        # Stage 3
        y = Bottleneck((128, 128, 512), 2, True, self.train_bn, self.dtype,
                       fold_bn=self.fold_bn, name="res3a")(y)
        for b in "bcd":
            y = Bottleneck((128, 128, 512), train_bn=self.train_bn,
                           dtype=self.dtype, fold_bn=self.fold_bn, name=f"res3{b}")(y)
        c3 = y
        # Stage 4
        y = Bottleneck((256, 256, 1024), 2, True, self.train_bn, self.dtype,
                       fold_bn=self.fold_bn, name="res4a")(y)
        n_blocks = (self.stage4_blocks if self.stage4_blocks is not None
                    else BLOCK_COUNTS[self.architecture])
        for i in range(n_blocks):
            y = Bottleneck((256, 256, 1024), train_bn=self.train_bn,
                           dtype=self.dtype, fold_bn=self.fold_bn, name=f"res4{chr(98 + i)}")(y)
        c4 = y
        # Stage 5
        if self.stage5:
            y = Bottleneck((512, 512, 2048), 2, True, self.train_bn,
                           self.dtype, fold_bn=self.fold_bn, name="res5a")(y)
            y = Bottleneck((512, 512, 2048), train_bn=self.train_bn,
                           dtype=self.dtype, fold_bn=self.fold_bn, name="res5b")(y)
            c5 = Bottleneck((512, 512, 2048), train_bn=self.train_bn,
                            dtype=self.dtype, fold_bn=self.fold_bn, name="res5c")(y)
        else:
            c5 = None
        return [c1, c2, c3, c4, c5]
