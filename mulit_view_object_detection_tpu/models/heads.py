"""FPN box/class and mask heads (Flax linen).

  ClassifierHead: fpn_classifier_graph (model.py:904-957) — ROIAlign(7^2) ->
    two conv-as-FC layers (+BN, relu) -> class logits + per-class box deltas.
  MaskHead: build_fpn_mask_graph (model.py:960-1009) — ROIAlign(14^2) ->
    4x(3x3 conv + BN + relu) -> 2x2/2 deconv -> 1x1 sigmoid per class.
    The multi-view fork narrows the mask convs to 128 filters
    (model_multi.py:1412-1438) vs 256 single-view — `conv_filters`.

ROI pooling happens in the caller (ops.roi_align.pyramid_roi_align); heads
take pooled features [B, N, S, S, C] and fold ROIs into the batch axis (the
TPU-native equivalent of TimeDistributed).
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .resnet import BatchNorm


class ClassifierHead(nn.Module):
    num_classes: int
    pool_size: int = 7
    fc_layers_size: int = 1024
    train_bn: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, pooled):
        """pooled: [B, N, S, S, C] -> (logits [B,N,NC], probs [B,N,NC],
        bbox [B,N,NC,4])."""
        b, n, s, _, c = pooled.shape
        x = pooled.reshape(b * n, s, s, c)
        x = nn.Conv(self.fc_layers_size, (self.pool_size, self.pool_size),
                    padding="VALID", name="mrcnn_class_conv1",
                    dtype=self.dtype)(x)
        x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="mrcnn_class_bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.fc_layers_size, (1, 1), name="mrcnn_class_conv2",
                    dtype=self.dtype)(x)
        x = BatchNorm(self.train_bn, self.dtype, self.fold_bn, name="mrcnn_class_bn2")(x)
        x = nn.relu(x)
        shared = x.reshape(b * n, self.fc_layers_size)

        logits = nn.Dense(self.num_classes, name="mrcnn_class_logits",
                          dtype=self.dtype)(shared)
        logits = logits.reshape(b, n, self.num_classes).astype(jnp.float32)
        probs = nn.softmax(logits)
        bbox = nn.Dense(self.num_classes * 4, name="mrcnn_bbox_fc",
                        dtype=self.dtype)(shared)
        bbox = bbox.reshape(b, n, self.num_classes, 4).astype(jnp.float32)
        return logits, probs, bbox


class _PhaseDeconv2x2(nn.Module):
    """Drop-in for nn.ConvTranspose(features, (2, 2), strides=(2, 2))
    (the mask head's deconv, model.py:1001): with k == s the transposed
    conv has NO overlapping taps — it is exactly a 1x1 conv to 4x
    channels followed by depth-to-space:
        y[2m+p, 2n+q] = x[m, n] @ W[1-p, 1-q]
    (kernel order reversed by lax.conv_transpose's SAME pad=(1,1) at
    k=2, s=2). The lhs-dilated lowering XLA otherwise uses multiplies 4x
    mostly-zeros. Param tree matches nn.ConvTranspose; exactness:
    tests/test_phase_deconv.py. Serving-only (Config.PHASE_DECONV_MASK)
    — measured NEGATIVE at the flagship shapes (the [N,14,14,2,2,C]
    interleave relayout outweighs the saving at N=100 ROIs), so default
    off; kept as a capability for large-N serving shapes."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel[::-1, ::-1]                       # index [p,q] = W[1-p,1-q]
        k = k.transpose(2, 0, 1, 3).reshape(cin, 4 * self.features)
        y = x.astype(self.dtype) @ k.astype(self.dtype)
        y = y.reshape(b, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w,
                                                  self.features)
        return y + bias.astype(self.dtype)


class MaskHead(nn.Module):
    num_classes: int
    conv_filters: int = 256
    train_bn: bool = False
    dtype: Any = jnp.float32
    fold_bn: bool = False
    phase_deconv: bool = False   # Config.PHASE_DECONV_MASK (separate,
    # default-off knob: measured negative on v5e, unlike the U-Net's
    # PHASE_DECONV — see config.py and BENCH_NOTES round 4)

    @nn.compact
    def __call__(self, pooled):
        """pooled: [B, N, S, S, C] -> masks [B, N, 2S, 2S, NC] (sigmoid)."""
        b, n, s, _, c = pooled.shape
        x = pooled.reshape(b * n, s, s, c)
        for i in range(1, 5):
            x = nn.Conv(self.conv_filters, (3, 3), padding="SAME",
                        name=f"mrcnn_mask_conv{i}", dtype=self.dtype)(x)
            x = BatchNorm(self.train_bn, self.dtype, self.fold_bn,
                          name=f"mrcnn_mask_bn{i}")(x)
            x = nn.relu(x)
        Deconv = (_PhaseDeconv2x2 if self.phase_deconv else
                  functools.partial(nn.ConvTranspose, kernel_size=(2, 2),
                                    strides=(2, 2)))
        x = Deconv(self.conv_filters, name="mrcnn_mask_deconv",
                   dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_classes, (1, 1), name="mrcnn_mask",
                    dtype=self.dtype)(x)
        x = nn.sigmoid(x.astype(jnp.float32))
        return x.reshape(b, n, 2 * s, 2 * s, self.num_classes)
