"""Transformer view-fusion stack (Flax linen).

Re-design of the reference transformer fusion (model_transformer.py:102-364):
multi-view P5 tokens lifted to world coordinates via depth
(ops.projection.unproject_rays), tagged with a 3-axis sinusoidal positional
encoding over world xyz (d_model split three ways), run through an N-layer
post-LN encoder, then projected from the V*S*fh*fw token sequence down to
target_size^2 output tokens by a Dense over the TOKEN axis
(model_transformer.py:327-349) and reshaped to a [T, T] feature map.

Hyperparameters are config-driven (the reference hardcodes
num_layers=6, d_model=72, heads=8, dff=256, target 20x20 at the call site,
model_transformer.py:361).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def positional_encoding_3d(positions, d_model):
    """3-axis sinusoidal PE (model_transformer.py:102-168).

    positions: [B, N, 3] world xyz. Returns [B, N, d_model]. Per axis:
    angle(pos, i) = pos / 10000^(2*(i//2)/npf), emitted interleaved as
    [sin(a_0), cos(a_1), sin(a_2), cos(a_3), ...].
    """
    assert d_model % 3 == 0, "d_model must be divisible by 3"
    npf = d_model // 3
    assert npf % 2 == 0, "d_model/3 must be even"
    i = np.arange(npf)
    rates = (1.0 / np.power(10000.0, (2.0 * (i // 2)) / npf)).astype(
        np.float32)
    parts = []
    for ax in range(3):
        a = positions[..., ax:ax + 1] * rates        # [B, N, npf]
        pe = jnp.stack([jnp.sin(a[..., 0::2]), jnp.cos(a[..., 1::2])],
                       axis=-1)
        parts.append(pe.reshape(a.shape[:-1] + (npf,)))
    return jnp.concatenate(parts, axis=-1)


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dff: int
    rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.d_model,
            out_features=self.d_model, dtype=self.dtype, name="mha")(x, x)
        attn = nn.Dropout(self.rate, deterministic=deterministic)(attn)
        out1 = nn.LayerNorm(epsilon=1e-6, name="ln1")(x + attn)
        ffn = nn.Dense(self.dff, name="ffn1", dtype=self.dtype)(out1)
        ffn = nn.relu(ffn)
        ffn = nn.Dense(self.d_model, name="ffn2", dtype=self.dtype)(ffn)
        ffn = nn.Dropout(self.rate, deterministic=deterministic)(ffn)
        return nn.LayerNorm(epsilon=1e-6, name="ln2")(out1 + ffn)


class ViewFusionTransformer(nn.Module):
    num_layers: int = 6
    d_model: int = 72
    num_heads: int = 8
    dff: int = 256
    target_size: int = 20
    rate: float = 0.1
    dtype: Any = jnp.float32
    # Zero-init the final token projection so the fused residual branch
    # starts at EXACTLY zero (ReZero-style). Rationale: the post-LN
    # encoder pins the token scale to ~1 regardless of weights, so at
    # from-scratch init the fused map drowns the (small, untrained)
    # main-view P5 it is residually added to — the RPN then reads
    # position-scrambled unit-scale noise and never learns to localize
    # (round-4 diagnosis: flat 0.053 objectness everywhere, proposal
    # IoU 0.0, mrcnn_bbox_loss == 0 for 3000 steps). The reference never
    # hits this because it fine-tunes from COCO weights whose P5
    # activations are already strong (interior_transformer.py:447-455);
    # training the faithful P5-only protocol from scratch needs the
    # fused branch to start silent. Default False = faithful init.
    zero_init: bool = False
    # faithful_output: reproduce the reference's output unflattening
    # exactly (model_transformer.py:362-364): the 400-token projection
    # is reshaped to the (fh, fw) grid and then TRANSPOSED, so output
    # pixel (y, x) reads projected token x*T + y. Only the weight-index
    # <-> pixel mapping of the LEARNED token projection changes (the
    # two conventions are equivalent up to a weight permutation), so
    # this matters only for executed-reference parity goldens where
    # weights are name-seeded, not learned. Default False = row-major.
    faithful_output: bool = False

    @nn.compact
    def __call__(self, tokens, positions, deterministic=True):
        """tokens: [B, N, d_model]; positions: [B, N, 3] world xyz.

        Returns fused [B, target_size, target_size, d_model].
        """
        b, n, d = tokens.shape
        assert d == self.d_model
        x = tokens * jnp.sqrt(jnp.asarray(self.d_model, tokens.dtype))
        x = x + positional_encoding_3d(positions, self.d_model)
        x = nn.Dropout(self.rate, deterministic=deterministic)(x)
        for li in range(self.num_layers):
            x = EncoderLayer(self.d_model, self.num_heads, self.dff,
                             self.rate, self.dtype,
                             name=f"layer{li}")(x, deterministic)
        # project the token axis down to target_size^2
        # (model_transformer.py:340-345)
        x = x.transpose(0, 2, 1)                      # [B, d, N]
        x = nn.Dense(self.target_size ** 2, name="token_proj",
                     dtype=self.dtype,
                     kernel_init=(nn.initializers.zeros if self.zero_init
                                  else nn.initializers.lecun_normal()))(x)
        x = x.transpose(0, 2, 1)                      # [B, T^2, d]
        x = x.reshape(b, self.target_size, self.target_size, d)
        if self.faithful_output:
            x = x.swapaxes(1, 2)       # model_transformer.py:362-364
        return x
