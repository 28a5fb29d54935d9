"""Feature Pyramid Network neck (Flax linen).

Topology matches the reference: 1x1 lateral convs + nearest x2 top-down
upsampling + 3x3 output convs + P6 = stride-2 maxpool of P5
(model.py:1906-1929 inline in build; model_multi.py:609-641
`build_resnet_fpn`). The multi-view variant appends a ReLU after every
P-conv (model_multi.py:630-640) which the single-view graph lacks —
controlled by `post_relu`.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def upsample2x(x):
    """Nearest-neighbor x2 (KL.UpSampling2D equivalent)."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class FPN(nn.Module):
    out_channels: int = 256
    post_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5):
        k = self.out_channels
        p5 = nn.Conv(k, (1, 1), name="fpn_c5p5", dtype=self.dtype)(c5)
        p4 = (upsample2x(p5)
              + nn.Conv(k, (1, 1), name="fpn_c4p4", dtype=self.dtype)(c4))
        p3 = (upsample2x(p4)
              + nn.Conv(k, (1, 1), name="fpn_c3p3", dtype=self.dtype)(c3))
        p2 = (upsample2x(p3)
              + nn.Conv(k, (1, 1), name="fpn_c2p2", dtype=self.dtype)(c2))

        p2 = nn.Conv(k, (3, 3), padding="SAME", name="fpn_p2",
                     dtype=self.dtype)(p2)
        p3 = nn.Conv(k, (3, 3), padding="SAME", name="fpn_p3",
                     dtype=self.dtype)(p3)
        p4 = nn.Conv(k, (3, 3), padding="SAME", name="fpn_p4",
                     dtype=self.dtype)(p4)
        p5 = nn.Conv(k, (3, 3), padding="SAME", name="fpn_p5",
                     dtype=self.dtype)(p5)
        if self.post_relu:
            p2, p3, p4, p5 = map(nn.relu, (p2, p3, p4, p5))
        # P6 for RPN anchors only (model.py:1927-1929)
        p6 = nn.max_pool(p5, (1, 1), strides=(2, 2), padding="VALID")
        return [p2, p3, p4, p5, p6]
