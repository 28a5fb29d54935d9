"""Region Proposal Network head (Flax linen).

Matches rpn_graph/build_rpn_model (model.py:830-897): one 3x3/512 shared
conv + two 1x1 convs (2k objectness, 4k deltas), the SAME weights applied to
every FPN level (calling one module instance per level shares parameters in
linen, replacing the reference's wrap-in-a-keras-Model trick).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class RPNHead(nn.Module):
    anchors_per_location: int = 3
    anchor_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map):
        """feature_map: [N, H, W, C].

        Returns (logits [N, HWk, 2], probs [N, HWk, 2], deltas [N, HWk, 4]).
        """
        n = feature_map.shape[0]
        shared = nn.Conv(512, (3, 3), strides=self.anchor_stride,
                         padding="SAME", name="rpn_conv_shared",
                         dtype=self.dtype)(feature_map)
        shared = nn.relu(shared)
        x = nn.Conv(2 * self.anchors_per_location, (1, 1),
                    name="rpn_class_raw", dtype=self.dtype)(shared)
        rpn_class_logits = x.reshape(n, -1, 2)
        rpn_probs = nn.softmax(rpn_class_logits.astype(jnp.float32))
        x = nn.Conv(4 * self.anchors_per_location, (1, 1),
                    name="rpn_bbox_pred", dtype=self.dtype)(shared)
        rpn_bbox = x.reshape(n, -1, 4).astype(jnp.float32)
        return rpn_class_logits.astype(jnp.float32), rpn_probs, rpn_bbox
