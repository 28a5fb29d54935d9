"""Anchor pyramid generation (host-side numpy, computed once and cached).

Semantics match mrcnn/utils.py:842-898 (`generate_anchors`,
`generate_pyramid_anchors`) and mrcnn/model_multi.py:89-103
(`compute_backbone_shapes`): one scale per FPN level, all ratios per cell,
boxes in pixel coordinates [y1, x1, y2, x2].
"""

from __future__ import annotations

import math

import numpy as np


def compute_backbone_shapes(config, image_shape):
    """[(h, w)] per backbone stage (model_multi.py:89-103)."""
    if callable(config.BACKBONE):
        return config.COMPUTE_BACKBONE_SHAPE(image_shape)
    assert config.BACKBONE in ("resnet50", "resnet101")
    return np.array([
        [int(math.ceil(image_shape[0] / stride)),
         int(math.ceil(image_shape[1] / stride))]
        for stride in config.BACKBONE_STRIDES
    ])


def generate_anchors(scales, ratios, shape, feature_stride, anchor_stride):
    """All anchors for one feature-map level (utils.py:842-878).

    scales: 1D anchor sizes in pixels (usually a single scale per level).
    ratios: anchor h/w ratios.
    shape: (height, width) of the feature map.
    """
    scales, ratios = np.meshgrid(np.array(scales), np.array(ratios))
    scales = scales.flatten()
    ratios = ratios.flatten()

    heights = scales / np.sqrt(ratios)
    widths = scales * np.sqrt(ratios)

    shifts_y = np.arange(0, shape[0], anchor_stride) * feature_stride
    shifts_x = np.arange(0, shape[1], anchor_stride) * feature_stride
    shifts_x, shifts_y = np.meshgrid(shifts_x, shifts_y)

    box_widths, box_centers_x = np.meshgrid(widths, shifts_x)
    box_heights, box_centers_y = np.meshgrid(heights, shifts_y)

    box_centers = np.stack([box_centers_y, box_centers_x], axis=2).reshape([-1, 2])
    box_sizes = np.stack([box_heights, box_widths], axis=2).reshape([-1, 2])

    boxes = np.concatenate(
        [box_centers - 0.5 * box_sizes, box_centers + 0.5 * box_sizes], axis=1)
    return boxes


def generate_pyramid_anchors(scales, ratios, feature_shapes, feature_strides,
                             anchor_stride):
    """Anchors over all pyramid levels, concatenated in level order
    (utils.py:881-898). Returns [anchor_count, (y1, x1, y2, x2)]."""
    anchors = []
    for i in range(len(scales)):
        anchors.append(generate_anchors(scales[i], ratios, feature_shapes[i],
                                        feature_strides[i], anchor_stride))
    return np.concatenate(anchors, axis=0)


_ANCHOR_CACHE = {}


def get_anchors(config, image_shape):
    """Normalized anchor pyramid for an image shape, cached
    (model.py:2610-2630 `get_anchors`)."""
    # key on every input that shapes the pyramid — two configs sharing a
    # class/NAME but differing in ratios/strides must not share anchors
    key = (config.NAME, tuple(image_shape),
           tuple(config.RPN_ANCHOR_SCALES),
           tuple(config.RPN_ANCHOR_RATIOS),
           tuple(config.BACKBONE_STRIDES),
           int(config.RPN_ANCHOR_STRIDE),
           str(config.BACKBONE))
    if key not in _ANCHOR_CACHE:
        backbone_shapes = compute_backbone_shapes(config, image_shape)
        a = generate_pyramid_anchors(
            config.RPN_ANCHOR_SCALES,
            config.RPN_ANCHOR_RATIOS,
            backbone_shapes,
            config.BACKBONE_STRIDES,
            config.RPN_ANCHOR_STRIDE)
        # normalize with the (h-1, w-1) convention (utils.py:1112-1126)
        h, w = image_shape[:2]
        scale = np.array([h - 1, w - 1, h - 1, w - 1])
        shift = np.array([0, 0, 1, 1])
        _ANCHOR_CACHE[key] = ((a - shift) / scale).astype(np.float32)
    return _ANCHOR_CACHE[key]
