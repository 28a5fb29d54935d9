"""ROI Align for XLA/TPU: crop-and-resize and pyramid ROI align.

The reference uses the C++/CUDA kernel `tf.image.crop_and_resize`
(model.py:421-423 classifier/mask heads, model.py:598-600 mask targets) and
a dynamic-shape per-level dispatch (`tf.where` + gather + re-sort,
model.py:344-450 `PyramidROIAlign`). Neither survives XLA's static-shape
model, so the TPU-native design is:

  * Exact `tf.image.crop_and_resize` bilinear semantics re-derived: for crop
    size S>1 sample point i sits at the convex combination
    (y1*(1 - i/(S-1)) + y2*(i/(S-1))) * (H-1) — mathematically TF's
    y1*(H-1) + i*(y2-y1)*(H-1)/(S-1), but with EXACT endpoints so no
    fusion can push a boundary tap past the validity bound (see
    _sample_coords); for S==1 the single point is the box center; samples
    outside [0, H-1]x[0, W-1] return `extrapolation_value` (0).
  * The per-box FPN level dispatch (model.py:389-393) becomes index
    arithmetic into ONE flattened pyramid buffer [B, sum(H_l*W_l), C]: each
    box computes its level, its level's (H, W, offset) and gathers its 4
    bilinear taps from the flat buffer. No dynamic shapes, no re-sorting —
    output order is input order by construction.

Profiling (tools/trace_analysis.py, BENCH_NOTES.md) shows the XLA gathers
here are cold relative to the geometry kernels, so this XLA formulation is
the production path — no Pallas variant is warranted.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _sample_coords(lo, hi, extent_minus_1, size):
    """Sample coordinates along one axis per tf.image.crop_and_resize.

    lo, hi: [...] normalized box edges. extent_minus_1: [...] (H-1 or W-1).
    Returns [..., size] absolute (pixel) sample coordinates.

    Computed as a convex combination with EXACT endpoints (t is exactly
    0/1 at the first/last sample, and multiplies by exact 0/1 are exact
    under any fusion): the accumulation form `lo*e + i*step` can land
    1 ulp ABOVE (hi * e) once XLA fuses it into an FMA, and for a box
    edge at exactly 1.0 that pushed the boundary tap past the
    `<= extent-1` validity bound — the whole tap column was then zeroed
    where TF keeps it in-bounds (caught by the multi-view full-graph
    golden: a full-width detection's mask lost its right edge)."""
    steps = jnp.arange(size, dtype=jnp.float32)
    if size > 1:
        t = steps / (size - 1)
        return ((lo[..., None] * (1.0 - t) + hi[..., None] * t)
                * extent_minus_1[..., None])
    return (0.5 * (lo + hi) * extent_minus_1)[..., None] + 0.0 * steps


def crop_and_resize_pairs(images, boxes, size, extrapolation_value=0.0):
    """Bilinear crop of images[i] by boxes[i] (1:1 pairing).

    images: [N, H, W, C] float. boxes: [N, 4] normalized (y1, x1, y2, x2).
    size: (Sh, Sw). Returns [N, Sh, Sw, C].

    Matches tf.image.crop_and_resize(images, boxes, range(N), size)
    (used for mask targets, model.py:598-600).
    """
    n, h, w, c = images.shape
    sh, sw = size
    hm1 = jnp.full((n,), h - 1, dtype=jnp.float32)
    wm1 = jnp.full((n,), w - 1, dtype=jnp.float32)
    ys = _sample_coords(boxes[:, 0], boxes[:, 2], hm1, sh)  # [N, Sh]
    xs = _sample_coords(boxes[:, 1], boxes[:, 3], wm1, sw)  # [N, Sw]

    y_valid = (ys >= 0) & (ys <= h - 1)        # [N, Sh]
    x_valid = (xs >= 0) & (xs <= w - 1)        # [N, Sw]

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0 = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)

    flat = images.reshape(n, h * w, c)
    bidx = jnp.arange(n)[:, None, None]

    def gather(yi, xi):
        # yi: [N, Sh], xi: [N, Sw] -> [N, Sh, Sw, C]
        idx = yi[:, :, None] * w + xi[:, None, :]
        return flat[bidx, idx]

    ly = ly[:, :, None, None]
    lx = lx[:, None, :, None]
    out = (gather(y0, x0) * (1 - ly) * (1 - lx)
           + gather(y0, x1) * (1 - ly) * lx
           + gather(y1, x0) * ly * (1 - lx)
           + gather(y1, x1) * ly * lx)

    valid = (y_valid[:, :, None] & x_valid[:, None, :])[..., None]
    return jnp.where(valid, out, extrapolation_value).astype(images.dtype)


def roi_levels(boxes, image_shape, num_levels=4):
    """FPN level per box, 0-based over [P2..P5] (model.py:389-393).

    boxes: [..., 4] normalized. image_shape: (H, W) pixels.
    """
    h = boxes[..., 2] - boxes[..., 0]
    w = boxes[..., 3] - boxes[..., 1]
    image_area = float(image_shape[0] * image_shape[1])
    # log2(sqrt(h*w) / (224 / sqrt(image_area)))
    sqrt_hw = jnp.sqrt(jnp.maximum(h * w, 1e-12))
    lvl = jnp.log2(sqrt_hw / (224.0 / np.sqrt(image_area)))
    lvl = jnp.clip(jnp.round(lvl).astype(jnp.int32) + 4, 2, 2 + num_levels - 1)
    return lvl - 2


def pyramid_roi_align(boxes, feature_maps, image_shape, pool_size):
    """Multi-level ROI align with static shapes.

    boxes: [B, N, 4] normalized, zero-padded allowed (padded boxes produce
      garbage features that downstream masks ignore, matching the reference's
      convention of computing heads on padded ROIs).
    feature_maps: list of [B, H_l, W_l, C] for P2..P5 (finest first).
    image_shape: (H, W) of the molded input image.
    pool_size: S (square output).

    Returns [B, N, S, S, C] in the order of `boxes`.
    """
    b, n, _ = boxes.shape
    c = feature_maps[0].shape[-1]
    num_levels = len(feature_maps)

    heights = np.array([fm.shape[1] for fm in feature_maps], dtype=np.int32)
    widths = np.array([fm.shape[2] for fm in feature_maps], dtype=np.int32)
    sizes = heights * widths
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)

    flat = jnp.concatenate(
        [fm.reshape(b, -1, c) for fm in feature_maps], axis=1)  # [B, T, C]

    lvl = roi_levels(boxes, image_shape, num_levels)  # [B, N]
    h_b = jnp.asarray(heights)[lvl].astype(jnp.float32)
    w_b = jnp.asarray(widths)[lvl].astype(jnp.float32)
    off_b = jnp.asarray(offsets)[lvl]
    w_int = jnp.asarray(widths)[lvl]

    s = pool_size
    ys = _sample_coords(boxes[..., 0], boxes[..., 2], h_b - 1, s)  # [B, N, S]
    xs = _sample_coords(boxes[..., 1], boxes[..., 3], w_b - 1, s)  # [B, N, S]

    y_valid = (ys >= 0) & (ys <= h_b[..., None] - 1)
    x_valid = (xs >= 0) & (xs <= w_b[..., None] - 1)

    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    ly = ys - y0f
    lx = xs - x0f
    y0 = jnp.clip(y0f, 0, h_b[..., None] - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, (h_b[..., None] - 1).astype(jnp.int32))
    x0 = jnp.clip(x0f, 0, w_b[..., None] - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, (w_b[..., None] - 1).astype(jnp.int32))

    bidx = jnp.arange(b)[:, None, None, None]

    def gather(yi, xi):
        # yi, xi: [B, N, S] -> [B, N, S, S, C]
        idx = (off_b[..., None, None] + yi[..., :, None] * w_int[..., None, None]
               + xi[..., None, :])  # [B, N, S, S]
        return flat[bidx, idx]

    lyb = ly[..., :, None, None]
    lxb = lx[..., None, :, None]
    out = (gather(y0, x0) * (1 - lyb) * (1 - lxb)
           + gather(y0, x1) * (1 - lyb) * lxb
           + gather(y1, x0) * lyb * (1 - lxb)
           + gather(y1, x1) * lyb * lxb)

    valid = (y_valid[..., :, None] & x_valid[..., None, :])[..., None]
    return jnp.where(valid, out, 0.0).astype(feature_maps[0].dtype)
