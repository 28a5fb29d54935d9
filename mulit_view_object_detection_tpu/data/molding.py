"""Host-side image/mask molding (numpy + OpenCV).

Re-implements the reference's molding pipeline (mrcnn/utils.py:647-835) with
identical window/scale/padding arithmetic — these feed coordinates into the
device graphs, so they must match bit-for-bit. Pixel resampling uses cv2
bilinear instead of skimage (not in this image); the coordinate bookkeeping
is what parity depends on.

  resize_image   utils.py:647-751 (modes none/square/pad64/crop)
  resize_mask    utils.py:754-773
  minimize_mask  utils.py:776-793  (mini-mask codec)
  expand_mask    utils.py:796-811
  unmold_mask    utils.py:819-835
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage


def resize(image, output_shape, order=1, preserve_range=True,
           anti_aliasing=False):
    """skimage.transform.resize-compatible wrapper (utils.py:1146-1167) on
    cv2; order=1 bilinear, order=0 nearest."""
    import cv2
    h, w = output_shape[:2]
    interp = cv2.INTER_NEAREST if order == 0 else cv2.INTER_LINEAR
    img = np.asarray(image)
    out = cv2.resize(img.astype(np.float32), (int(w), int(h)),
                     interpolation=interp)
    if img.ndim == 3 and out.ndim == 2:
        out = out[:, :, None]
    if preserve_range:
        return out
    return out / 255.0


def resize_image(image, min_dim=None, max_dim=None, min_scale=None,
                 mode="square"):
    """Returns (image, window, scale, padding, crop); see utils.py:647-751."""
    image_dtype = image.dtype
    h, w = image.shape[:2]
    window = (0, 0, h, w)
    scale = 1
    padding = [(0, 0), (0, 0), (0, 0)]
    crop = None

    if mode == "none":
        return image, window, scale, padding, crop

    if min_dim:
        scale = max(1, min_dim / min(h, w))
    if min_scale and scale < min_scale:
        scale = min_scale

    if max_dim and mode == "square":
        image_max = max(h, w)
        if round(image_max * scale) > max_dim:
            scale = max_dim / image_max

    if scale != 1:
        image = resize(image, (round(h * scale), round(w * scale)),
                       preserve_range=True)

    if mode == "square":
        h, w = image.shape[:2]
        top_pad = (max_dim - h) // 2
        bottom_pad = max_dim - h - top_pad
        left_pad = (max_dim - w) // 2
        right_pad = max_dim - w - left_pad
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding, mode="constant", constant_values=0)
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "pad64":
        h, w = image.shape[:2]
        assert min_dim % 64 == 0, "Minimum dimension must be a multiple of 64"
        if h % 64 > 0:
            max_h = h - (h % 64) + 64
            top_pad = (max_h - h) // 2
            bottom_pad = max_h - h - top_pad
        else:
            top_pad = bottom_pad = 0
        if w % 64 > 0:
            max_w = w - (w % 64) + 64
            left_pad = (max_w - w) // 2
            right_pad = max_w - w - left_pad
        else:
            left_pad = right_pad = 0
        padding = [(top_pad, bottom_pad), (left_pad, right_pad), (0, 0)]
        image = np.pad(image, padding, mode="constant", constant_values=0)
        window = (top_pad, left_pad, h + top_pad, w + left_pad)
    elif mode == "crop":
        h, w = image.shape[:2]
        y = np.random.randint(0, (h - min_dim)) if h > min_dim else 0
        x = np.random.randint(0, (w - min_dim)) if w > min_dim else 0
        crop = (y, x, min_dim, min_dim)
        image = image[y:y + min_dim, x:x + min_dim]
        window = (0, 0, min_dim, min_dim)
    else:
        raise Exception("Mode {} not supported".format(mode))
    return image.astype(image_dtype), window, scale, padding, crop


def resize_mask(mask, scale, padding, crop=None):
    """Nearest-neighbor mask resize matching resize_image (utils.py:754-773)."""
    mask = scipy.ndimage.zoom(mask, zoom=[scale, scale, 1], order=0)
    if crop is not None:
        y, x, h, w = crop
        mask = mask[y:y + h, x:x + w]
    else:
        mask = np.pad(mask, padding, mode="constant", constant_values=0)
    return mask


def minimize_mask(bbox, mask, mini_shape):
    """Crop each instance mask to its bbox and resize to mini_shape
    (utils.py:776-793). mask: [H, W, N] bool."""
    mini_mask = np.zeros(tuple(mini_shape) + (mask.shape[-1],), dtype=bool)
    for i in range(mask.shape[-1]):
        m = mask[:, :, i].astype(bool)
        y1, x1, y2, x2 = bbox[i][:4]
        m = m[y1:y2, x1:x2]
        if m.size == 0:
            raise Exception("Invalid bounding box with area of zero")
        m = resize(m.astype(np.float32), mini_shape, order=1)
        mini_mask[:, :, i] = np.around(m).astype(bool)
    return mini_mask


def expand_mask(bbox, mini_mask, image_shape):
    """Inverse of minimize_mask (utils.py:796-811)."""
    mask = np.zeros(image_shape[:2] + (mini_mask.shape[-1],), dtype=bool)
    for i in range(mask.shape[-1]):
        m = mini_mask[:, :, i].astype(np.float32)
        y1, x1, y2, x2 = bbox[i][:4]
        h = y2 - y1
        w = x2 - x1
        m = resize(m, (h, w), order=1)
        mask[y1:y2, x1:x2, i] = np.around(m).astype(bool)
    return mask


def unmold_mask(mask, bbox, image_shape):
    """Resize a predicted MASK_SHAPE mask into a full-image binary mask
    (utils.py:819-835)."""
    threshold = 0.5
    y1, x1, y2, x2 = bbox
    mask = resize(mask, (y2 - y1, x2 - x1), order=1)
    mask = np.where(mask >= threshold, 1, 0).astype(bool)
    full_mask = np.zeros(image_shape[:2], dtype=bool)
    full_mask[y1:y2, x1:x2] = mask
    return full_mask


def mold_image(images, mean_pixel):
    """Subtract mean pixel, cast float32 (model.py:2719-2724)."""
    return images.astype(np.float32) - np.asarray(mean_pixel)


def unmold_image(normalized_images, mean_pixel):
    return (normalized_images + np.asarray(mean_pixel)).astype(np.uint8)
