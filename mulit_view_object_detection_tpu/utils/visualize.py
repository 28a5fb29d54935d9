"""Visualization — matplotlib/PIL rendering of detections and masks.

API parity with mrcnn/visualize.py: display_instances (:80-150),
draw_rois (:154), draw_box (:216), display_top_masks (:286),
plot_precision_recall (:309), plot_overlaps (:323), draw_boxes (:362),
display_table/display_weight_stats (:464/478), headless save_image
(:506-595).
"""

from __future__ import annotations

import colorsys
import os
import random

import numpy as np


def random_colors(n, bright=True):
    brightness = 1.0 if bright else 0.7
    hsv = [(i / n, 1, brightness) for i in range(n)]
    colors = list(map(lambda c: colorsys.hsv_to_rgb(*c), hsv))
    random.shuffle(colors)
    return colors


def fixed_colors(n, bright=True, seed=0):
    rnd = random.Random(seed)
    brightness = 1.0 if bright else 0.7
    hsv = [(i / n, 1, brightness) for i in range(n)]
    colors = list(map(lambda c: colorsys.hsv_to_rgb(*c), hsv))
    rnd.shuffle(colors)
    return colors


def apply_mask(image, mask, color, alpha=0.5):
    """Blend a binary mask into an image (visualize.py:64-75)."""
    for c in range(3):
        image[:, :, c] = np.where(
            mask == 1,
            image[:, :, c] * (1 - alpha) + alpha * color[c] * 255,
            image[:, :, c])
    return image


def display_instances(image, boxes, masks, class_ids, class_names,
                      scores=None, title="", figsize=(16, 16), ax=None,
                      show_mask=True, show_bbox=True, colors=None,
                      captions=None):
    """Draw detections on an image (visualize.py:80-150). Returns the
    matplotlib axis."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    n = boxes.shape[0]
    if not n:
        print("\n*** No instances to display *** \n")
    else:
        assert boxes.shape[0] == masks.shape[-1] == class_ids.shape[0]

    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots(1, figsize=figsize)

    colors = colors or random_colors(max(n, 1))
    height, width = image.shape[:2]
    ax.set_ylim(height + 10, -10)
    ax.set_xlim(-10, width + 10)
    ax.axis("off")
    ax.set_title(title)

    masked_image = image.astype(np.uint32).copy()
    for i in range(n):
        color = colors[i % len(colors)]
        if not np.any(boxes[i]):
            continue
        y1, x1, y2, x2 = boxes[i]
        if show_bbox:
            p = patches.Rectangle((x1, y1), x2 - x1, y2 - y1, linewidth=2,
                                  alpha=0.7, linestyle="dashed",
                                  edgecolor=color, facecolor="none")
            ax.add_patch(p)
        if captions is None:
            class_id = class_ids[i]
            score = scores[i] if scores is not None else None
            label = class_names[class_id]
            caption = "{} {:.3f}".format(label, score) if score else label
        else:
            caption = captions[i]
        ax.text(x1, y1 + 8, caption, color="w", size=11,
                backgroundcolor="none")
        if show_mask:
            mask = masks[:, :, i]
            masked_image = apply_mask(masked_image, mask, color)
    ax.imshow(masked_image.astype(np.uint8))
    return ax


def draw_box(image, box, color):
    """2px solid box drawn in-place (visualize.py:216-228)."""
    y1, x1, y2, x2 = box
    image[y1:y1 + 2, x1:x2] = color
    image[y2:y2 + 2, x1:x2] = color
    image[y1:y2, x1:x1 + 2] = color
    image[y1:y2, x2:x2 + 2] = color
    return image


def save_image(image, image_name, boxes, masks, class_ids, scores,
               class_names, filter_classs_names=None, scores_thresh=0.1,
               save_dir=None, mode=0):
    """Headless rendering to <save_dir>/<image_name>.jpg
    (visualize.py:506-595). mode: 0 box+mask+label, 1 box+label,
    2 box only, 3 mask only."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    mode_list = [0, 1, 2, 3]
    assert mode in mode_list
    save_dir = save_dir or os.getcwd()
    os.makedirs(save_dir, exist_ok=True)

    useful_mask_indices = []
    n = boxes.shape[0]
    for i in range(n):
        if not np.any(boxes[i]):
            continue
        class_id = class_ids[i]
        label = class_names[class_id]
        if filter_classs_names and label not in filter_classs_names:
            continue
        if scores is not None and scores[i] < scores_thresh:
            continue
        useful_mask_indices.append(i)

    colors = fixed_colors(max(len(useful_mask_indices), 1))
    masked_image = image.astype(np.uint8).copy()
    if mode != 2:
        for idx, i in enumerate(useful_mask_indices):
            masked_image = apply_mask(masked_image.astype(np.uint32),
                                      masks[:, :, i],
                                      colors[idx]).astype(np.uint8)

    fig, ax = plt.subplots(1, figsize=(8, 8))
    ax.axis("off")
    ax.imshow(masked_image)
    if mode != 3:
        for idx, i in enumerate(useful_mask_indices):
            y1, x1, y2, x2 = boxes[i]
            p = patches.Rectangle((x1, y1), x2 - x1, y2 - y1, linewidth=2,
                                  edgecolor=colors[idx], facecolor="none")
            ax.add_patch(p)
            if mode != 2:
                label = class_names[class_ids[i]]
                caption = ("{} {:.3f}".format(label, scores[i])
                           if scores is not None else label)
                ax.text(x1, y1 + 8, caption, color="w", size=11)
    path = os.path.join(save_dir, f"{image_name}.jpg")
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def draw_boxes(image, boxes=None, refined_boxes=None, masks=None,
               captions=None, visibilities=None, title="", ax=None):
    """Draw many box styles for debugging (visualize.py:362-460)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    n = 0
    if boxes is not None:
        n = max(n, boxes.shape[0])
    if refined_boxes is not None:
        n = max(n, refined_boxes.shape[0])
    if ax is None:
        _, ax = plt.subplots(1, figsize=(12, 12))
    colors = random_colors(max(n, 1))
    margin = image.shape[0] // 10
    ax.set_ylim(image.shape[0] + margin, -margin)
    ax.set_xlim(-margin, image.shape[1] + margin)
    ax.axis("off")
    ax.set_title(title)

    masked_image = image.astype(np.uint32).copy()
    for i in range(n):
        visibility = visibilities[i] if visibilities is not None else 1
        if visibility == 0:
            color, style, alpha = "gray", "dotted", 0.5
        elif visibility == 1:
            color, style, alpha = colors[i], "dotted", 1
        else:
            color, style, alpha = colors[i], "solid", 1
        if boxes is not None and np.any(boxes[i]):
            y1, x1, y2, x2 = boxes[i]
            p = patches.Rectangle((x1, y1), x2 - x1, y2 - y1, linewidth=2,
                                  alpha=alpha, linestyle=style,
                                  edgecolor=color, facecolor="none")
            ax.add_patch(p)
        if refined_boxes is not None and visibility > 0:
            ry1, rx1, ry2, rx2 = refined_boxes[i].astype(np.int32)
            p = patches.Rectangle((rx1, ry1), rx2 - rx1, ry2 - ry1,
                                  linewidth=2, edgecolor=color,
                                  facecolor="none")
            ax.add_patch(p)
        if captions is not None and i < len(captions):
            x = boxes[i][1] if boxes is not None else 10
            y = boxes[i][0] if boxes is not None else 10
            ax.text(x, y, captions[i], size=11, color="w",
                    backgroundcolor="none")
        if masks is not None and i < masks.shape[-1]:
            masked_image = apply_mask(masked_image, masks[:, :, i],
                                      colors[i])
    ax.imshow(masked_image.astype(np.uint8))
    return ax


def plot_precision_recall(AP, precisions, recalls):
    """PR curve (visualize.py:309-320)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    _, ax = plt.subplots(1)
    ax.set_title("Precision-Recall Curve. AP@50 = {:.3f}".format(AP))
    ax.set_ylim(0, 1.1)
    ax.set_xlim(0, 1.1)
    ax.plot(recalls, precisions)
    return ax


def display_table(table):
    """Plain-text table (visualize.py:464-475 minus IPython)."""
    for row in table:
        print(" | ".join(str(c) for c in row))


def display_weight_stats(params):
    """Weight statistics table over a flax param tree
    (visualize.py:478-504)."""
    import jax
    table = [["WEIGHT NAME", "SHAPE", "MIN", "MAX", "STD"]]
    for path, w in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        w = np.asarray(w)
        table.append([name, str(w.shape), f"{w.min():+10.4f}",
                      f"{w.max():+10.4f}", f"{w.std():+9.4f}"])
    display_table(table)
    return table
