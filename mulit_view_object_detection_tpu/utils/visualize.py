"""Visualization — matplotlib/PIL rendering of detections and masks.

API parity with the reference's visualize module (mrcnn/visualize.py):
display_instances (:80-150), draw_box (:216), plot_precision_recall
(:309), draw_boxes (:362), display_table/display_weight_stats (:464/478),
headless save_image (:506-595). Internals are shared here: one vectorized
mask blender and one instance-drawing core feed both the interactive and
the headless entry points.
"""

from __future__ import annotations

import colorsys
import os
import random

import numpy as np


def _hue_palette(n, brightness):
    """n maximally-separated hues at fixed saturation/value."""
    return [colorsys.hsv_to_rgb(i / n, 1, brightness) for i in range(n)]


def random_colors(n, bright=True):
    colors = _hue_palette(n, 1.0 if bright else 0.7)
    random.shuffle(colors)
    return colors


def fixed_colors(n, bright=True, seed=0):
    """Deterministic variant for reproducible renders."""
    colors = _hue_palette(n, 1.0 if bright else 0.7)
    random.Random(seed).shuffle(colors)
    return colors


def apply_mask(image, mask, color, alpha=0.5):
    """Alpha-blend a binary mask into an image, vectorized over channels."""
    rgb = np.asarray(color, dtype=np.float32) * 255.0
    on = np.asarray(mask)[..., None] == 1
    blended = image * (1 - alpha) + alpha * rgb
    return np.where(on, blended, image).astype(image.dtype)


def _axes(ax, figsize):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    if ax is not None:
        return ax
    return plt.subplots(1, figsize=figsize)[1]


def _box_patch(box, color, linewidth=2, style="solid", alpha=1.0):
    from matplotlib import patches
    y1, x1, y2, x2 = box[:4]
    return patches.Rectangle((x1, y1), x2 - x1, y2 - y1,
                             linewidth=linewidth, alpha=alpha,
                             linestyle=style, edgecolor=color,
                             facecolor="none")


def display_instances(image, boxes, masks, class_ids, class_names,
                      scores=None, title="", figsize=(16, 16), ax=None,
                      show_mask=True, show_bbox=True, colors=None,
                      captions=None):
    """Draw detections on an image; returns the matplotlib axis."""
    n = boxes.shape[0]
    if not n:
        print("\n*** No instances to display *** \n")
    else:
        assert boxes.shape[0] == masks.shape[-1] == class_ids.shape[0]

    ax = _axes(ax, figsize)
    colors = colors or random_colors(max(n, 1))
    height, width = image.shape[:2]
    ax.set_ylim(height + 10, -10)
    ax.set_xlim(-10, width + 10)
    ax.axis("off")
    ax.set_title(title)

    canvas = image.astype(np.uint32).copy()
    for i in range(n):
        if not np.any(boxes[i]):
            continue  # padded slot
        color = colors[i % len(colors)]
        if show_bbox:
            ax.add_patch(_box_patch(boxes[i], color, style="dashed",
                                    alpha=0.7))
        if captions is not None:
            caption = captions[i]
        else:
            label = class_names[class_ids[i]]
            score = scores[i] if scores is not None else None
            caption = f"{label} {score:.3f}" if score else label
        ax.text(boxes[i][1], boxes[i][0] + 8, caption, color="w", size=11,
                backgroundcolor="none")
        if show_mask:
            canvas = apply_mask(canvas, masks[:, :, i], color)
    ax.imshow(canvas.astype(np.uint8))
    return ax


def draw_box(image, box, color):
    """2px solid box drawn in-place on a numpy image."""
    y1, x1, y2, x2 = box
    image[y1:y1 + 2, x1:x2] = color
    image[y2:y2 + 2, x1:x2] = color
    image[y1:y2, x1:x1 + 2] = color
    image[y1:y2, x2:x2 + 2] = color
    return image


def save_image(image, image_name, boxes, masks, class_ids, scores,
               class_names, filter_classs_names=None, scores_thresh=0.1,
               save_dir=None, mode=0):
    """Headless render to <save_dir>/<image_name>.jpg. mode: 0 box+mask+
    label, 1 box+label, 2 box only, 3 mask only. (The misspelled
    `filter_classs_names` kwarg is kept for reference API parity.)"""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    assert mode in (0, 1, 2, 3)
    save_dir = save_dir or os.getcwd()
    os.makedirs(save_dir, exist_ok=True)

    # instance selection: drop padded slots, filtered classes, low scores
    selected = []
    for i in range(boxes.shape[0]):
        if not np.any(boxes[i]):
            continue
        label = class_names[class_ids[i]]
        if filter_classs_names and label not in filter_classs_names:
            continue
        if scores is not None and scores[i] < scores_thresh:
            continue
        selected.append(i)

    colors = fixed_colors(max(len(selected), 1))
    canvas = image.astype(np.uint32).copy()
    if mode != 2:  # modes with masks
        for slot, i in enumerate(selected):
            canvas = apply_mask(canvas, masks[:, :, i], colors[slot])

    fig, ax = plt.subplots(1, figsize=(8, 8))
    ax.axis("off")
    ax.imshow(canvas.astype(np.uint8))
    if mode != 3:  # modes with boxes
        for slot, i in enumerate(selected):
            ax.add_patch(_box_patch(boxes[i], colors[slot]))
            if mode != 2:
                label = class_names[class_ids[i]]
                caption = (f"{label} {scores[i]:.3f}"
                           if scores is not None else label)
                ax.text(boxes[i][1], boxes[i][0] + 8, caption, color="w",
                        size=11)
    path = os.path.join(save_dir, f"{image_name}.jpg")
    fig.savefig(path, bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return path


def draw_boxes(image, boxes=None, refined_boxes=None, masks=None,
               captions=None, visibilities=None, title="", ax=None):
    """Debug renderer: anchors/proposals/refinements in one frame.
    visibility 0 = gray dotted, 1 = color dotted, 2+ = color solid."""
    n = max(boxes.shape[0] if boxes is not None else 0,
            refined_boxes.shape[0] if refined_boxes is not None else 0)
    ax = _axes(ax, (12, 12))
    colors = random_colors(max(n, 1))
    margin = image.shape[0] // 10
    ax.set_ylim(image.shape[0] + margin, -margin)
    ax.set_xlim(-margin, image.shape[1] + margin)
    ax.axis("off")
    ax.set_title(title)

    canvas = image.astype(np.uint32).copy()
    for i in range(n):
        visibility = visibilities[i] if visibilities is not None else 1
        if visibility == 0:
            color, style, alpha = "gray", "dotted", 0.5
        else:
            color = colors[i]
            style = "dotted" if visibility == 1 else "solid"
            alpha = 1
        if boxes is not None and np.any(boxes[i]):
            ax.add_patch(_box_patch(boxes[i], color, style=style,
                                    alpha=alpha))
        if refined_boxes is not None and visibility > 0:
            ax.add_patch(_box_patch(refined_boxes[i].astype(np.int32),
                                    color))
        if captions is not None and i < len(captions):
            x, y = (boxes[i][1], boxes[i][0]) if boxes is not None \
                else (10, 10)
            ax.text(x, y, captions[i], size=11, color="w",
                    backgroundcolor="none")
        if masks is not None and i < masks.shape[-1]:
            canvas = apply_mask(canvas, masks[:, :, i], colors[i])
    ax.imshow(canvas.astype(np.uint8))
    return ax


def plot_precision_recall(AP, precisions, recalls):
    """PR curve for one AP evaluation."""
    ax = _axes(None, None)
    ax.set_title(f"Precision-Recall Curve. AP@50 = {AP:.3f}")
    ax.set_ylim(0, 1.1)
    ax.set_xlim(0, 1.1)
    ax.plot(recalls, precisions)
    return ax


def display_table(table):
    """Plain-text table (the reference renders HTML in IPython)."""
    for row in table:
        print(" | ".join(str(cell) for cell in row))


def display_weight_stats(params):
    """Weight statistics table over a flax param tree."""
    import jax
    table = [["WEIGHT NAME", "SHAPE", "MIN", "MAX", "STD"]]
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(getattr(k, "key", str(k)) for k in path)
        leaf = np.asarray(leaf)
        table.append([name, str(leaf.shape), f"{leaf.min():+10.4f}",
                      f"{leaf.max():+10.4f}", f"{leaf.std():+9.4f}"])
    display_table(table)
    return table
