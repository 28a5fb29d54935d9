"""Transformer view-fusion InteriorNet CLI: train / evaluate / visualize.

Mirrors samples/interior/interior_transformer.py — TrainConfig at :378-407
(TOP_DOWN_PYRAMID_SIZE=72=d_model, nvox=60, vmin/vmax=+-5, GRID_DIST=6,
samples=1, NUM_VIEWS=2, GRID_REAS='ident', TRANSFORMER=True), depth-
conditioned detect(..., depths) at :572, eval on the 'test' subset (:530).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..compat import MaskRCNN
from ..data.classes import SELECTED_CLASSES
from ..data.molding import resize_image
from .interior_multi import (InteriorNetConfig, _eval_views,
                             _load_model_weights, load_dataset)


class TransformerConfig(InteriorNetConfig):
    """interior_transformer.py:378-407."""
    NAME = "interior_transformer"
    TOP_DOWN_PYRAMID_SIZE = 72          # == transformer d_model
    nvox = 60
    vmin, vmax = -5.0, 5.0
    GRID_DIST = 6.0
    samples = 1
    NUM_VIEWS = 2
    GRID_REAS = "ident"
    TRANSFORMER = True
    XFORMER_D_MODEL = 72


class TransformerInferenceConfig(TransformerConfig):
    GPU_COUNT = 1
    IMAGES_PER_GPU = 1


def _detect_with_depth(model, dataset, config, view_ids):
    views, R = [], np.zeros((1, config.NUM_VIEWS, 3, 4), np.float32)
    ds = int(config.IMAGE_SHAPE[0]) // config.BACKBONE_STRIDES[3]
    depths = np.zeros((1, config.NUM_VIEWS, ds, ds), np.float32)
    for i, vid in enumerate(view_ids):
        im = dataset.load_image(vid)
        im, *_ = resize_image(im, min_dim=config.IMAGE_MIN_DIM,
                              max_dim=config.IMAGE_MAX_DIM,
                              mode=config.IMAGE_RESIZE_MODE)
        views.append(im)
        R[0, i] = dataset.load_R(vid)
        depths[0, i] = dataset.load_depth(vid, config)
    return model.detect([np.stack(views)], Rcam=R,
                        Kmat=dataset.K[None].astype(np.float32),
                        depths=depths)


def cmd_train(args):
    config = TransformerConfig()
    config.display()
    model = MaskRCNN(mode="training", config=config, model_dir=args.logs)
    if args.model:
        _load_model_weights(model, args)
    dataset_train = load_dataset(args.dataset, "train")
    dataset_val = load_dataset(args.dataset, "val")
    model.train(dataset_train, dataset_val,
                learning_rate=config.LEARNING_RATE, epochs=301,
                layers="grid+")
    model.train(dataset_train, dataset_val,
                learning_rate=config.LEARNING_RATE, epochs=4001,
                layers="4+")
    model.train(dataset_train, dataset_val,
                learning_rate=config.LEARNING_RATE / 10, epochs=4501,
                layers="all")


def cmd_evaluate(args):
    config = TransformerInferenceConfig()
    model = MaskRCNN(mode="inference", config=config, model_dir=args.logs)
    _load_model_weights(model, args)
    # transformer variant evaluates on the test subset
    # (interior_transformer.py:530)
    dataset = load_dataset(args.dataset, "test")
    keys = list(dataset.view_map.keys())
    if args.limit:
        keys = keys[:args.limit]
    from ..data.generator import load_image_gt
    from ..eval.metrics import compute_ap
    aps = []
    for key in keys:
        view_ids = dataset.load_view(5, key, rnd_state=0)
        if view_ids is None:
            continue
        view_ids = view_ids[:config.NUM_VIEWS]
        _, _, gt_class_id, gt_bbox, gt_mask = load_image_gt(
            dataset, config, view_ids[0], use_mini_mask=False)
        r = _detect_with_depth(model, dataset, config, view_ids)[0]
        if r["masks"].shape[-1] == 0 or gt_mask.shape[-1] == 0:
            aps.append(0.0)
            continue
        ap, *_ = compute_ap(gt_bbox.astype(np.float32), gt_class_id, gt_mask,
                            r["rois"].astype(np.float32), r["class_ids"],
                            r["scores"], r["masks"], iou_threshold=0.5)
        aps.append(ap)
        print(f"running meanAP = {np.mean(aps):.4f}")
    print(f"mAP@50: {np.mean(aps) if aps else 0.0:.4f}")


def cmd_visualize(args):
    from ..utils import visualize
    config = TransformerInferenceConfig()
    model = MaskRCNN(mode="inference", config=config, model_dir=args.logs)
    _load_model_weights(model, args)
    dataset = load_dataset(args.dataset, "test")
    for key in list(dataset.view_map.keys())[:args.limit or 20]:
        view_ids = dataset.load_view(5, key, rnd_state=0)
        if view_ids is None:
            continue
        view_ids = view_ids[:config.NUM_VIEWS]
        r = _detect_with_depth(model, dataset, config, view_ids)[0]
        im = dataset.load_image(view_ids[0])
        im, *_ = resize_image(im, min_dim=config.IMAGE_MIN_DIM,
                              max_dim=config.IMAGE_MAX_DIM,
                              mode=config.IMAGE_RESIZE_MODE)
        visualize.save_image(im, str(key), r["rois"], r["masks"],
                             r["class_ids"], r["scores"], SELECTED_CLASSES,
                             save_dir="Results/transformer", mode=0)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=["train", "evaluate", "visualize"])
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--coco-weights", default="mask_rcnn_coco.h5")
    parser.add_argument("--logs", default="logs")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)
    {"train": cmd_train, "evaluate": cmd_evaluate,
     "visualize": cmd_visualize}[args.command](args)


if __name__ == "__main__":
    main()
