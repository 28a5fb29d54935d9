"""Single-view InteriorNet CLI: train / evaluate.

Mirrors samples/interior/interior.py (which, as shipped, is broken — it
imports the missing mrcnn.model50; semantics per SURVEY.md equal
mrcnn/model.py with a resnet50 backbone). Stages: heads -> 23 epochs,
4+ -> 23, all -> 35 with LR/10 (interior.py:326-352).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..compat import MaskRCNN
from ..config import Config
from ..data.classes import SELECTED_CLASSES
from .interior_multi import _load_model_weights, load_dataset


class SingleViewConfig(Config):
    NAME = "interior_sv"
    NUM_CLASSES = len(SELECTED_CLASSES)
    IMAGES_PER_GPU = 1
    STEPS_PER_EPOCH = 1000
    IMAGE_MIN_DIM = 640
    IMAGE_MAX_DIM = 640
    BACKBONE = "resnet50"
    NUM_VIEWS = 1
    COMPUTE_DTYPE = "bfloat16"


class SingleViewInferenceConfig(SingleViewConfig):
    GPU_COUNT = 1
    IMAGES_PER_GPU = 1
    DETECTION_MIN_CONFIDENCE = 0.7


def cmd_train(args):
    config = SingleViewConfig()
    model = MaskRCNN(mode="training", config=config, model_dir=args.logs)
    if args.model:
        _load_model_weights(model, args)
    dataset_train = load_dataset(args.dataset, "train")
    dataset_val = load_dataset(args.dataset, "val")
    # Faithful quirk: `epochs` is a CUMULATIVE target (Keras
    # initial_epoch semantics), and the reference passes 23 for BOTH
    # stage 1 and stage 2 (interior.py:339-346) — so its '4+' stage
    # trains ZERO epochs and 'all' runs epochs 24-35. Reproduced as-is;
    # pass cumulative targets (e.g. 23/46/81) to actually run stage 2.
    model.train(dataset_train, dataset_val, config.LEARNING_RATE, 23,
                layers="heads")
    model.train(dataset_train, dataset_val, config.LEARNING_RATE, 23,
                layers="4+")
    model.train(dataset_train, dataset_val, config.LEARNING_RATE / 10, 35,
                layers="all")


def cmd_evaluate(args):
    from ..data.generator import load_image_gt
    from ..eval.metrics import compute_ap

    config = SingleViewInferenceConfig()
    model = MaskRCNN(mode="inference", config=config, model_dir=args.logs)
    _load_model_weights(model, args)
    dataset = load_dataset(args.dataset, "val")
    ids = dataset.image_ids[:args.limit or len(dataset.image_ids)]
    aps = []
    for image_id in ids:
        image, _, gt_class_id, gt_bbox, gt_mask = load_image_gt(
            dataset, config, image_id, use_mini_mask=False)
        r = model.detect([image])[0]
        if r["masks"].shape[-1] == 0 or gt_mask.shape[-1] == 0:
            aps.append(0.0)
            continue
        ap, *_ = compute_ap(gt_bbox.astype(np.float32), gt_class_id, gt_mask,
                            r["rois"].astype(np.float32), r["class_ids"],
                            r["scores"], r["masks"], iou_threshold=0.5)
        aps.append(ap)
    print(f"mAP@50: {np.mean(aps) if aps else 0.0:.4f}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=["train", "evaluate"])
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--model", default=None)
    parser.add_argument("--coco-weights", default="mask_rcnn_coco.h5")
    parser.add_argument("--logs", default="logs")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args(argv)
    {"train": cmd_train, "evaluate": cmd_evaluate}[args.command](args)


if __name__ == "__main__":
    main()
