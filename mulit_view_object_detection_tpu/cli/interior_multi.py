"""Multi-view InteriorNet CLI: train / evaluate / visualize.

Mirrors samples/interior/interior_multi.py:335-605 — same commands, same
config values (TrainConfig at :370-394, 3-stage schedule at :483-501,
AP@0.5 evaluation protocol at :504-565) — on the TPU-native engine.

Usage:
  python -m mulit_view_object_detection_tpu.cli.interior_multi train \
      --dataset /path/to/InteriorNet/HD7 --model coco --logs ./logs
  python -m mulit_view_object_detection_tpu.cli.interior_multi evaluate \
      --dataset ... --model last
  python -m mulit_view_object_detection_tpu.cli.interior_multi visualize \
      --dataset ... --model last
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..compat import MaskRCNN
from ..config import Config
from ..data.classes import NYU40_TO_SELECTED, SELECTED_CLASSES
from ..data.interiornet import InteriorNetDataset
from ..data.molding import resize_image
from ..eval.metrics import compute_ap
from ..utils import visualize

DEFAULT_LOGS_DIR = "logs"


class InteriorNetConfig(Config):
    """interior_multi.py:61-80 + TrainConfig :370-394."""
    NAME = "interior"
    NUM_CLASSES = len(SELECTED_CLASSES)      # 23 incl. BG
    IMAGES_PER_GPU = 1
    STEPS_PER_EPOCH = 100
    IMAGE_MIN_DIM = 640
    IMAGE_MAX_DIM = 640
    BACKBONE = "resnet50"
    RESNET50_STAGE4_BLOCKS = 5               # fork quirk, model_multi.py:596
    TOP_DOWN_PYRAMID_SIZE = 64
    POST_NMS_ROIS_TRAINING = 500
    PRE_NMS_LIMIT = 1500
    NUM_VIEWS = 2
    GRID_REAS = "conv3d"
    VANILLA = False
    nvox = 40
    nvox_z = 40
    vmin, vmax = -2.5, 2.5
    vmin_z, vmax_z = 1.0, 10.0
    samples = 20
    COMPUTE_DTYPE = "bfloat16"


class InferenceConfig(InteriorNetConfig):
    GPU_COUNT = 1
    IMAGES_PER_GPU = 1
    DETECTION_MIN_CONFIDENCE = 0.7


def load_dataset(dataset_dir, subset):
    ds = InteriorNetDataset()
    ds.load_interiornet(dataset_dir, subset, NYU40_TO_SELECTED,
                        SELECTED_CLASSES)
    ds.prepare()
    return ds


def _apply_overrides(config, spec):
    """Apply 'KEY=VAL,KEY2=VAL2' config overrides (the CLI analog of the
    reference's subclass-and-override pattern; values parse as python
    literals, falling back to strings). Unknown keys are rejected —
    silently accepting a typo would reproduce the reference's ad-hoc-key
    AttributeError trap the config layer exists to fix."""
    if not spec:
        return config
    import ast
    items, depth, cur = [], 0, []
    for ch in spec:
        if ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
            continue
        depth += ch in "([{"
        depth -= ch in ")]}"
        cur.append(ch)
    if cur:
        items.append("".join(cur))
    for item in items:
        key, _, raw = item.partition("=")
        key = key.strip()
        if not hasattr(type(config), key) and not hasattr(config, key):
            raise SystemExit(f"--overrides: unknown config key {key!r}")
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw
        setattr(config, key, val)
    # recompute derived values (BATCH_SIZE, IMAGE_SHAPE, META_SIZE)
    config.__init__()
    return config


def cmd_train(args):
    config = _apply_overrides(InteriorNetConfig(), args.overrides)
    config.display()
    model = MaskRCNN(mode="training", config=config, model_dir=args.logs)
    if args.model:
        _load_model_weights(model, args)

    dataset_train = load_dataset(args.dataset, "train")
    dataset_val = load_dataset(args.dataset, "val")

    # 3-stage schedule (interior_multi.py:483-501); --epochs scales the
    # ABSOLUTE stage targets (e.g. '2,4,10' for a short smoke schedule)
    e1, e2, e3 = (int(x) for x in args.epochs.split(","))
    print("Training grid fusion and heads")
    model.train(dataset_train, dataset_val,
                learning_rate=config.LEARNING_RATE, epochs=e1,
                layers="grid+", save_every_epochs=args.save_every)
    print("Training Resnet stage 4 and up")
    model.train(dataset_train, dataset_val,
                learning_rate=config.LEARNING_RATE, epochs=e2,
                layers="4+", save_every_epochs=args.save_every)
    print("Fine tune all layers")
    model.train(dataset_train, dataset_val,
                learning_rate=config.LEARNING_RATE / 10, epochs=e3,
                layers="all", save_every_epochs=args.save_every)


def _load_model_weights(model, args):
    if args.model.lower() == "last":
        model.load_weights(model.find_last())
    elif args.model.lower() == "coco":
        # COCO h5 import with the reference's head-swap exclude list
        # (interior_multi.py:447, the documented transfer protocol): the
        # 81-class heads, the 256->64-channel FPN convs, and the RPN
        # submodel keep their fresh init. Passing the list explicitly
        # (rather than riding shape-mismatch skips) guarantees no layer
        # is left half-assigned when one weight matches and another
        # doesn't.
        from ..utils.h5_import import load_h5_weights
        state = model._ensure_state()
        exclude = [
            "mrcnn_bbox_fc", "mrcnn_class_logits", "mrcnn_mask",
            "fpn_c5p5", "fpn_c4p4", "fpn_c3p3", "fpn_c2p2",
            "fpn_p5", "fpn_p4", "fpn_p3", "fpn_p2", "rpn_model",
            "mrcnn_mask_conv1", "mrcnn_class_conv1", "mrcnn_mask_bn1",
            "mrcnn_mask_conv2", "mrcnn_mask_bn2", "mrcnn_mask_conv3",
            "mrcnn_mask_bn3", "mrcnn_mask_conv4", "mrcnn_mask_bn4",
            "mrcnn_mask_deconv"]
        params, batch_stats, _ = load_h5_weights(
            args.coco_weights, state.params, state.batch_stats,
            verbose=True, exclude=exclude)
        model._state = state.replace(params=params, batch_stats=batch_stats)
    else:
        model.load_weights(args.model)


def _eval_views(dataset, config, model, keys, num_views, rnd_state=0,
                max_views=5, iou_range=False):
    """Mean AP over view_map entries (interior_multi.py:504-565): AP@0.5
    by default, or COCO-style AP@0.5:0.95 with iou_range=True (the
    reference computed the range too but left it commented out,
    interior_multi.py:551-552)."""
    from ..data.generator import load_image_gt

    aps = []
    for count, key in enumerate(keys):
        view_ids = dataset.load_view(max_views, key, rnd_state=rnd_state)
        if view_ids is None:
            continue
        view_ids = view_ids[:num_views]
        main_id = view_ids[0]
        image, image_meta, gt_class_id, gt_bbox, gt_mask = load_image_gt(
            dataset, config, main_id, use_mini_mask=False)
        views = []
        R = np.zeros((1, num_views, 3, 4), np.float32)
        for i, vid in enumerate(view_ids):
            im = dataset.load_image(vid)
            im, *_ = resize_image(im, min_dim=config.IMAGE_MIN_DIM,
                                  min_scale=config.IMAGE_MIN_SCALE,
                                  max_dim=config.IMAGE_MAX_DIM,
                                  mode=config.IMAGE_RESIZE_MODE)
            views.append(im)
            R[0, i] = dataset.load_R(vid)
        K = dataset.K[None].astype(np.float32)
        results = model.detect([np.stack(views)], Rcam=R, Kmat=K)
        r = results[0]
        if r["masks"].shape[-1] == 0 or gt_mask.shape[-1] == 0:
            aps.append(0.0)
            continue
        if iou_range:
            from ..eval.metrics import compute_ap_range
            ap = compute_ap_range(
                gt_bbox.astype(np.float32), gt_class_id, gt_mask,
                r["rois"].astype(np.float32), r["class_ids"], r["scores"],
                r["masks"], verbose=False)
        else:
            ap, *_ = compute_ap(gt_bbox.astype(np.float32), gt_class_id,
                                gt_mask, r["rois"].astype(np.float32),
                                r["class_ids"], r["scores"], r["masks"],
                                iou_threshold=0.5)
        aps.append(ap)
        print(f"{count}: running meanAP = {np.mean(aps):.4f}")
    return float(np.mean(aps)) if aps else 0.0


def cmd_evaluate(args):
    config = _apply_overrides(InferenceConfig(), args.overrides)
    model = MaskRCNN(mode="inference", config=config, model_dir=args.logs)
    _load_model_weights(model, args)
    dataset_val = load_dataset(args.dataset, "val")
    keys = list(dataset_val.view_map.keys())
    if args.limit:
        keys = keys[:args.limit]
    mean_ap = _eval_views(dataset_val, config, model, keys,
                          config.NUM_VIEWS, rnd_state=0,
                          iou_range=args.iou_range)
    label = "mAP@50:95" if args.iou_range else "mAP@50"
    print(f"{label}: {mean_ap:.4f}")
    return mean_ap


def cmd_visualize(args):
    config = _apply_overrides(InferenceConfig(), args.overrides)
    model = MaskRCNN(mode="inference", config=config, model_dir=args.logs)
    _load_model_weights(model, args)
    dataset_val = load_dataset(args.dataset, "val")
    keys = list(dataset_val.view_map.keys())[:args.limit or 20]
    out_dir = os.path.join("Results", f"NV{config.NUM_VIEWS}")
    for key in keys:
        view_ids = dataset_val.load_view(5, key, rnd_state=0)
        if view_ids is None:
            continue
        view_ids = view_ids[:config.NUM_VIEWS]
        views, R = [], np.zeros((1, config.NUM_VIEWS, 3, 4), np.float32)
        for i, vid in enumerate(view_ids):
            im = dataset_val.load_image(vid)
            im, *_ = resize_image(im, min_dim=config.IMAGE_MIN_DIM,
                                  max_dim=config.IMAGE_MAX_DIM,
                                  mode=config.IMAGE_RESIZE_MODE)
            views.append(im)
            R[0, i] = dataset_val.load_R(vid)
        results = model.detect([np.stack(views)], Rcam=R,
                               Kmat=dataset_val.K[None].astype(np.float32))
        r = results[0]
        visualize.save_image(
            views[0], str(key), r["rois"], r["masks"], r["class_ids"],
            r["scores"], SELECTED_CLASSES, save_dir=out_dir, mode=0)
        print(f"saved {key} -> {out_dir}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Train/evaluate multi-view Mask R-CNN on InteriorNet.")
    parser.add_argument("command", choices=["train", "evaluate", "visualize"])
    parser.add_argument("--dataset", required=True,
                        help="Root of InteriorNet HD1/HD7")
    parser.add_argument("--model", default=None,
                        help="'coco', 'last', or a checkpoint path")
    parser.add_argument("--coco-weights", default="mask_rcnn_coco.h5",
                        help="Path to Matterport COCO h5 (for --model coco)")
    parser.add_argument("--logs", default=DEFAULT_LOGS_DIR)
    parser.add_argument("--limit", type=int, default=0)
    parser.add_argument("--overrides", default="",
                        help="config overrides KEY=VAL,... (CLI analog of the\n"
                             "reference's subclass-and-override pattern)")
    parser.add_argument("--save-every", type=int, default=50,
                        help="checkpoint every N epochs (and at stage "
                             "ends); 1 = per-epoch for kill/resume")
    parser.add_argument("--epochs", default="301,4001,4501",
                        help="absolute 3-stage epoch targets (reference\n"
                             "defaults: interior_multi.py:483-501)")
    parser.add_argument("--iou-range", action="store_true",
                        help="evaluate COCO-style mAP@0.5:0.95 instead of "
                             "mAP@0.5")
    # multi-host launch (one process per host): also honors cluster env
    # vars (SLURM/TPU pod) with no flags — see parallel.mesh
    parser.add_argument("--coordinator", default=None,
                        help="coordinator host:port for jax.distributed")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args(argv)
    from ..parallel.mesh import init_distributed
    init_distributed(coordinator_address=args.coordinator,
                     num_processes=args.num_processes,
                     process_id=args.process_id)
    if args.command == "train":
        cmd_train(args)
    elif args.command == "evaluate":
        cmd_evaluate(args)
    else:
        cmd_visualize(args)


if __name__ == "__main__":
    main()
