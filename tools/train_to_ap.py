"""Train-to-mAP harness: prove the detector DETECTS, end to end.

Trains the multi-view conv3d configuration from scratch on procedurally
generated synthetic scenes (data/synthetic.py — true pinhole projection,
consistent multi-view geometry) and measures mask AP@0.5 through the REAL
evaluation path: cli.interior_multi._eval_views -> compat.MaskRCNN.detect
-> eval.metrics.compute_ap, i.e. the same protocol as the reference's
InteriorNet evaluation (samples/interior/interior_multi.py:504-565).

One command:

    python tools/train_to_ap.py --steps 3000            # real TPU chip
    JAX_PLATFORMS=cpu python tools/train_to_ap.py --steps 60 --smoke

Notes (learned the hard way, see BENCH_NOTES.md):
  * TRAIN_BN=True — the reference default (False) assumes pretrained BN
    statistics; from scratch it freezes BN at init and the net collapses.
  * ZERO_PG_LEVELS=() — at 64 px every ROI routes to P2/P3, which the
    faithful multi-view memory cap would zero out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _nms_ap_ceiling(ds, cfg):
    """Upper bound the per-class detection NMS places on mean per-scene
    AP@0.5 for this dataset: even a PERFECT detector cannot emit two
    same-class detections overlapping more than DETECTION_NMS_THRESHOLD
    (refine_detections' per-class NMS, model.py:729-753 /
    ops/detection.py), so a GT layout with same-class box IoU above the
    threshold caps recall below 1 no matter the model. Computed as the
    mean over scenes of (max same-class-NMS-compatible GT subset)/n_gt —
    brute force over subsets, n_gt is tiny. numpy-only (no device work)."""
    import itertools

    from mulit_view_object_detection_tpu.ops.boxes import (
        compute_overlaps_np, extract_bboxes_np)

    thr = cfg.DETECTION_NMS_THRESHOLD
    fracs = []
    for key in list(ds.view_map.keys()):
        # max_views=5 matches the eval protocol's scene-inclusion rule
        # (cli.interior_multi._eval_views / interior_multi.py:516-520):
        # the ceiling covers exactly the scenes evaluation covers. Only
        # the MAIN view's GT enters the bound.
        view_ids = ds.load_view(5, key, rnd_state=0)
        if view_ids is None:
            continue
        mask, cls = ds.load_mask(view_ids[0])
        if mask.shape[-1] == 0:
            continue
        boxes = extract_bboxes_np(mask).astype(np.float32)
        ious = compute_overlaps_np(boxes, boxes)
        n = len(cls)
        best = 0
        for r in range(n, 0, -1):
            for sub in itertools.combinations(range(n), r):
                if all(cls[i] != cls[j] or ious[i, j] <= thr
                       for i, j in itertools.combinations(sub, 2)):
                    best = r
                    break
            if best:
                break
        fracs.append(best / max(n, 1))
    return round(float(np.mean(fracs)), 4) if fracs else 1.0


def build_config(image_size, num_views, variant="conv3d", nvox_override=None,
                 samples_override=None, grid_reas=None, xformer_arch=None):
    from mulit_view_object_detection_tpu.config import Config

    class TrainToAPConfig(Config):
        NAME = "train_to_ap"
        NUM_CLASSES = 4
        NUM_VIEWS = num_views
        BACKBONE = "resnet50"
        TOP_DOWN_PYRAMID_SIZE = 64
        FPN_CLASSIF_FC_LAYERS_SIZE = 128
        IMAGE_MIN_DIM = image_size
        IMAGE_MAX_DIM = image_size
        # Anchors: at the reference's 640^2 operating point use its
        # UNMODIFIED ladder (config.py:76 — interior_multi.py overrides
        # nothing), scaled down only for the tiny test harness. The
        # round-4 xformer-faithful failure was caused by a halved ladder
        # here: with (16..256), a ~330 px object's best anchor is the
        # 256 anchor on P6 — ZEROED under the P5-only protocol — so
        # every positive RPN target sat on a constant feature map and
        # localization was unlearnable (and NO object size had both its
        # best anchor and its ROI routing on P5).
        RPN_ANCHOR_SCALES = ((8, 16, 32, 64, 128) if image_size <= 128
                             else (32, 64, 128, 256, 512))
        PRE_NMS_LIMIT = 512
        POST_NMS_ROIS_TRAINING = 64
        POST_NMS_ROIS_INFERENCE = 64
        TRAIN_ROIS_PER_IMAGE = 32
        DETECTION_MAX_INSTANCES = 8
        DETECTION_MIN_CONFIDENCE = 0.5
        MAX_GT_INSTANCES = 8
        GRID_REAS = grid_reas or "conv3d"
        nvox = nvox_override or 16
        nvox_z = nvox_override or 16
        vmin, vmax = -2.0, 2.0
        vmin_z, vmax_z = 1.0, 7.0
        samples = samples_override or 8
        LEARNING_RATE = 0.002
        TRAIN_BN = True          # from-scratch training (see module doc)
        ZERO_PG_LEVELS = ()      # small-scale ROIs live on P2/P3
        USE_MINI_MASK = True
        MINI_MASK_SHAPE = (28, 28)

    if variant == "xformer":
        # BASELINE config #4's fusion (interior_transformer.py:378-407)
        # scaled to the synthetic harness: depth-conditioned P5 tokens,
        # small encoder, main-view features kept on the other levels so
        # 64-px objects (which route to P2/P3) stay detectable.
        class XformerConfig(TrainToAPConfig):
            GRID_REAS = "ident"
            TRANSFORMER = True
            TOP_DOWN_PYRAMID_SIZE = 72
            XFORMER_D_MODEL = 72
            XFORMER_NUM_LAYERS = 2
            XFORMER_NUM_HEADS = 4
            XFORMER_DFF = 128
            XFORMER_DROPOUT = 0.0
            XFORMER_KEEP_MAIN_LEVELS = True
            samples = 1
        if xformer_arch:
            # faithful reference encoder (model_transformer.py:361):
            # num_layers=6, heads=8, dff=256 via --xformer-arch 6,8,256
            layers, heads, dff = (int(x) for x in xformer_arch.split(","))
            XformerConfig.XFORMER_NUM_LAYERS = layers
            XformerConfig.XFORMER_NUM_HEADS = heads
            XformerConfig.XFORMER_DFF = dff
        return XformerConfig()
    return TrainToAPConfig()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--variant", choices=["conv3d", "xformer"],
                        default="conv3d")
    parser.add_argument("--nvox", type=int, default=0,
                        help="override voxel grid resolution (0 = default "
                             "16; the conv3d AP ceiling tracks this)")
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--num-views", type=int, default=2)
    parser.add_argument("--scenes", type=int, default=4)
    parser.add_argument("--eval-every", type=int, default=0,
                        help="0 = eval only at the end")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--lr-drop", type=float, default=None,
                        help="fraction of steps after which LR /= 10 "
                             "(default 0.75 for fresh runs; disabled on "
                             "--resume unless given explicitly — a "
                             "resumed run otherwise retrains at full LR "
                             "and re-resets momentum mid-continuation)")
    parser.add_argument("--out", default=None, help="write JSON here")
    parser.add_argument("--smoke", action="store_true",
                        help="CPU smoke: no AP threshold enforced")
    parser.add_argument("--skip-eval", action="store_true",
                        help="skip the final AP evaluation (training-"
                             "contract tests / partial segments)")
    parser.add_argument("--diagnostics", action="store_true",
                        help="record per-loss curves + box-vs-mask AP + "
                             "RPN proposal recall (plateau root-causing)")
    parser.add_argument("--lr", type=float, default=0.0,
                        help="override LEARNING_RATE")
    parser.add_argument("--warmup", type=int, default=0,
                        help="linear LR warmup steps")
    parser.add_argument("--zero-pg", default=None,
                        help="comma list overriding ZERO_PG_LEVELS, "
                             "e.g. '0,1' for the faithful memory cap")
    parser.add_argument("--keep-main-levels", default=None,
                        choices=["0", "1"],
                        help="override XFORMER_KEEP_MAIN_LEVELS")
    parser.add_argument("--ap-thresh", type=float, default=0.5,
                        help="pass/fail AP threshold (non-smoke)")
    parser.add_argument("--samples", type=int, default=0,
                        help="override ray depth samples")
    parser.add_argument("--grid-reas", default=None,
                        choices=["add", "mean", "ident", "conv3d",
                                 "lstm3d"],
                        help="override GRID_REAS for the conv3d-family "
                             "variant (fusion-architecture ablations)")
    parser.add_argument("--min-conf", type=float, default=0.5,
                        help="DETECTION_MIN_CONFIDENCE at eval")
    parser.add_argument("--batch", type=int, default=0,
                        help="override IMAGES_PER_GPU (training batch "
                             "size); batch>1 trains BN on cross-scene "
                             "statistics, closing the small-batch "
                             "running-average eval skew")
    parser.add_argument("--ckpt", default=None,
                        help="save the trained state here before eval "
                             "(insurance against eval-path failures)")
    parser.add_argument("--ckpt-every", type=int, default=0,
                        help="also checkpoint every N steps (bounds the "
                             "work lost to a host OOM-kill; the axon "
                             "tunnel client leaks ~35 MB of host RSS per "
                             "step at 640^2 batch 4, see BENCH_NOTES)")
    parser.add_argument("--max-rss-gb", type=float, default=0,
                        help="if >0: when host RSS exceeds this, save "
                             "--ckpt and exit(75) so a supervisor loop "
                             "can restart with --resume instead of "
                             "being OOM-killed mid-step")
    parser.add_argument("--eval-only", action="store_true",
                        help="skip training; restore --ckpt and evaluate")
    parser.add_argument("--resume", action="store_true",
                        help="restore --ckpt (params+optimizer+BN stats) "
                             "if present and train --steps MORE steps")
    parser.add_argument("--until-step", type=int, default=0,
                        help="absolute step target: train max(0, N - "
                             "restored_step) steps. Overrides --steps; "
                             "the restart-idempotent contract "
                             "train_supervisor.py relies on")
    parser.add_argument("--uint8-input", action="store_true",
                        help="UINT8_IMAGE_TRANSFER: ship raw resized "
                             "uint8 images host->device and mold on "
                             "device (4x fewer bytes/step over the "
                             "tunnel; bit-identical, see "
                             "tests/test_detector.py::"
                             "test_uint8_image_transfer_exactness)")
    parser.add_argument("--obj-px", default=None,
                        help="'lo,hi' target on-screen object size in "
                             "PIXELS. The flagship 640^2 protocol zeroes "
                             "the fused P2/P3 maps (ZERO_PG_LEVELS — the "
                             "reference's memory cap), so objects must be "
                             "P4/P5-scale (>~170 px) to be classifiable; "
                             "the default scene generator draws 64-256 px "
                             "objects, which at 640^2 route to the ZEROED "
                             "P3 and cap AP at ~0.25 no matter the "
                             "training budget (round-3/4 root cause)")
    parser.add_argument("--det-nms", type=float, default=None,
                        help="override DETECTION_NMS_THRESHOLD at eval. "
                             "The faithful 0.3 per-class NMS suppresses "
                             "correct detections whose GT boxes overlap a "
                             "same-class GT by >0.3 — a protocol ceiling, "
                             "not a model error (see BENCH_NOTES round 4)")
    parser.add_argument("--xformer-arch", default=None,
                        help="'layers,heads,dff' transformer encoder "
                             "size; '6,8,256' = the reference's faithful "
                             "hardcoded encoder "
                             "(model_transformer.py:361); default is the "
                             "small 2,4,128 harness encoder")
    parser.add_argument("--anchor-scales", default=None,
                        help="comma list overriding RPN_ANCHOR_SCALES "
                             "(e.g. '16,32,64,128,256'). Needed when "
                             "evaluating checkpoints trained before the "
                             "round-4 ladder fix: the RPN's learned "
                             "deltas are per anchor slot, so eval must "
                             "use the training ladder")
    parser.add_argument("--xformer-zero-init", action="store_true",
                        help="zero-init the transformer fusion's final "
                             "token projection (XFORMER_ZERO_INIT) so the "
                             "fused residual starts silent — required for "
                             "FROM-SCRATCH training of the faithful "
                             "P5-only protocol (see config.py)")
    parser.add_argument("--stage4-blocks", type=int, default=0,
                        help="resnet50 stage-4 identity blocks; 5 = the "
                             "multi-view fork's faithful backbone "
                             "(model_multi.py:596), required for "
                             "same-weights h5 export into the reference "
                             "graph (0 = framework default)")
    parser.add_argument("--scene-mode", default="legacy",
                        choices=["legacy", "shapes", "hard"],
                        help="synthetic scene generator mode "
                             "(data/synthetic.py). 'shapes': class-coded "
                             "silhouettes + visibility masks — REQUIRED "
                             "for held-out-scene eval to be learnable "
                             "(legacy colors are class-independent, so "
                             "cross-scene class identity is arbitrary); "
                             "'hard': + textured wall, striped "
                             "distractors, forced occluders, NMS-"
                             "compatible class layout (ceiling 1.0)")
    parser.add_argument("--num-objects", type=int, default=3,
                        help="objects per scene (hard scenes use 6+)")
    parser.add_argument("--holdout-scenes", type=int, default=0,
                        help="if >0: ALSO evaluate on N held-out scenes "
                             "drawn from the same distribution with "
                             "--holdout-seed (never trained on) — the "
                             "reference's val-split protocol "
                             "(interior_multi.py:504-510). The artifact "
                             "reports train-scene and held-out AP side "
                             "by side")
    parser.add_argument("--holdout-seed", type=int, default=0,
                        help="seed for the held-out scene set "
                             "(default: --seed + 1000)")
    parser.add_argument("--holdout-view-seed", type=int, default=0,
                        help="if >0: ALSO evaluate on the TRAINING "
                             "scenes rendered from fresh camera poses "
                             "seeded here (unseen viewpoints of seen "
                             "scenes)")
    parser.add_argument("--bn-eval-batch-stats", action="store_true",
                        help="diagnostic: evaluate with BatchNorm in "
                             "batch-statistics mode (isolates running-"
                             "average train/eval skew)")
    args = parser.parse_args(argv)

    # Persistent compilation cache: segmented/restarted runs (see
    # --max-rss-gb) must not re-pay the multi-minute 640^2 compile.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from mulit_view_object_detection_tpu.cli.interior_multi import _eval_views
    from mulit_view_object_detection_tpu.compat.model import MaskRCNN
    from mulit_view_object_detection_tpu.data.generator import make_batch
    from mulit_view_object_detection_tpu.data.synthetic import (
        SyntheticMultiViewDataset)
    from mulit_view_object_detection_tpu.models.detector import (
        MaskRCNN as Model)
    from mulit_view_object_detection_tpu.train.optim import make_optimizer
    from mulit_view_object_detection_tpu.train.step import (
        create_train_state, make_train_step)

    cfg = build_config(args.image_size, args.num_views, args.variant,
                       nvox_override=args.nvox or None,
                       samples_override=args.samples or None,
                       grid_reas=args.grid_reas,
                       xformer_arch=args.xformer_arch)
    if args.stage4_blocks:
        cfg.RESNET50_STAGE4_BLOCKS = args.stage4_blocks
    if args.lr:
        cfg.LEARNING_RATE = args.lr
    if args.batch:
        # instance-level override: EvalConfig below re-instantiates from
        # the class, so inference keeps its batch-1 geometry
        cfg.IMAGES_PER_GPU = args.batch
        cfg.BATCH_SIZE = args.batch * cfg.GPU_COUNT
    if args.uint8_input:
        cfg.UINT8_IMAGE_TRANSFER = True
    if args.zero_pg is not None:
        cfg.ZERO_PG_LEVELS = tuple(
            int(x) for x in args.zero_pg.split(",") if x != "")
    if args.keep_main_levels is not None:
        cfg.XFORMER_KEEP_MAIN_LEVELS = args.keep_main_levels == "1"
    if args.xformer_zero_init:
        cfg.XFORMER_ZERO_INIT = True
    if args.anchor_scales:
        cfg.RPN_ANCHOR_SCALES = tuple(
            int(x) for x in args.anchor_scales.split(","))
    with_depth = bool(cfg.TRANSFORMER)
    obj_px = (tuple(float(x) for x in args.obj_px.split(","))
              if args.obj_px else None)
    ds = SyntheticMultiViewDataset(
        num_scenes=args.scenes, num_views=args.num_views,
        image_size=args.image_size, num_classes=cfg.NUM_CLASSES,
        seed=args.seed, obj_px_range=obj_px,
        scene_mode=args.scene_mode, num_objects=args.num_objects)

    model = Model(cfg)
    batch0 = make_batch(ds, cfg, rnd_state=0, with_depth=with_depth)
    state = create_train_state(model, cfg, jax.random.PRNGKey(args.seed),
                               batch0)
    train_step = make_train_step(cfg, stage="all", donate=False)

    # inference engine sharing the training parameters. EvalConfig
    # re-instantiates from the CLASS, so any instance-level override set
    # above (--zero-pg, --keep-main-levels) must be pinned here too —
    # ZERO_PG_LEVELS in particular changes which grid_fusion_p* modules
    # exist, and a train/eval mismatch is a ScopeParamNotFoundError at
    # eval time, after the training budget is already spent.
    class EvalConfig(type(cfg)):
        DETECTION_MIN_CONFIDENCE = args.min_conf
        BN_EVAL_BATCH_STATS = args.bn_eval_batch_stats
        ZERO_PG_LEVELS = cfg.ZERO_PG_LEVELS
        XFORMER_KEEP_MAIN_LEVELS = cfg.XFORMER_KEEP_MAIN_LEVELS
        RPN_ANCHOR_SCALES = cfg.RPN_ANCHOR_SCALES
        RESNET50_STAGE4_BLOCKS = getattr(cfg, "RESNET50_STAGE4_BLOCKS",
                                         None)
        DETECTION_NMS_THRESHOLD = (args.det_nms if args.det_nms is not None
                                   else cfg.DETECTION_NMS_THRESHOLD)
    eval_cfg = EvalConfig()
    engine = MaskRCNN("inference", eval_cfg, "/tmp/train_to_ap_logs")
    engine._ensure_state()

    def evaluate(state, eval_ds=None):
        """Mean mask AP@0.5 over `eval_ds` (defaults to the TRAINING
        dataset — that number is train-scene AP, labeled as such in the
        artifact; pass a held-out dataset for generalization evidence,
        the reference's val-split protocol, interior_multi.py:504-510)."""
        eval_ds = ds if eval_ds is None else eval_ds
        engine._state = engine._state.replace(
            params=state.params, batch_stats=state.batch_stats)
        keys = list(eval_ds.view_map.keys())
        if not with_depth:
            return _eval_views(eval_ds, eval_cfg, engine, keys,
                               args.num_views, rnd_state=0)
        # depth-conditioned eval (interior_transformer.py's protocol)
        from mulit_view_object_detection_tpu.cli.interior_transformer \
            import _detect_with_depth
        from mulit_view_object_detection_tpu.data.generator import (
            load_image_gt)
        from mulit_view_object_detection_tpu.eval.metrics import compute_ap
        aps = []
        for key in keys:
            view_ids = eval_ds.load_view(5, key, rnd_state=0)
            if view_ids is None:
                continue
            view_ids = view_ids[:args.num_views]
            _, _, gt_class_id, gt_bbox, gt_mask = load_image_gt(
                eval_ds, eval_cfg, view_ids[0], use_mini_mask=False)
            r = _detect_with_depth(engine, eval_ds, eval_cfg, view_ids)[0]
            if r["masks"].shape[-1] == 0 or gt_mask.shape[-1] == 0:
                aps.append(0.0)
                continue
            ap, *_ = compute_ap(
                gt_bbox.astype(np.float32), gt_class_id, gt_mask,
                r["rois"].astype(np.float32), r["class_ids"],
                r["scores"], r["masks"], iou_threshold=0.5)
            aps.append(ap)
        return float(np.mean(aps)) if aps else 0.0

    def diagnose(state, diag_ds=None):
        """Plateau diagnostics: box AP vs mask AP (is the projective
        bottleneck blurring masks, or are detections missing?) and RPN
        proposal recall (is the detector even seeing the objects?).
        `diag_ds` defaults to the training dataset; pass a holdout
        dataset to root-cause generalization gaps (box-vs-mask-vs-class
        attribution on unseen scenes)."""
        diag_ds = ds if diag_ds is None else diag_ds
        from mulit_view_object_detection_tpu.data.generator import (
            load_image_gt)
        from mulit_view_object_detection_tpu.eval.metrics import (
            compute_ap, compute_recall)
        from mulit_view_object_detection_tpu.ops.boxes import (
            denorm_boxes_np)

        engine._state = engine._state.replace(
            params=state.params, batch_stats=state.batch_stats)
        mask_aps, box_aps, recalls, ndet = [], [], [], []
        per_scene = []
        h = eval_cfg.IMAGE_SHAPE[0]

        def boxes_to_masks(boxes, hw):
            m = np.zeros((hw, hw, boxes.shape[0]), np.float32)
            for i, (y1, x1, y2, x2) in enumerate(
                    boxes.astype(np.int32)):
                m[max(y1, 0):max(y2, 0), max(x1, 0):max(x2, 0), i] = 1.0
            return m

        from mulit_view_object_detection_tpu.data.molding import (
            resize_image)

        for key in list(diag_ds.view_map.keys()):
            view_ids = diag_ds.load_view(5, key, rnd_state=0)
            if view_ids is None:
                continue
            view_ids = view_ids[:args.num_views]
            image, _, gt_class_id, gt_bbox, gt_mask = load_image_gt(
                ds, eval_cfg, view_ids[0], use_mini_mask=False)
            views, Rcam = [], np.zeros((1, args.num_views, 3, 4),
                                       np.float32)
            depths = None
            if with_depth:
                fh = (int(eval_cfg.IMAGE_SHAPE[0])
                      // eval_cfg.BACKBONE_STRIDES[3])
                depths = np.zeros((1, args.num_views, fh, fh), np.float32)
            for i, vid in enumerate(view_ids):
                im = diag_ds.load_image(vid)
                im, *_ = resize_image(
                    im, min_dim=eval_cfg.IMAGE_MIN_DIM,
                    min_scale=eval_cfg.IMAGE_MIN_SCALE,
                    max_dim=eval_cfg.IMAGE_MAX_DIM,
                    mode=eval_cfg.IMAGE_RESIZE_MODE)
                views.append(im)
                Rcam[0, i] = diag_ds.load_R(vid)
                if with_depth:
                    depths[0, i] = diag_ds.load_depth(vid, eval_cfg)
            views = np.stack(views)
            Kmat = diag_ds.K[None].astype(np.float32)
            r = engine.detect([views], Rcam=Rcam, Kmat=Kmat,
                              depths=depths)[0]
            ndet.append(int(r["class_ids"].shape[0]))
            if r["masks"].shape[-1] == 0 or gt_mask.shape[-1] == 0:
                mask_aps.append(0.0)
                box_aps.append(0.0)
            else:
                m_ap, *_ = compute_ap(
                    gt_bbox.astype(np.float32), gt_class_id, gt_mask,
                    r["rois"].astype(np.float32), r["class_ids"],
                    r["scores"], r["masks"], iou_threshold=0.5)
                b_ap, *_ = compute_ap(
                    gt_bbox.astype(np.float32), gt_class_id,
                    boxes_to_masks(gt_bbox, h),
                    r["rois"].astype(np.float32), r["class_ids"],
                    r["scores"], boxes_to_masks(r["rois"], h),
                    iou_threshold=0.5)
                mask_aps.append(m_ap)
                box_aps.append(b_ap)
            # proposal-stage recall through run_graph
            g = engine.run_graph([views], outputs=["proposals"],
                                 Rcam=Rcam, Kmat=Kmat, depths=depths)
            props = denorm_boxes_np(np.asarray(g["proposals"])[0], (h, h))
            recalls.append(
                compute_recall(props, gt_bbox.astype(np.float32), 0.5)[0])
            # per-scene: which GT went unmatched, and why-adjacent facts
            from mulit_view_object_detection_tpu.eval.metrics import (
                compute_matches)
            gm, pm, _ = compute_matches(
                gt_bbox.astype(np.float32), gt_class_id, gt_mask,
                r["rois"].astype(np.float32), r["class_ids"], r["scores"],
                r["masks"], iou_threshold=0.5) \
                if r["masks"].shape[-1] else (np.full(len(gt_class_id),
                                                      -1.0), np.array([]),
                                              None)
            per_scene.append({
                "scene": str(key),
                "n_gt": int(len(gt_class_id)),
                "n_det": int(r["class_ids"].shape[0]),
                "false_pos": int((pm == -1).sum()) if pm.size else 0,
                "missed": [
                    {"class": int(gt_class_id[i]),
                     "area": int(gt_mask[..., i].sum()),
                     "box": [int(x) for x in gt_bbox[i]]}
                    for i in range(len(gt_class_id)) if gm[i] == -1],
                "scores": [round(float(s), 3) for s in r["scores"]],
            })
        return {
            "mask_ap50": round(float(np.mean(mask_aps)), 4),
            "box_ap50": round(float(np.mean(box_aps)), 4),
            "proposal_recall50": round(float(np.mean(recalls)), 4),
            "mean_detections": round(float(np.mean(ndet)), 2),
            "nms_protocol_ap_ceiling": _nms_ap_ceiling(diag_ds, eval_cfg),
            "per_scene": per_scene,
        }

    # Cross-segment history: supervised runs (train_supervisor.py) restart
    # this process many times; per-process lists lose everything before the
    # last segment (round-3's AP_SYNTHETIC_640 shipped with history=[]).
    # Append every loss/AP sample to a sidecar JSONL next to the checkpoint
    # and rebuild the full trajectory from it at emit time.
    hist_path = (args.ckpt.rstrip("/") + "_history.jsonl"
                 if args.ckpt else None)

    def record_history(entry):
        if hist_path:
            with open(hist_path, "a") as f:
                f.write(json.dumps(entry) + "\n")

    rng = jax.random.PRNGKey(args.seed + 100)
    lr_drop = args.lr_drop
    if lr_drop is None:
        lr_drop = 0.0 if args.resume else 0.75
    drop_at = int(args.steps * lr_drop) if lr_drop else -1
    t0 = time.time()
    losses = []
    history = []
    loss_history = []
    if args.warmup:
        # ONE schedule-driven tx (a per-step tx swap would retrace jit).
        # The stage-style LR/10 drop is folded into the SAME schedule:
        # its count lives in opt_state (checkpointed), so schedule
        # position is absolute across supervisor segments, and the
        # opt_state pytree structure never changes mid-run — a mid-loop
        # swap to a constant-LR tx would save a structurally different
        # opt_state and break restore in the next --warmup segment.
        import optax
        sched = optax.linear_schedule(0.0, cfg.LEARNING_RATE, args.warmup)
        if args.until_step:
            abs_drop = args.lr_drop if args.lr_drop is not None else 0.75
            drop_step = int(args.until_step * abs_drop) if abs_drop else 0
        else:
            drop_step = int(args.steps * lr_drop) if lr_drop else 0
        if drop_step > 0:
            sched = optax.join_schedules(
                [sched,
                 optax.constant_schedule(cfg.LEARNING_RATE / 10)],
                [drop_step])
        tx = make_optimizer(sched, cfg.LEARNING_MOMENTUM,
                            cfg.GRADIENT_CLIP_NORM)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
    start_step = 0
    if args.eval_only or args.resume or (args.until_step and args.ckpt):
        from mulit_view_object_detection_tpu.train.checkpoint import (
            latest_step, restore_checkpoint)
        if args.eval_only or latest_step(args.ckpt) is not None:
            state = restore_checkpoint(args.ckpt, state)
            start_step = int(latest_step(args.ckpt) or 0)
            print(f"restored {args.ckpt} at step {start_step}",
                  flush=True)
    n_steps = args.steps
    if args.until_step:
        n_steps = max(0, args.until_step - start_step)
        print(f"until-step {args.until_step}: {n_steps} steps to run "
              f"from {start_step}", flush=True)
        # segment-restart-idempotent LR drop: schedule in ABSOLUTE step
        # space against the final target (a restarted segment must not
        # re-run 75% of its remainder at full LR)
        abs_drop = args.lr_drop if args.lr_drop is not None else 0.75
        drop_at = (int(args.until_step * abs_drop) - start_step
                   if abs_drop else -1)
        if drop_at < 0 and abs_drop:
            drop_at = 0  # restored past the boundary: drop immediately
    for step in range(0 if args.eval_only else n_steps):
        if step == drop_at and not args.warmup:
            # stage-style fine-tune at LR/10 (warmup mode folds the drop
            # into its schedule instead — see above)
            tx = make_optimizer(cfg.LEARNING_RATE / 10,
                                cfg.LEARNING_MOMENTUM,
                                cfg.GRADIENT_CLIP_NORM)
            state = state.replace(tx=tx, opt_state=tx.init(state.params))
        batch = make_batch(ds, cfg, rnd_state=start_step + step,
                           with_depth=with_depth)
        rng, srng = jax.random.split(rng)
        state, metrics = train_step(state, batch, srng)
        losses.append(float(metrics["loss"]))
        if step % 100 == 0 or step == n_steps - 1:
            if args.diagnostics:
                entry = {"step": start_step + step,
                         **{k: round(float(v), 4)
                            for k, v in metrics.items()}}
                loss_history.append(entry)
                record_history(entry)
            import resource
            rss_gb = (resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                      / 1024.0 / 1024.0)
            print(f"step {step}: loss={losses[-1]:.4f} "
                  f"({time.time() - t0:.0f}s, rss {rss_gb:.1f} GB)",
                  flush=True)
            if args.max_rss_gb and rss_gb > args.max_rss_gb and args.ckpt:
                from mulit_view_object_detection_tpu.train.checkpoint \
                    import save_checkpoint
                save_checkpoint(args.ckpt, state, step=start_step + step + 1)
                # cumulative-cost ledger (VERDICT r4 weak #5): every
                # segment logs its wall time so the final artifact can
                # report the TRUE total cost across supervisor restarts
                record_history({"segment_seconds":
                                round(time.time() - t0, 1),
                                "segment_steps": step + 1})
                print(f"RSS {rss_gb:.1f} GB > {args.max_rss_gb} GB budget: "
                      f"checkpointed at step {start_step + step + 1}, "
                      f"exiting 75 for supervised restart", flush=True)
                raise SystemExit(75)
        if (args.ckpt_every and args.ckpt
                and (step + 1) % args.ckpt_every == 0):
            from mulit_view_object_detection_tpu.train.checkpoint import (
                save_checkpoint)
            save_checkpoint(args.ckpt, state, step=start_step + step + 1)
        if args.eval_every and (step + 1) % args.eval_every == 0:
            ap = evaluate(state)
            entry = {"step": start_step + step + 1, "ap50": round(ap, 4)}
            history.append(entry)
            record_history(entry)
            print(f"step {start_step + step + 1}: mask AP@0.5 = {ap:.4f}",
                  flush=True)

    elapsed = time.time() - t0
    if args.ckpt and not args.eval_only:
        # insurance: persist the trained state BEFORE eval so an
        # eval-path failure cannot lose the training budget
        from mulit_view_object_detection_tpu.train.checkpoint import (
            save_checkpoint)
        save_checkpoint(args.ckpt, state, step=start_step + n_steps)
        print(f"checkpoint saved to {args.ckpt}", flush=True)
    ap = -1.0 if args.skip_eval else evaluate(state)
    if not args.skip_eval and not args.eval_only:
        record_history({"step": start_step + n_steps, "ap50": round(ap, 4)})
    # Held-out evaluation (VERDICT r4 #1): same weights, same detect ->
    # compute_ap protocol, on scenes/viewpoints the model never trained
    # on. Train-scene AP above demonstrates fit; these demonstrate
    # generalization (the reference evaluates a val split,
    # interior_multi.py:504-510).
    holdout_scene_ap = holdout_view_ap = None
    holdout_scene_ceiling = holdout_view_ceiling = None
    holdout_seed = args.holdout_seed or (args.seed + 1000)
    if args.holdout_scenes and not args.skip_eval:
        hs_ds = SyntheticMultiViewDataset(
            num_scenes=args.holdout_scenes, num_views=args.num_views,
            image_size=args.image_size, num_classes=cfg.NUM_CLASSES,
            seed=holdout_seed, obj_px_range=obj_px,
            scene_mode=args.scene_mode, num_objects=args.num_objects)
        holdout_scene_ap = evaluate(state, hs_ds)
        holdout_scene_ceiling = _nms_ap_ceiling(hs_ds, eval_cfg)
        print(f"held-out-scene mask AP@0.5 = {holdout_scene_ap:.4f} "
              f"(nms ceiling {holdout_scene_ceiling})", flush=True)
    if args.holdout_view_seed and not args.skip_eval:
        hv_ds = SyntheticMultiViewDataset(
            num_scenes=args.scenes, num_views=args.num_views,
            image_size=args.image_size, num_classes=cfg.NUM_CLASSES,
            seed=args.seed, obj_px_range=obj_px,
            view_seed=args.holdout_view_seed,
            scene_mode=args.scene_mode, num_objects=args.num_objects)
        holdout_view_ap = evaluate(state, hv_ds)
        holdout_view_ceiling = _nms_ap_ceiling(hv_ds, eval_cfg)
        print(f"held-out-viewpoint mask AP@0.5 = {holdout_view_ap:.4f} "
              f"(nms ceiling {holdout_view_ceiling})", flush=True)
    diag = None
    diag_hv = diag_hs = None
    if args.diagnostics:
        diag = diagnose(state)
        print("diagnostics:", json.dumps(diag), flush=True)
        # holdout-set diagnostics: attribute a generalization gap to
        # boxes vs masks vs classes vs proposals on the UNSEEN sets
        if holdout_view_ap is not None:
            diag_hv = diagnose(state, hv_ds)
            print("diagnostics (holdout-view):",
                  json.dumps({k: v for k, v in diag_hv.items()
                              if k != "per_scene"}), flush=True)
        if holdout_scene_ap is not None:
            diag_hs = diagnose(state, hs_ds)
            print("diagnostics (holdout-scene):",
                  json.dumps({k: v for k, v in diag_hs.items()
                              if k != "per_scene"}), flush=True)
    if not args.eval_only and losses:
        record_history({"segment_seconds": round(elapsed, 1),
                        "segment_steps": n_steps})
    cumulative_seconds = None
    if hist_path and os.path.exists(hist_path):
        # rebuild the FULL cross-segment trajectory; dedupe by absolute
        # step keeping the LAST sample (an exit-75 restart replays the
        # tail of the previous segment from its checkpoint)
        ap_by, loss_by = {}, {}
        seg_seconds = []
        with open(hist_path) as f:
            for line in f:
                # a segment SIGKILLed mid-append leaves a partial last
                # line; the rebuilt trajectory must survive it (this
                # sidecar exists BECAUSE segments get killed)
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                if "segment_seconds" in e:
                    seg_seconds.append(e["segment_seconds"])
                    continue
                (ap_by if "ap50" in e else loss_by)[e["step"]] = e
        if ap_by:
            history = [ap_by[s] for s in sorted(ap_by)]
        if loss_by:
            loss_history = [loss_by[s] for s in sorted(loss_by)]
        if seg_seconds:
            cumulative_seconds = round(sum(seg_seconds), 1)
    result = {
        "metric": "synthetic_train_to_ap50",
        "variant": args.variant,
        "grid_reas": cfg.GRID_REAS,
        "samples": cfg.samples,
        "nvox": cfg.nvox,
        "ap50": round(ap, 4),
        # ap50 is TRAIN-SCENE AP: the eval scenes are the training
        # scenes (fit evidence). Generalization evidence is the
        # holdout_* fields below (when --holdout-* was given).
        "ap50_eval_scope": "train scenes (same scenes used for training)",
        "steps": start_step + n_steps,
        "image_size": args.image_size,
        "num_views": args.num_views,
        "scenes": args.scenes,
        "final_loss": round(float(np.mean(losses[-20:])), 4)
        if losses else None,
        "initial_loss": round(float(np.mean(losses[:20])), 4)
        if losses else None,
        "seconds": round(elapsed, 1),
        # `seconds`/`final_loss` cover only THIS process's segment; a
        # resumed or eval-only invocation (the supervisor's segmented
        # runs, BENCH_NOTES "Host RSS leak") reports 6250 steps but only
        # the final segment's wall time, which reads as implausible
        # without this marker.
        "seconds_scope": (
            "final segment only (resumed/eval-only; earlier segments' "
            "wall time and losses are not included)"
            if (args.resume or args.eval_only) else "full run"),
        "backend": jax.default_backend(),
        "history": history,
        "lr": cfg.LEARNING_RATE,
        "warmup": args.warmup,
        "zero_pg_levels": list(cfg.ZERO_PG_LEVELS),
        "obj_px": list(obj_px) if obj_px else None,
        "det_nms_threshold": eval_cfg.DETECTION_NMS_THRESHOLD,
        "rpn_anchor_scales": list(cfg.RPN_ANCHOR_SCALES),
        "seed": args.seed,
        "scene_mode": args.scene_mode,
        "num_objects": args.num_objects,
        "stage4_blocks": args.stage4_blocks or None,
    }
    if cumulative_seconds is not None:
        result["cumulative_seconds"] = cumulative_seconds
        result["cumulative_seconds_scope"] = (
            "sum of all segments' training wall time (cross-restart "
            "ledger in the history sidecar; excludes eval time)")
    if holdout_scene_ap is not None:
        result["holdout_scene_ap50"] = round(holdout_scene_ap, 4)
        result["holdout_scene_nms_ceiling"] = holdout_scene_ceiling
        result["holdout_scenes"] = args.holdout_scenes
        result["holdout_seed"] = holdout_seed
    if holdout_view_ap is not None:
        result["holdout_view_ap50"] = round(holdout_view_ap, 4)
        result["holdout_view_nms_ceiling"] = holdout_view_ceiling
        result["holdout_view_seed"] = args.holdout_view_seed
    if args.variant == "xformer":
        result["xformer_arch"] = {
            "layers": cfg.XFORMER_NUM_LAYERS,
            "heads": cfg.XFORMER_NUM_HEADS,
            "dff": cfg.XFORMER_DFF,
            "d_model": cfg.XFORMER_D_MODEL,
            "keep_main_levels": bool(
                getattr(cfg, "XFORMER_KEEP_MAIN_LEVELS", False)),
            "zero_init": bool(getattr(cfg, "XFORMER_ZERO_INIT", False)),
        }
    if diag:
        result["diagnostics"] = diag
    if diag_hv:
        result["diagnostics_holdout_view"] = diag_hv
    if diag_hs:
        result["diagnostics_holdout_scene"] = diag_hs
    if loss_history:
        result["loss_history"] = loss_history
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    if not args.smoke and not args.skip_eval:
        assert ap >= args.ap_thresh, (
            f"mask AP@0.5 = {ap:.4f} < {args.ap_thresh} target")
    return result


if __name__ == "__main__":
    main()
