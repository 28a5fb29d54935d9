"""Same-weights cross-framework parity (VERDICT r4 #5).

Exports OUR TRAINED flagship checkpoint (conv3d 640^2 faithful protocol,
tools/train_to_ap.py) into the reference's Keras h5 weights layout
(utils/h5_export.py), loads it into the EXECUTED TF reference graph
(/root/reference/mrcnn/model_multi.py, built through the same shims that
produced the executed-reference goldens) via the reference's own
``load_weights(by_name=True)`` (model_multi.py:2592-2642), runs BOTH
frameworks' detection on the SAME held-out scenes, and compares
detections and mask AP@0.5. This upgrades the "matched mAP" claim from
same-protocol to same-weights evidence.

Three phases, each in its OWN process (the TF shims poison a jax
process and vice versa):

    python tools/crosscheck_reference.py --what export --ckpt /tmp/ck
    python tools/crosscheck_reference.py --what reference
    python tools/crosscheck_reference.py --what compare \
        --out CROSSCHECK_REFERENCE_r05.json

Phase outputs live under --workdir (default /tmp/crosscheck): export.h5,
scenes.npz, ours.npz, reference.npz.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The flagship faithful operating point — MUST match the training command
# recorded in AP_SYNTHETIC_640_FAITHFUL_HOLDOUT_r05.json.
POINT = dict(num_classes=4, num_views=2, image_size=640, top_down=64,
             fc=128, stage4_blocks=5, nvox=40, nvox_z=40,
             vmin=-2.0, vmax=2.0, vmin_z=1.0, vmax_z=7.0, samples=20,
             pre_nms=512, post_nms=64, det_max=8, min_conf=0.5,
             zero_pg=(0, 1), anchor_scales=(32, 64, 128, 256, 512),
             holdout_seed=1009, holdout_scenes=6, obj_px=(180.0, 380.0))


def _scene_inputs(workdir):
    """Load scenes.npz -> [(views, Rcam, Kmat, gt_boxes, gt_class_ids,
    gt_masks)] per scene."""
    data = np.load(os.path.join(workdir, "scenes.npz"))
    n = int(data["n_scenes"])
    return [(data[f"views_{i}"], data[f"Rcam_{i}"], data[f"Kmat_{i}"],
             data[f"gt_boxes_{i}"], data[f"gt_class_ids_{i}"],
             data[f"gt_masks_{i}"]) for i in range(n)], n


def phase_export(args):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from mulit_view_object_detection_tpu.compat.model import MaskRCNN
    from mulit_view_object_detection_tpu.data.generator import (
        load_image_gt, make_batch)
    from mulit_view_object_detection_tpu.data.synthetic import (
        SyntheticMultiViewDataset)
    from mulit_view_object_detection_tpu.models.detector import (
        MaskRCNN as Model)
    from mulit_view_object_detection_tpu.train.checkpoint import (
        latest_step, restore_checkpoint)
    from mulit_view_object_detection_tpu.train.step import (
        create_train_state)
    from mulit_view_object_detection_tpu.utils.h5_export import (
        save_h5_weights)
    from tools.train_to_ap import build_config

    g = POINT
    cfg = build_config(g["image_size"], g["num_views"], "conv3d",
                       nvox_override=g["nvox"],
                       samples_override=g["samples"])
    cfg.ZERO_PG_LEVELS = tuple(g["zero_pg"])
    cfg.RESNET50_STAGE4_BLOCKS = g["stage4_blocks"]

    # checkpoint restore needs the train-state SKELETON; build it exactly
    # as train_to_ap does
    ds = SyntheticMultiViewDataset(
        num_scenes=2, num_views=g["num_views"],
        image_size=g["image_size"], num_classes=g["num_classes"],
        seed=1, obj_px_range=g["obj_px"], scene_mode="shapes")
    model = Model(cfg)
    batch0 = make_batch(ds, cfg, rnd_state=0)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch0)
    state = restore_checkpoint(args.ckpt, state)
    step = latest_step(args.ckpt)
    print(f"restored {args.ckpt} at step {step}", flush=True)

    os.makedirs(args.workdir, exist_ok=True)
    h5_path = os.path.join(args.workdir, "export.h5")
    report = save_h5_weights(h5_path, state.params, state.batch_stats)
    print(f"exported {len(report['layers'])} layers "
          f"({len(report['unmapped'])} unmapped: {report['unmapped']})",
          flush=True)

    # held-out evaluation scenes (same set as the training artifact's
    # --holdout-scenes block)
    eval_ds = SyntheticMultiViewDataset(
        num_scenes=g["holdout_scenes"], num_views=g["num_views"],
        image_size=g["image_size"], num_classes=g["num_classes"],
        seed=g["holdout_seed"], obj_px_range=g["obj_px"],
        scene_mode="shapes")

    class EvalConfig(type(cfg)):
        DETECTION_MIN_CONFIDENCE = g["min_conf"]
        ZERO_PG_LEVELS = tuple(g["zero_pg"])
        RESNET50_STAGE4_BLOCKS = g["stage4_blocks"]
        # iso-numerics with the TF CPU graph: f32, XLA gather path
        COMPUTE_DTYPE = "float32"
        USE_PALLAS = False
    eval_cfg = EvalConfig()
    engine = MaskRCNN("inference", eval_cfg, "/tmp/crosscheck_logs")
    engine._ensure_state()
    engine._state = engine._state.replace(
        params=state.params, batch_stats=state.batch_stats)

    scenes, ours = {}, {}
    keys = list(eval_ds.view_map.keys())
    for i, key in enumerate(keys):
        view_ids = eval_ds.load_view(5, key, rnd_state=0)
        view_ids = view_ids[:g["num_views"]]
        _, _, gt_class_id, gt_bbox, gt_mask = load_image_gt(
            eval_ds, eval_cfg, view_ids[0], use_mini_mask=False)
        views = np.stack([eval_ds.load_image(v) for v in view_ids])
        Rcam = np.stack([eval_ds.load_R(v) for v in view_ids])[None]
        Kmat = eval_ds.K[None].astype(np.float32)
        scenes[f"views_{i}"] = views
        scenes[f"Rcam_{i}"] = Rcam
        scenes[f"Kmat_{i}"] = Kmat
        scenes[f"gt_boxes_{i}"] = gt_bbox.astype(np.float32)
        scenes[f"gt_class_ids_{i}"] = gt_class_id
        scenes[f"gt_masks_{i}"] = gt_mask
        r = engine.detect([views], Rcam=Rcam, Kmat=Kmat)[0]
        ours[f"rois_{i}"] = r["rois"].astype(np.float32)
        ours[f"class_ids_{i}"] = r["class_ids"]
        ours[f"scores_{i}"] = r["scores"].astype(np.float32)
        ours[f"masks_{i}"] = r["masks"].astype(bool)
        print(f"scene {i}: ours {len(r['class_ids'])} detections",
              flush=True)
    scenes["n_scenes"] = np.int32(len(keys))
    np.savez_compressed(os.path.join(args.workdir, "scenes.npz"), **scenes)
    np.savez_compressed(os.path.join(args.workdir, "ours.npz"),
                        n_scenes=np.int32(len(keys)), step=step, **ours)
    print("export phase done", flush=True)


def phase_reference(args):
    from tools.gen_multiview_golden import (install_multiview_shims,
                                            patch_modellib)
    tf = install_multiview_shims()
    sys.path.insert(0, "/root/reference")
    from mrcnn import model_multi as modellib
    from mrcnn.config import Config
    patch_modellib(tf, modellib)

    g = POINT

    class XCheckConfig(Config):
        NAME = "xcheck"
        GPU_COUNT = 1
        IMAGES_PER_GPU = 1
        NUM_CLASSES = g["num_classes"]
        NUM_VIEWS = g["num_views"]
        BACKBONE = "resnet50"
        TOP_DOWN_PYRAMID_SIZE = g["top_down"]
        FPN_CLASSIF_FC_LAYERS_SIZE = g["fc"]
        IMAGE_MIN_DIM = g["image_size"]
        IMAGE_MAX_DIM = g["image_size"]
        RPN_ANCHOR_SCALES = g["anchor_scales"]
        PRE_NMS_LIMIT = g["pre_nms"]
        POST_NMS_ROIS_INFERENCE = g["post_nms"]
        DETECTION_MAX_INSTANCES = g["det_max"]
        DETECTION_MIN_CONFIDENCE = g["min_conf"]
        GRID_REAS = "conv3d"
        VANILLA = False
        nvox = g["nvox"]
        nvox_z = g["nvox_z"]
        vmin = g["vmin"]
        vmax = g["vmax"]
        vmin_z = g["vmin_z"]
        vmax_z = g["vmax_z"]
        vsize = float(g["vmax"] - g["vmin"]) / g["nvox"]
        vsize_z = float(g["vmax_z"] - g["vmin_z"]) / g["nvox_z"]
        samples = g["samples"]

    cfg = XCheckConfig()
    model = modellib.MaskRCNN("inference", cfg, "/tmp/xcheck_logs")
    _orig_predict = model.keras_model.predict
    model.keras_model.predict = (
        lambda inputs, **kw: _orig_predict(
            [a[:cfg.BATCH_SIZE] for a in inputs], **kw))

    # load report: which of the reference graph's weighted layers our
    # exported h5 covers (by_name skips silently; record the evidence)
    import h5py
    with h5py.File(os.path.join(args.workdir, "export.h5"), "r") as f:
        h5_layers = {n.decode() if isinstance(n, bytes) else n
                     for n in f.attrs["layer_names"]}
    model_layers = {ly.name for ly in model.keras_model.layers
                    if ly.weights}
    matched = sorted(model_layers & h5_layers)
    missing = sorted(model_layers - h5_layers)
    extra = sorted(h5_layers - model_layers)
    print(f"h5 covers {len(matched)}/{len(model_layers)} model layers; "
          f"missing={missing} extra={extra}", flush=True)

    model.load_weights(os.path.join(args.workdir, "export.h5"),
                       by_name=True)

    scenes, n = _scene_inputs(args.workdir)
    out = {"n_scenes": np.int32(n)}
    for i, (views, Rcam, Kmat, *_gt) in enumerate(scenes):
        r = model.detect([views], Rcam, Kmat, verbose=0)[0]
        out[f"rois_{i}"] = r["rois"].astype(np.float32)
        out[f"class_ids_{i}"] = r["class_ids"]
        out[f"scores_{i}"] = r["scores"].astype(np.float32)
        out[f"masks_{i}"] = r["masks"].astype(bool)
        print(f"scene {i}: reference {len(r['class_ids'])} detections",
              flush=True)
    np.savez_compressed(os.path.join(args.workdir, "reference.npz"), **out)
    with open(os.path.join(args.workdir, "load_report.json"), "w") as f:
        json.dump({"matched": matched, "missing": missing,
                   "extra": extra}, f, indent=1)
    print("reference phase done", flush=True)


def phase_compare(args):
    from mulit_view_object_detection_tpu.eval.metrics import compute_ap

    scenes, n = _scene_inputs(args.workdir)
    ours = np.load(os.path.join(args.workdir, "ours.npz"))
    ref = np.load(os.path.join(args.workdir, "reference.npz"))
    with open(os.path.join(args.workdir, "load_report.json")) as f:
        load_report = json.load(f)

    def ap_of(dets, i, gt_bbox, gt_cls, gt_mask):
        if dets[f"masks_{i}"].shape[-1] == 0 or gt_mask.shape[-1] == 0:
            return 0.0
        ap, *_ = compute_ap(gt_bbox, gt_cls, gt_mask,
                            dets[f"rois_{i}"], dets[f"class_ids_{i}"],
                            dets[f"scores_{i}"], dets[f"masks_{i}"],
                            iou_threshold=0.5)
        return float(ap)

    rows, box_deltas, score_deltas = [], [], []
    for i, (_v, _R, _K, gt_bbox, gt_cls, gt_mask) in enumerate(scenes):
        ap_ours = ap_of(ours, i, gt_bbox, gt_cls, gt_mask)
        ap_ref = ap_of(ref, i, gt_bbox, gt_cls, gt_mask)
        no, nr = len(ours[f"class_ids_{i}"]), len(ref[f"class_ids_{i}"])
        row = {"scene": i, "ap50_ours": round(ap_ours, 4),
               "ap50_reference": round(ap_ref, 4),
               "n_det_ours": no, "n_det_reference": nr}
        # detection-level deltas when both emit the same count, matched
        # greedily by box IoU (the orders can differ by score ties)
        if no == nr and no > 0:
            a, b = ours[f"rois_{i}"], ref[f"rois_{i}"]
            used, max_d = set(), 0.0
            same_cls = True
            for j in range(no):
                dists = np.abs(b - a[j]).max(axis=1)
                for k in np.argsort(dists):
                    if k not in used:
                        used.add(int(k))
                        max_d = max(max_d, float(dists[k]))
                        same_cls &= (ours[f"class_ids_{i}"][j]
                                     == ref[f"class_ids_{i}"][k])
                        score_deltas.append(abs(
                            float(ours[f"scores_{i}"][j])
                            - float(ref[f"scores_{i}"][k])))
                        break
            box_deltas.append(max_d)
            row["max_box_delta_px"] = round(max_d, 3)
            row["classes_match"] = bool(same_cls)
        rows.append(row)

    result = {
        "metric": "same_weights_crossframework_ap50",
        "protocol": "our flagship-trained checkpoint exported to the "
                    "reference h5 layout, loaded by the reference's own "
                    "by_name loader into the executed TF model_multi "
                    "graph; both frameworks detect the same 6 HELD-OUT "
                    "scenes at f32 on CPU",
        "checkpoint_step": int(ours["step"]),
        "ap50_ours_mean": round(float(np.mean(
            [r["ap50_ours"] for r in rows])), 4),
        "ap50_reference_mean": round(float(np.mean(
            [r["ap50_reference"] for r in rows])), 4),
        "per_scene": rows,
        "max_box_delta_px": (round(max(box_deltas), 3)
                             if box_deltas else None),
        "max_score_delta": (round(max(score_deltas), 6)
                            if score_deltas else None),
        "h5_load": {"matched_layers": len(load_report["matched"]),
                    "missing_layers": load_report["missing"],
                    "extra_layers": load_report["extra"]},
        "point": {k: (list(v) if isinstance(v, tuple) else v)
                  for k, v in POINT.items()},
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", required=True,
                    choices=["export", "reference", "compare"])
    ap.add_argument("--workdir", default="/tmp/crosscheck")
    ap.add_argument("--ckpt", default="/tmp/ck_faithful_r05")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    {"export": phase_export, "reference": phase_reference,
     "compare": phase_compare}[args.what](args)


if __name__ == "__main__":
    main()
