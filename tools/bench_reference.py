"""Measured baseline: reference vs this framework, iso-hardware (CPU).

BENCH_NOTES' `vs_baseline` has so far been anchored to a DOCUMENTED
estimate (TF1 single-GPU multi-view inference ~2 fps) because the
reference publishes no numbers (BASELINE.md). This tool replaces the
estimate with a measured chain on THIS host's CPU:

  1. `--what reference` — builds the reference's actual multi-view
     inference graph (mrcnn/model_multi.py:2300-2560, via the same
     TF2/tf_keras shims that produced the executed-reference goldens,
     tools/gen_multiview_golden.py) at the FULL flagship geometry
     (640^2, resnet50 w/ its native 5-block stage 4, nvox=40^2x40,
     samples=20, conv3d U-Net fusion, PRE_NMS 1500 / POST_NMS 500) and
     times `keras_model.predict` end to end.
  2. `--what ours` — times this framework's jitted inference at the
     identical config on the CPU backend (JAX_PLATFORMS=cpu).

Same machine, same core count, same geometry -> the ratio is a
framework-efficiency number, free of hardware confounds; the TPU number
(bench.py) then stacks on top. Each mode runs in its OWN process (the
TF shims poison the jax process and vice versa):

    python tools/bench_reference.py --what reference
    python tools/bench_reference.py --what ours

Prints one JSON line per run; results are recorded in BENCH_NOTES.md
("Measured reference baseline").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# One shared operating point == bench.py's BenchConfig (the flagship
# serving shape, interior_multi.py:370-394), small-batch CPU variant.
POINT = dict(num_classes=23, num_views=2, top_down=64, image_size=640,
             nvox=40, nvox_z=40, vmin=-2.5, vmax=2.5, vmin_z=1.0,
             vmax_z=10.0, samples=20, pre_nms=1500, post_nms=500,
             det_max=100)


def _inputs():
    rng = np.random.RandomState(0)
    g = POINT
    s = g["image_size"]
    views = rng.randint(0, 255, (g["num_views"], s, s, 3)).astype(
        np.uint8)
    Kmat = np.array([[[600.0, 0, 320], [0, 600, 320], [0, 0, 1]]],
                    np.float32)
    th = 0.08
    Ry = np.array([[np.cos(th), 0, np.sin(th)],
                   [0, 1, 0],
                   [-np.sin(th), 0, np.cos(th)]], np.float32)
    Rcam = np.zeros((1, g["num_views"], 3, 4), np.float32)
    Rcam[0, 0, :, :3] = np.eye(3)
    Rcam[0, 1, :, :3] = Ry
    Rcam[0, 1, :, 3] = [0.3, 0.05, 0.1]
    return views, Rcam, Kmat


def bench_reference(iters):
    sys.path.insert(0, REPO)
    from tools.gen_multiview_golden import (install_multiview_shims,
                                            patch_modellib)
    tf = install_multiview_shims()
    sys.path.insert(0, "/root/reference")
    from mrcnn import model_multi as modellib
    from mrcnn.config import Config
    patch_modellib(tf, modellib)

    g = POINT

    class RefBenchConfig(Config):
        NAME = "refbench"
        GPU_COUNT = 1
        IMAGES_PER_GPU = 1
        NUM_CLASSES = g["num_classes"]
        NUM_VIEWS = g["num_views"]
        BACKBONE = "resnet50"
        TOP_DOWN_PYRAMID_SIZE = g["top_down"]
        IMAGE_MIN_DIM = g["image_size"]
        IMAGE_MAX_DIM = g["image_size"]
        PRE_NMS_LIMIT = g["pre_nms"]
        POST_NMS_ROIS_INFERENCE = g["post_nms"]
        DETECTION_MAX_INSTANCES = g["det_max"]
        DETECTION_MIN_CONFIDENCE = 0.0
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

    cfg = RefBenchConfig()
    t_build0 = time.perf_counter()
    model = modellib.MaskRCNN("inference", cfg, "/tmp/refbench_logs")
    build_s = time.perf_counter() - t_build0

    # model_multi.detect feeds metas with a [NUM_VIEWS, meta] lead dim
    # against batch-1 everything else; keras 2.0.8 sliced inputs to the
    # batch range, tf_keras validates cardinality (same workaround as
    # gen_multiview_golden.py)
    _orig_predict = model.keras_model.predict
    model.keras_model.predict = (
        lambda inputs, **kw: _orig_predict(
            [a[:cfg.BATCH_SIZE] for a in inputs], **kw))

    views, Rcam, Kmat = _inputs()
    times = []
    for i in range(iters + 1):
        t0 = time.perf_counter()
        model.detect([views], Rcam=Rcam, Kmat=Kmat, verbose=0)
        dt = time.perf_counter() - t0
        print(f"[reference] frame {i}: {dt:.1f}s", file=sys.stderr,
              flush=True)
        if i > 0:  # frame 0 pays tf.function tracing
            times.append(dt)
    ms = float(np.mean(times)) * 1e3
    return {"metric": "reference_cpu_multiview_inference",
            "ms_per_frame": round(ms, 1), "fps": round(1e3 / ms, 4),
            "frames_timed": len(times), "graph_build_s": round(build_s, 1),
            "threads": os.cpu_count()}


def bench_ours(iters):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    sys.path.insert(0, REPO)
    import jax

    from mulit_view_object_detection_tpu.config import Config
    from mulit_view_object_detection_tpu.models.detector import (
        MaskRCNN, make_dummy_batch)

    g = POINT

    class OursBenchConfig(Config):
        NAME = "oursbench"
        NUM_CLASSES = g["num_classes"]
        NUM_VIEWS = g["num_views"]
        BACKBONE = "resnet50"
        RESNET50_STAGE4_BLOCKS = 5  # faithful (model_multi.py:596)
        TOP_DOWN_PYRAMID_SIZE = g["top_down"]
        GRID_REAS = "conv3d"
        IMAGE_MIN_DIM = g["image_size"]
        IMAGE_MAX_DIM = g["image_size"]
        PRE_NMS_LIMIT = g["pre_nms"]
        POST_NMS_ROIS_INFERENCE = g["post_nms"]
        DETECTION_MAX_INSTANCES = g["det_max"]
        nvox = g["nvox"]
        nvox_z = g["nvox_z"]
        vmin, vmax = g["vmin"], g["vmax"]
        vmin_z, vmax_z = g["vmin_z"], g["vmax_z"]
        samples = g["samples"]
        # CPU backend: float32 (XLA:CPU emulates bf16 slowly), no Pallas
        # (the kernels are Mosaic/TPU; CPU runs the XLA gather path)
        COMPUTE_DTYPE = "float32"
        USE_PALLAS = False
        FOLD_BN = True  # the framework's serving path, as in bench.py

    cfg = OursBenchConfig()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rng = np.random.RandomState(0)
    batch["images"] = rng.randn(*batch["images"].shape).astype(
        np.float32) * 50.0
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    t_build0 = time.perf_counter()
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False))(rngs, batch)
    from mulit_view_object_detection_tpu.utils.bn_fold import (
        fold_bn_variables)
    variables, _ = fold_bn_variables(
        jax.tree_util.tree_map(np.asarray, variables))

    fwd = jax.jit(lambda v, b: model.apply(v, b, training=False))
    out = fwd(variables, batch)
    jax.block_until_ready(out)
    build_s = time.perf_counter() - t_build0

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(variables, batch))
        dt = time.perf_counter() - t0
        print(f"[ours] frame {i}: {dt:.1f}s", file=sys.stderr, flush=True)
        times.append(dt)
    ms = float(np.mean(times)) * 1e3
    return {"metric": "ours_cpu_multiview_inference",
            "ms_per_frame": round(ms, 1), "fps": round(1e3 / ms, 4),
            "frames_timed": len(times),
            "compile_s": round(build_s, 1), "threads": os.cpu_count()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--what", choices=["reference", "ours"],
                    required=True)
    ap.add_argument("--iters", type=int, default=3,
                    help="timed frames (reference adds 1 warmup)")
    args = ap.parse_args(argv)
    result = (bench_reference if args.what == "reference"
              else bench_ours)(args.iters)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
