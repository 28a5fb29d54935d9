"""Serving benchmark: MicroBatcher end-to-end on the real chip.

Measures sustained request throughput and per-request latency through the
full serving stack (mold -> jit detect -> unmold + micro-batching) at a
given offered load, for dispatch batch sizes 1 and N. This is the
system-level complement to bench.py's device-only frames/sec: it includes
host molding/unmolding and the batching queue.

  python tools/serve_bench.py [--batch 4] [--requests 64] [--size 640]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--max-delay-ms", type=float, default=20.0)
    args = ap.parse_args()

    from mulit_view_object_detection_tpu.compat.model import MaskRCNN
    from mulit_view_object_detection_tpu.config import Config
    from mulit_view_object_detection_tpu.serve import MicroBatcher

    class ServeConfig(Config):
        NAME = "serve_bench"
        NUM_CLASSES = 23
        NUM_VIEWS = 2
        BACKBONE = "resnet50"
        # multi-view fork backbone: 5-block stage 4 (model_multi.py:596)
        RESNET50_STAGE4_BLOCKS = 5
        TOP_DOWN_PYRAMID_SIZE = 64
        GRID_REAS = "conv3d"
        IMAGE_MIN_DIM = args.size
        IMAGE_MAX_DIM = args.size
        PRE_NMS_LIMIT = 1500
        POST_NMS_ROIS_INFERENCE = 500
        DETECTION_MAX_INSTANCES = 100
        nvox = 40
        nvox_z = 40
        vmin, vmax = -2.5, 2.5
        vmin_z, vmax_z = 1.0, 10.0
        samples = 20
        COMPUTE_DTYPE = "bfloat16"
        USE_PALLAS = True
        FOLD_BN = True

    ServeConfig.IMAGES_PER_GPU = args.batch
    cfg = ServeConfig()
    engine = MaskRCNN("inference", cfg, "/tmp/serve_bench_logs")

    rng = np.random.RandomState(0)
    views = (rng.rand(cfg.NUM_VIEWS, args.size, args.size, 3) * 255
             ).astype(np.uint8)
    Rcam = np.zeros((1, cfg.NUM_VIEWS, 3, 4), np.float32)
    Rcam[:, :, :3, :3] = np.eye(3)
    Rcam[:, 1, 0, 3] = 0.3
    f = args.size * 0.625
    Kmat = np.array([[[f, 0, args.size / 2], [0, f, args.size / 2],
                      [0, 0, 1]]], np.float32)

    with MicroBatcher(engine, batch_size=args.batch,
                      max_delay_ms=args.max_delay_ms) as mb:
        # warmup: one full batch (compiles the fixed shape once)
        futs = [mb.submit(views, Rcam=Rcam, Kmat=Kmat)
                for _ in range(args.batch)]
        for fu in futs:
            fu.result(timeout=2400)

        t0 = time.time()
        futs = [mb.submit(views, Rcam=Rcam, Kmat=Kmat)
                for _ in range(args.requests)]
        for fu in futs:
            fu.result(timeout=2400)
        wall = time.time() - t0
        s = mb.stats()

    out = {
        "metric": "serving_requests_per_sec",
        "value": round(args.requests / wall, 3),
        "unit": "requests/sec/chip (end-to-end incl. host)",
        "batch": args.batch,
        "requests": args.requests,
        "mean_latency_ms": round(s["mean_latency_ms"], 1),
        "batches": s["batches"],
        "padded_slots": s["padded_slots"],
        "image": f"{args.size}^2 x {cfg.NUM_VIEWS} views",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
