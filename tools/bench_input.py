"""Host input-pipeline throughput (VERDICT round-1 item 9, SURVEY §7 hard
part 5): can the host generator keep a 100+ fps chip fed?

Measures batches/sec (and frames/sec = batches * BATCH_SIZE * NUM_VIEWS
image decodes) of BatchPrefetcher over the synthetic multi-view dataset at
the reference's flagship shape (640^2, 2 views, mini-masks, flip
augmentation), for several worker counts. Pure host work: image synth /
resize / mold, mask molding, RPN target building, batching. No device.

  JAX_PLATFORMS=cpu python tools/bench_input.py [--image-size 640]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mulit_view_object_detection_tpu.config import Config  # noqa: E402


class InputBenchConfig(Config):
    """Module-level (hence spawn-picklable) bench config."""
    NAME = "bench_input"
    NUM_CLASSES = 23
    BACKBONE = "resnet50"
    MAX_GT_INSTANCES = 100
    USE_MINI_MASK = True

    def __init__(self, image_size, num_views, uint8):
        self.NUM_VIEWS = num_views
        self.IMAGE_MIN_DIM = image_size
        self.IMAGE_MAX_DIM = image_size
        self.UINT8_IMAGE_TRANSFER = uint8
        super().__init__()


class BenchBatchFn:
    """Picklable make_fn: ProcessPrefetcher's spawn workers pickle the
    callable, so a local closure over ds/cfg would crash at start()."""

    def __init__(self, ds, cfg, aug):
        self.ds, self.cfg, self.aug = ds, cfg, aug

    def __call__(self, seed):
        from mulit_view_object_detection_tpu.data.generator import (
            make_batch)
        return make_batch(self.ds, self.cfg, rnd_state=seed,
                          augmentation=self.aug)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=640)
    p.add_argument("--num-views", type=int, default=2)
    p.add_argument("--batches", type=int, default=48)
    p.add_argument("--workers", type=int, nargs="*", default=[1, 4, 8])
    p.add_argument("--mode", choices=["thread", "process"], default="thread")
    p.add_argument("--uint8", action="store_true",
                   help="UINT8_IMAGE_TRANSFER batches: skip the host-side "
                        "f32 mold (mean-subtract moves on device) and "
                        "emit 4x smaller image buffers")
    args = p.parse_args(argv)

    from mulit_view_object_detection_tpu.data import augment
    from mulit_view_object_detection_tpu.data.generator import (
        _ERROR_TAG, BatchPrefetcher, ProcessPrefetcher)
    from mulit_view_object_detection_tpu.data.synthetic import (
        SyntheticMultiViewDataset)

    cfg = InputBenchConfig(args.image_size, args.num_views, args.uint8)
    ds = SyntheticMultiViewDataset(
        num_scenes=8, num_views=args.num_views,
        image_size=args.image_size, num_classes=4, seed=0)
    make_fn = BenchBatchFn(ds, cfg, augment.Fliplr(0.5))

    for workers in args.workers:
        if args.mode == "process":
            pf = ProcessPrefetcher(make_fn, num_procs=workers, prefetch=8)
        else:
            pf = BatchPrefetcher(make_fn, num_threads=workers, prefetch=8)
        it = iter(pf)
        next(it)  # warm caches (anchors etc.)
        # drain batches the workers piled up during warmup: up to
        # `prefetch` (8) pre-built batches would otherwise be consumed
        # at zero measured cost, inflating batches/sec by up to ~17%
        try:
            while True:
                item = pf._queue.get_nowait()
                # keep error sentinels visible: BatchPrefetcher uses the
                # _ERROR object, ProcessPrefetcher an ('__prefetch_error__',
                # tb) tuple — draining either silently would discard the
                # worker traceback
                is_err = (item is getattr(type(pf), "_ERROR", None)
                          or (isinstance(item, tuple) and len(item) == 2
                              and item[0] == _ERROR_TAG))
                if is_err:
                    pf._queue.put(item)
                    break
        except Exception:
            pass
        t0 = time.perf_counter()
        for _ in range(args.batches):
            next(it)
        dt = time.perf_counter() - t0
        pf.close()
        bps = args.batches / dt
        print(json.dumps({
            "metric": "host_input_pipeline",
            "mode": args.mode,
            "uint8": args.uint8,
            "workers": workers,
            "image_size": args.image_size,
            "batches_per_sec": round(bps, 2),
            "frames_per_sec": round(bps * cfg.BATCH_SIZE, 2),
            "view_images_per_sec": round(
                bps * cfg.BATCH_SIZE * cfg.NUM_VIEWS, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
