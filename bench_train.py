"""Training-step benchmark (BASELINE.json config #5's step-time metric):
one full multi-view training step — forward with on-device target
sampling, five losses, backward, SGD update — at the reference's
InteriorNet config. Prints ONE JSON line like bench.py.

The reference's cost proxy is its schedule: 100 steps/epoch x 4501 epochs
at batch 1 (interior_multi.py:376-377); no step time is published
(BASELINE.md), so vs_baseline uses the same documented estimate basis as
bench.py (~1.0 train step/sec for TF1 on one GPU).
"""

import functools
import json
import os
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 1.0  # see BENCH_NOTES.md


def flagship_train_config(batch=1, remat=False, name="bench_train"):
    """BASELINE config #2's training shape (interior_multi.py:370-394)
    incl. the multi-view fork's 5-block resnet50 stage 4
    (model_multi.py:596). Shared with tools/mfu_report.py so both always
    measure the SAME workload."""
    from mulit_view_object_detection_tpu.config import Config

    class TrainBench(Config):
        NAME = name
        NUM_CLASSES = 23
        NUM_VIEWS = 2
        BACKBONE = "resnet50"
        RESNET50_STAGE4_BLOCKS = 5
        TOP_DOWN_PYRAMID_SIZE = 64
        GRID_REAS = "conv3d"
        IMAGE_MIN_DIM = 640
        IMAGE_MAX_DIM = 640
        PRE_NMS_LIMIT = 1500
        POST_NMS_ROIS_TRAINING = 500
        TRAIN_ROIS_PER_IMAGE = 200
        DETECTION_MAX_INSTANCES = 100
        MAX_GT_INSTANCES = 100
        nvox = 40
        nvox_z = 40
        vmin, vmax = -2.5, 2.5
        vmin_z, vmax_z = 1.0, 10.0
        samples = 20
        COMPUTE_DTYPE = "bfloat16"

    TrainBench.IMAGES_PER_GPU = batch
    TrainBench.REMAT = remat
    return TrainBench()


def make_flagship_train_batch(cfg, device_put=True):
    """Deterministic synthetic training batch at the flagship shape
    (3 GT instances, 32+224 RPN anchor targets)."""
    import jax

    from mulit_view_object_detection_tpu.models.detector import (
        make_dummy_batch)

    batch = make_dummy_batch(cfg, training=True)
    rng = np.random.RandomState(0)
    batch["images"] = rng.randn(*batch["images"].shape).astype(
        np.float32) * 50.0
    batch["gt_class_ids"][:, :3] = [1, 2, 3]
    batch["gt_boxes"][:, 0] = [0.2, 0.2, 0.5, 0.5]
    batch["gt_boxes"][:, 1] = [0.5, 0.5, 0.8, 0.8]
    batch["gt_boxes"][:, 2] = [0.3, 0.55, 0.6, 0.9]
    batch["gt_masks"][:, :3] = 1.0
    a = batch["anchors"].shape[0]
    batch["rpn_match"] = np.zeros((cfg.BATCH_SIZE, a), np.int32)
    batch["rpn_match"][:, :32] = 1
    batch["rpn_match"][:, 32:256] = -1
    batch["rpn_bbox"] = np.zeros(
        (cfg.BATCH_SIZE, cfg.RPN_TRAIN_ANCHORS_PER_IMAGE, 4), np.float32)
    if device_put:
        batch = {k: jax.device_put(v) for k, v in batch.items()}
    return batch


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1,
                    help="images per step; >1 measures per-chip batch "
                         "scaling of training throughput")
    ap.add_argument("--remat", action="store_true",
                    help="enable backward-pass rematerialization")
    ap.add_argument("--donate", action="store_true",
                    help="donate the train state into the step loop "
                         "(in-place param/momentum buffers)")
    ap.add_argument("--bf16-momentum", action="store_true",
                    help="store SGD momentum in bfloat16 (halves the "
                         "momentum buffer's HBM read+write)")
    ap.add_argument("--zfold", action="store_true",
                    help="z-major U-Net lowering (ZFOLD_FUSION) in the "
                         "TRAINING graph (its serving result was "
                         "batch-dependent; the train step's byte mix "
                         "differs)")
    args = ap.parse_args()

    import jax
    from jax import lax

    from mulit_view_object_detection_tpu.models.detector import MaskRCNN
    from mulit_view_object_detection_tpu.train.step import (
        create_train_state, make_train_step)

    cfg = flagship_train_config(batch=args.batch, remat=args.remat)
    if args.zfold:
        cfg.ZFOLD_FUSION = True
    model = MaskRCNN(cfg)
    batch = make_flagship_train_batch(cfg)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    if args.bf16_momentum:
        import jax.numpy as jnp

        from mulit_view_object_detection_tpu.train.optim import (
            make_optimizer)
        tx = make_optimizer(cfg.LEARNING_RATE, cfg.LEARNING_MOMENTUM,
                            cfg.GRADIENT_CLIP_NORM,
                            accumulator_dtype=jnp.bfloat16)
        state = state.replace(tx=tx, opt_state=tx.init(state.params))
    train_step = make_train_step(cfg, stage="all", donate=False)

    donate_kw = {"donate_argnums": (0,)} if args.donate else {}

    @functools.partial(jax.jit, static_argnums=(2,), **donate_kw)
    def train_loop(state, batch, iters):
        def body(i, carry):
            st, rng_ = carry
            rng_, step_rng = jax.random.split(rng_)
            st, _ = train_step(st, batch, step_rng)
            return st, rng_

        return lax.fori_loop(0, iters, body, (state, jax.random.PRNGKey(7)))

    # with donation the input state buffers are invalidated per call:
    # keep a host copy and re-place it for every timed run
    state_host = (jax.tree_util.tree_map(np.asarray, state)
                  if args.donate else None)

    def run(iters):
        st_in = (jax.device_put(state_host) if args.donate else state)
        t0 = time.perf_counter()
        st, _ = train_loop(st_in, batch, iters)
        _ = np.asarray(st.step)
        return time.perf_counter() - t0

    run(1)
    run(6)
    t1 = run(1)
    t6 = run(6)
    ms = (t6 - t1) / 5 * 1e3
    sps = 1e3 / ms
    suffix = ((f"_b{args.batch}" if args.batch != 1 else "")
              + ("_remat" if args.remat else "")
              + ("_donate" if args.donate else "")
              + ("_bf16mom" if args.bf16_momentum else "")
              + ("_zfold" if args.zfold else ""))
    print(json.dumps({
        "metric": "multiview_train_step_2view_640_conv3d" + suffix,
        "value": round(sps, 3),
        "unit": "steps/sec/chip",
        "samples_per_sec": round(sps * cfg.BATCH_SIZE, 3),
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
