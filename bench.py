"""Benchmark: multi-view Mask R-CNN inference frames/sec/chip on TPU.

Exercises BASELINE.json config #2's shape: 2-view fusion inference at the
reference's InteriorNet settings (interior_multi.py:370-394 — 640^2 input,
resnet50, TOP_DOWN_PYRAMID_SIZE=64, conv3d U-Net fusion, nvox=40^2 x 40,
samples=20, PRE_NMS_LIMIT=1500, POST_NMS 500).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against the documented estimate in BENCH_NOTES.md (TF1 single-GPU
multi-view inference ~= 2.0 frames/sec).
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 2.0  # see BENCH_NOTES.md


def _probe_backend(timeout_s=240, attempts=3, backoff_s=90):
    """Probe the TPU in a killable subprocess before importing jax here:
    with the axon tunnel down (or held by another process), `import jax`
    blocks INDEFINITELY in this environment, which would hang the whole
    bench harness.

    A busy chip usually frees within a minute or two (another process
    finishing a step burst holds the tunnel exclusively), so the probe
    RETRIES with backoff before giving up — round 3 lost its benchmark
    artifact to a single-probe fail-fast. Returns (error_or_None,
    probe_log); the caller emits the probe log into the JSON either way
    so an empty round is diagnosable from the artifact alone."""
    import subprocess
    import sys
    probes = []
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.devices()[0].platform)"],
                capture_output=True, text=True, timeout=timeout_s)
            dt = round(time.perf_counter() - t0, 1)
            if r.returncode == 0:
                probes.append({"attempt": i + 1, "ok": True,
                               "seconds": dt})
                return None, probes
            probes.append({"attempt": i + 1, "ok": False, "seconds": dt,
                           "rc": r.returncode,
                           "stderr": r.stderr[-200:]})
        except subprocess.TimeoutExpired:
            probes.append({"attempt": i + 1, "ok": False,
                           "seconds": timeout_s, "timeout": True})
        if i + 1 < attempts:
            time.sleep(backoff_s)
    return (f"TPU backend unreachable or busy after {attempts} probes "
            f"({timeout_s}s timeout, {backoff_s}s backoff; axon tunnel "
            f"down or chip held by another process)"), probes


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1,
                    help="images per step; >1 measures batched serving "
                         "throughput (amortizes per-op overheads)")
    ap.add_argument("--views", type=int, default=2,
                    help="number of fused views (BASELINE.md north-star "
                         "names N=2 AND N=4)")
    ap.add_argument("--grid-reas", default="conv3d",
                    choices=["conv3d", "lstm3d", "mean", "add", "ident"],
                    help="fusion family for the bench row")
    args = ap.parse_args()
    metric = (f"multiview_inference_{args.views}view_640_{args.grid_reas}"
              + (f"_b{args.batch}" if args.batch != 1 else ""))

    err, probes = _probe_backend()
    if err is not None:
        print(json.dumps({
            "metric": metric,
            "value": 0.0, "unit": "frames/sec/chip", "vs_baseline": 0.0,
            "error": err, "probes": probes}))
        return

    import jax

    from mulit_view_object_detection_tpu.config import Config
    from mulit_view_object_detection_tpu.models.detector import (
        MaskRCNN, make_dummy_batch)

    class BenchConfig(Config):
        NAME = "bench"
        NUM_CLASSES = 23
        NUM_VIEWS = args.views
        BACKBONE = "resnet50"
        # multi-view fork backbone: 5-block stage 4 (model_multi.py:596)
        RESNET50_STAGE4_BLOCKS = 5
        TOP_DOWN_PYRAMID_SIZE = 64
        GRID_REAS = args.grid_reas
        IMAGE_MIN_DIM = 640
        IMAGE_MAX_DIM = 640
        PRE_NMS_LIMIT = 1500
        POST_NMS_ROIS_INFERENCE = 500
        DETECTION_MAX_INSTANCES = 100
        nvox = 40
        nvox_z = 40
        vmin, vmax = -2.5, 2.5
        vmin_z, vmax_z = 1.0, 10.0
        samples = 20
        COMPUTE_DTYPE = "bfloat16"
        USE_PALLAS = os.environ.get("BENCH_USE_PALLAS", "1") == "1"
        # serving mode: frozen BNs pre-folded into conv weights
        # (utils/bn_fold.py; exactness covered by tests/test_bn_fold.py)
        FOLD_BN = os.environ.get("BENCH_FOLD_BN", "1") == "1"
        # grouped cross-level fusion U-Net (models/fusion.py::
        # GroupedGridFusion); init creates the grouped weights directly
        CROSS_LEVEL_FUSION = os.environ.get("BENCH_CROSS_LEVEL",
                                            "0") == "1"
        # phase-decomposed U-Net up-convs (PhaseConvTranspose3D): same
        # params, true-FLOPs lowering (tests/test_phase_deconv.py)
        PHASE_DECONV = os.environ.get("BENCH_PHASE_DECONV", "1") == "1"
        # space-to-depth stem conv (tests/test_stem_s2d.py). Measured
        # NEGATIVE on v5e (118.6 vs 147.3 fps b1): XLA:TPU's specialized
        # packed-sublane stem emitter beats the generic path the 4x4
        # C_in=12 form takes. Kept as a capability, default off.
        STEM_S2D = os.environ.get("BENCH_STEM_S2D", "0") == "1"
        # z-major U-Net convs (ZfoldConv3D/ZfoldPhaseConvTranspose3D):
        # same params, 2D-emitter lowering (tests/test_zfold_fusion.py).
        # Default is batch-aware: the z-slab concats add ~1.5x the U-Net
        # input bytes, which the 3D-emitter saving outpays at small
        # batch (b1 149.2 -> 194.3 fps) but not at b4+ (183.9 -> 174.3;
        # measured 2026-08-20, same session pairs) — set below.
        ZFOLD_FUSION = False

    BenchConfig.IMAGES_PER_GPU = args.batch
    BenchConfig.ZFOLD_FUSION = (os.environ.get(
        "BENCH_ZFOLD", "1" if args.batch <= 2 else "0") == "1")
    cfg = BenchConfig()
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rng = np.random.RandomState(0)
    batch["images"] = rng.randn(*batch["images"].shape).astype(
        np.float32) * 50.0
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    # init under jit: eager init crashes the relayed TPU worker at B>=2
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False))(rngs, batch)
    if cfg.FOLD_BN:
        from mulit_view_object_detection_tpu.utils.bn_fold import (
            fold_bn_variables)
        variables, _ = fold_bn_variables(
            jax.tree_util.tree_map(np.asarray, variables))
        variables = jax.device_put(variables)

    import functools

    import jax.numpy as jnp
    from jax import lax

    # Measurement notes (this environment reaches the chip via a relay):
    #  * block_until_ready acks before execution finishes -> must fetch the
    #    VALUE to force completion;
    #  * each remote call costs ~50 ms RTT -> the iteration loop runs
    #    ON-DEVICE inside one jitted fori_loop (steps dependency-chained via
    #    the detections), and the RTT is cancelled by differencing two loop
    #    lengths.
    @functools.partial(jax.jit, static_argnums=(2,))
    def infer_loop(variables, batch, iters):
        def body(i, det):
            chained = dict(batch)
            chained["images"] = batch["images"] + det[0, 0, 0] * 0.0
            out = model.apply(variables, chained, training=False)
            return out["detections"]

        det0 = jnp.zeros((cfg.BATCH_SIZE, cfg.DETECTION_MAX_INSTANCES, 6),
                         jnp.float32)
        return lax.fori_loop(0, iters, body, det0)

    def timed_run(iters):
        t0 = time.perf_counter()
        det = infer_loop(variables, batch, iters)
        _ = np.asarray(det)
        return time.perf_counter() - t0, det

    # warmup/compile both loop lengths
    short_n, long_n = 2, 22
    timed_run(short_n)
    timed_run(long_n)
    t_short, _ = timed_run(short_n)
    t_long, det = timed_run(long_n)
    dt = max(t_long - t_short, 1e-6)

    frames = (long_n - short_n) * cfg.BATCH_SIZE
    fps = frames / dt
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        # the reference publishes no throughput number; the denominator
        # is the documented ESTIMATE from BENCH_NOTES.md (bracketed by a
        # real measurement: the executed TF1 reference graph runs at
        # 0.179 fps iso-hardware on this host's CPU, REFBENCH_CPU_r04)
        "baseline_fps_estimated": BASELINE_FPS,
        "probes": probes,
    }))


if __name__ == "__main__":
    main()
