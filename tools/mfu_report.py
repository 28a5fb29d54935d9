"""MFU / roofline report for the flagship configs (VERDICT round-1 item 5).

For each workload (conv3d 2-view inference, full training step) this
compiles the jitted function, reads XLA's cost analysis (flops + bytes
accessed), times it with the on-device loop-difference method (see
bench.py's methodology notes), and reports:

  * model FLOP utilisation  = flops / time / peak_flops
  * HBM bandwidth utilisation = bytes / time / peak_bw
  * the roofline-implied bound (compute vs memory) at the measured
    arithmetic intensity

Peak numbers are for one TPU v5e chip: 197 TFLOP/s bf16, 819 GB/s HBM.

  python tools/mfu_report.py [inference] [train]
"""

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 197e12   # bf16 MXU, one chip
V5E_PEAK_BW = 819e9       # HBM bytes/sec, one chip


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _report(name, flops, byts, ms):
    secs = ms / 1e3
    mfu = flops / secs / V5E_PEAK_FLOPS
    bwu = byts / secs / V5E_PEAK_BW
    intensity = flops / max(byts, 1.0)
    ridge = V5E_PEAK_FLOPS / V5E_PEAK_BW  # flop/byte where compute == BW
    bound = "compute" if intensity >= ridge else "memory"
    # time floors implied by each roof
    t_flops = flops / V5E_PEAK_FLOPS * 1e3
    t_bw = byts / V5E_PEAK_BW * 1e3
    print(json.dumps({
        "workload": name,
        "ms": round(ms, 2),
        "gflops": round(flops / 1e9, 1),
        "gbytes": round(byts / 1e9, 2),
        "mfu": round(mfu, 4),
        "hbm_bw_util": round(bwu, 4),
        "arith_intensity_flop_per_byte": round(intensity, 1),
        "ridge_flop_per_byte": round(ridge, 1),
        "roofline_bound": bound,
        "roofline_floor_ms": round(max(t_flops, t_bw), 2),
        "speed_of_light_frac": round(max(t_flops, t_bw) / ms, 3),
    }), flush=True)


def time_loop(fn_loop, args, short=2, long=12, fetch=np.asarray):
    def run(iters):
        t0 = time.perf_counter()
        out = fn_loop(*args, iters)
        _ = fetch(out)
        return time.perf_counter() - t0

    run(short)
    run(long)
    ts = run(short)
    tl = run(long)
    return (tl - ts) / (long - short) * 1e3


def inference_report(variant="conv3d"):
    from tools.profile_variants import variant_config
    from mulit_view_object_detection_tpu.models.detector import (
        MaskRCNN, make_dummy_batch)

    cfg = variant_config(variant)
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rng = np.random.RandomState(0)
    batch["images"] = rng.randn(*batch["images"].shape).astype(
        np.float32) * 50.0
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False))(rngs, batch)

    @jax.jit
    def infer(variables, batch):
        return model.apply(variables, batch, training=False)["detections"]

    flops, byts = _cost(infer.lower(variables, batch).compile())

    @functools.partial(jax.jit, static_argnums=(2,))
    def infer_loop(variables, batch, iters):
        def body(i, det):
            chained = dict(batch)
            chained["images"] = batch["images"] + det[0, 0, 0] * 0.0
            return model.apply(variables, chained, training=False)[
                "detections"]

        det0 = jnp.zeros((cfg.BATCH_SIZE, cfg.DETECTION_MAX_INSTANCES, 6),
                         jnp.float32)
        return lax.fori_loop(0, iters, body, det0)

    ms = time_loop(infer_loop, (variables, batch))
    _report(f"{variant}_640_inference", flops, byts, ms)


def train_report():
    # ONE source of truth for the flagship training workload — any config
    # drift between the step-time bench and this MFU report would make
    # them measure different networks
    from bench_train import flagship_train_config, make_flagship_train_batch
    from mulit_view_object_detection_tpu.models.detector import MaskRCNN
    from mulit_view_object_detection_tpu.train.step import (
        create_train_state, make_train_step)

    cfg = flagship_train_config(name="mfu_train")
    model = MaskRCNN(cfg)
    batch = make_flagship_train_batch(cfg)

    state = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    train_step = make_train_step(cfg, stage="all", donate=False)

    step_rng = jax.random.PRNGKey(3)
    flops, byts = _cost(
        jax.jit(train_step).lower(state, batch, step_rng).compile())

    @functools.partial(jax.jit, static_argnums=(2,))
    def train_loop(state, batch, iters):
        def body(i, carry):
            st, rng_ = carry
            rng_, srng = jax.random.split(rng_)
            st, _ = train_step(st, batch, srng)
            return st, rng_

        return lax.fori_loop(0, iters, body, (state, jax.random.PRNGKey(7)))

    ms = time_loop(train_loop, (state, batch), short=1, long=6,
                   fetch=lambda out: np.asarray(out[0].step))
    _report("conv3d_2view_640_train_step", flops, byts, ms)


if __name__ == "__main__":
    which = sys.argv[1:] or ["inference", "train"]
    for w in which:
        if w == "train":
            train_report()
        elif w.startswith("inference"):
            # "inference" or "inference:<variant>" (profile_variants names)
            _, _, var = w.partition(":")
            inference_report(var or "conv3d")
