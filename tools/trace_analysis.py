"""Capture a jax.profiler trace of the flagship inference and print the top
device ops by total duration (parses the perfetto trace directly — no
TensorBoard needed).

  python tools/trace_analysis.py [variant]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_variants import variant_config  # noqa: E402
from mulit_view_object_detection_tpu.models.detector import (  # noqa: E402
    MaskRCNN, make_dummy_batch)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "conv3d"
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
    if getattr(cfg, "FOLD_BN", False):
        from mulit_view_object_detection_tpu.utils.bn_fold import (
            fold_bn_variables)
        variables, _ = fold_bn_variables(
            jax.tree_util.tree_map(np.asarray, variables))
        variables = jax.device_put(variables)

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch, training=False)
        return out["detections"]

    det = infer(variables, batch)
    _ = np.asarray(det)

    trace_dir = "/tmp/jax_trace"
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        det = infer(variables, batch)
    _ = np.asarray(det)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print("no trace written; files:",
              glob.glob(os.path.join(trace_dir, "**", "*"), recursive=True))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device tracks only: host threads (Python, runtime, thread pools)
    # would otherwise pollute the op ranking and double-count time that
    # overlaps device execution. Track names come from process_name
    # metadata events; fall back to ALL tracks when no device track
    # exists (pure-CPU traces).
    pid_name = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {pid for pid, nm in pid_name.items()
                   if any(t in nm for t in ("TPU", "GPU", "/device:",
                                            "XLA Op", "Device"))}

    durations = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if device_pids and ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0)
        durations[name] += dur
        counts[name] += 1
    top = sorted(durations.items(), key=lambda kv: -kv[1])[:40]
    total = sum(durations.values())
    scope = (f"{len(device_pids)} device track(s)" if device_pids
             else "all tracks (no device track found)")
    print(f"total traced event time: {total / 1e3:.2f} ms "
          f"(3 steps, {scope})")
    for name, dur in top:
        print(f"{dur / 1e3:9.2f} ms  x{counts[name]:<5} {name[:110]}")


if __name__ == "__main__":
    main()
