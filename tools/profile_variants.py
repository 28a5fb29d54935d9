"""Per-variant TPU timing (loop-difference method): where do the
milliseconds go?

  python tools/profile_variants.py [variant ...]

Variants: vanilla (no geometry), conv3d (flagship), conv3d4 (4-view
flagship — the north-star's N=4 point), lstm3d4 (4-view ConvLSTM),
xformer (transformer fusion). Prints one JSON line each.
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

from mulit_view_object_detection_tpu.config import Config  # noqa: E402
from mulit_view_object_detection_tpu.models.detector import (  # noqa: E402
    MaskRCNN, make_dummy_batch)


class Base(Config):
    NAME = "prof"
    NUM_CLASSES = 23
    BACKBONE = "resnet50"
    # multi-view fork backbone: 5-block stage 4 (model_multi.py:596)
    RESNET50_STAGE4_BLOCKS = 5
    TOP_DOWN_PYRAMID_SIZE = 64
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
    FOLD_BN = os.environ.get("BENCH_FOLD_BN", "1") == "1"
    PHASE_DECONV = os.environ.get("BENCH_PHASE_DECONV", "1") == "1"
    # measured negative at the flagship lstm3d shape (see config.py)
    LSTM_HOIST_INPUT = os.environ.get("BENCH_LSTM_HOIST", "0") == "1"


def variant_config(name, batch=1):
    Base.IMAGES_PER_GPU = batch
    # batch-aware default, matching bench.py: z-fold wins at b<=2
    # (149.2 -> 194.3 fps b1) and loses at b4+ (183.9 -> 174.3)
    Base.ZFOLD_FUSION = (os.environ.get(
        "BENCH_ZFOLD", "1" if batch <= 2 else "0") == "1")
    if name == "vanilla":
        class C(Base):
            NUM_VIEWS = 2
            VANILLA = True
    elif name == "vanilla4":
        # 4 views through the backbone, no geometry: isolates the
        # per-view backbone scaling term of the 2->4-view cost
        class C(Base):
            NUM_VIEWS = 4
            VANILLA = True
    elif name == "ident":
        # geometry without the U-Net: + unprojection/reprojection term
        class C(Base):
            NUM_VIEWS = 2
            GRID_REAS = "ident"
    elif name == "ident4":
        class C(Base):
            NUM_VIEWS = 4
            GRID_REAS = "ident"
    elif name == "conv3d":
        class C(Base):
            NUM_VIEWS = 2
            GRID_REAS = "conv3d"
    elif name == "conv3d4":
        # the north-star (BASELINE.md) targets N=2 AND N=4 views
        class C(Base):
            NUM_VIEWS = 4
            GRID_REAS = "conv3d"
    elif name == "lstm3d4":
        class C(Base):
            NUM_VIEWS = 4
            GRID_REAS = "lstm3d"
    elif name == "xformer":
        class C(Base):
            NUM_VIEWS = 2
            GRID_REAS = "ident"
            TRANSFORMER = True
            TOP_DOWN_PYRAMID_SIZE = 72
            XFORMER_D_MODEL = 72
            samples = 1
    else:
        raise ValueError(name)
    return C()


def time_variant(name, batch=1):
    cfg = variant_config(name, batch)
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

    def run(iters):
        t0 = time.perf_counter()
        det = infer_loop(variables, batch, iters)
        _ = np.asarray(det)
        return time.perf_counter() - t0

    run(2)
    run(12)
    t2 = run(2)
    t12 = run(12)
    ms = (t12 - t2) / 10 * 1e3 / cfg.BATCH_SIZE
    # (No cost analysis here: XLA counts a fori_loop body ONCE regardless
    # of trip count, so loop-differencing flops/bytes yields exactly 0.
    # tools/mfu_report.py compiles the single-step program for that.)
    print(json.dumps({"variant": name, "batch": cfg.BATCH_SIZE,
                      "ms_per_frame": round(ms, 2),
                      "fps": round(1e3 / ms, 1)}), flush=True)


if __name__ == "__main__":
    # variant names, optionally suffixed ":bN" for a batched run
    for v in (sys.argv[1:] or ["vanilla", "conv3d"]):
        name, _, b = v.partition(":b")
        time_variant(name, int(b) if b else 1)
