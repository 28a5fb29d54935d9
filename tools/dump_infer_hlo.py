"""Dump the optimized HLO of the flagship inference step (AOT compile →
as_text) and print the composition of named fusions, to map profiler op
names (fusion.N) back to source ops.

  python tools/dump_infer_hlo.py [variant] [out.txt]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.profile_variants import variant_config  # noqa: E402
from mulit_view_object_detection_tpu.models.detector import (  # noqa: E402
    MaskRCNN, make_dummy_batch)


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "conv3d"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/infer_hlo.txt"
    cfg = variant_config(variant)
    model = MaskRCNN(cfg)
    batch = make_dummy_batch(cfg, training=False)
    rngs = {"params": jax.random.PRNGKey(0),
            "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.eval_shape(lambda: model.init(rngs, batch,
                                                  training=False))
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)

    def infer(variables, batch):
        out = model.apply(variables, batch, training=False)
        return out["detections"]

    compiled = jax.jit(infer).lower(variables, batch).compile()
    texts = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(texts)
    print(f"wrote {out_path} ({len(texts)} bytes)")


if __name__ == "__main__":
    main()
