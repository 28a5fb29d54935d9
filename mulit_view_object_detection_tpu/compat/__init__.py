"""Matterport mrcnn-style public API: `Config`, `MaskRCNN`, molding utils.

    from mulit_view_object_detection_tpu import compat as mrcnn
    model = mrcnn.MaskRCNN(mode="inference", config=cfg, model_dir=...)
    results = model.detect([image])
"""

from ..config import Config  # noqa: F401
from ..data.molding import (expand_mask, minimize_mask, mold_image,  # noqa: F401
                            resize_image, resize_mask, unmold_image,
                            unmold_mask)
from ..eval.metrics import (compute_ap, compute_ap_range,  # noqa: F401
                            compute_matches, compute_recall)
from .model import MaskRCNN, compute_backbone_shapes  # noqa: F401


def batch_slice(inputs, graph_fn, batch_size, names=None):
    """API shim for utils.batch_slice (utils.py:1062-1096). Under JAX the
    idiomatic equivalent is jax.vmap; this shim exists so reference-style
    call sites keep working on host numpy data."""
    import numpy as np

    if not isinstance(inputs, list):
        inputs = [inputs]
    outputs = []
    for i in range(batch_size):
        inputs_slice = [x[i] for x in inputs]
        output_slice = graph_fn(*inputs_slice)
        if not isinstance(output_slice, (tuple, list)):
            output_slice = [output_slice]
        outputs.append(output_slice)
    outputs = list(zip(*outputs))
    result = [np.stack(o, axis=0) for o in outputs]
    if len(result) == 1:
        result = result[0]
    return result


def download_trained_weights(coco_model_path, verbose=1):
    """utils.py:1098-1109 — unavailable here (zero-egress environment)."""
    raise NotImplementedError(
        "No network egress in this environment; obtain mask_rcnn_coco.h5 "
        "elsewhere and load it with utils.h5_import.load_h5_weights.")
