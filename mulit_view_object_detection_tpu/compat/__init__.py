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
