"""End-to-end demo on synthetic multi-view scenes (the reference's
samples/demo.ipynb is a 0-byte file; this is the runnable equivalent).

Builds a 2-view detector, runs detection on a procedurally generated scene
with known poses, and renders the result to demo_output.jpg.

  PYTHONPATH=. python examples/demo_synthetic.py
"""

import numpy as np

from mulit_view_object_detection_tpu import compat as mrcnn
from mulit_view_object_detection_tpu.data.synthetic import (
    SyntheticMultiViewDataset)
from mulit_view_object_detection_tpu.utils import visualize


class DemoConfig(mrcnn.Config):
    NAME = "demo"
    NUM_CLASSES = 4
    NUM_VIEWS = 2
    BACKBONE = "resnet50"
    TOP_DOWN_PYRAMID_SIZE = 32
    FPN_CLASSIF_FC_LAYERS_SIZE = 64
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    PRE_NMS_LIMIT = 512
    POST_NMS_ROIS_INFERENCE = 64
    DETECTION_MAX_INSTANCES = 10
    DETECTION_MIN_CONFIDENCE = 0.0   # untrained weights: show raw output
    GRID_REAS = "add"
    nvox = 8
    nvox_z = 8
    vmin, vmax = -2.0, 2.0
    vmin_z, vmax_z = 1.0, 7.0
    samples = 4


def main():
    config = DemoConfig()
    dataset = SyntheticMultiViewDataset(num_scenes=1, num_views=2,
                                        image_size=64)
    model = mrcnn.MaskRCNN(mode="inference", config=config, model_dir="/tmp")

    view_ids = dataset.load_view(2, "s0_v0")
    views = np.stack([dataset.load_image(v) for v in view_ids])
    R = np.stack([dataset.load_R(v) for v in view_ids])[None]
    K = dataset.K[None].astype(np.float32)

    results = model.detect([views], Rcam=R, Kmat=K)
    r = results[0]
    print(f"detections: {len(r['class_ids'])}")
    print("rois:", r["rois"])
    print("scores:", r["scores"])
    path = visualize.save_image(
        views[0], "demo_output", r["rois"], r["masks"], r["class_ids"],
        r["scores"], ["BG", "class1", "class2", "class3"],
        save_dir=".", mode=0, scores_thresh=0.0)
    print("wrote", path)


if __name__ == "__main__":
    main()
