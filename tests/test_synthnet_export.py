"""Synthetic -> on-disk InteriorNet HD7 export (tools/
export_synthetic_interiornet.py) + CLI config-override mechanics.

The exported tree is what the committed end-to-end CLI run trains on
(VERDICT r4 #3): these tests pin the round trip — poses, images and
visibility masks reconstructed by InteriorNetDataset must match the
source SyntheticScene exactly — and the override parser the run uses.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pytest

from mulit_view_object_detection_tpu.cli.interior_multi import (
    InteriorNetConfig, _apply_overrides)
from mulit_view_object_detection_tpu.data.interiornet import (
    InteriorNetDataset)
from mulit_view_object_detection_tpu.data.synthetic import SyntheticScene
from tools.export_synthetic_interiornet import export_subset


def test_export_roundtrip(tmp_path):
    root = str(tmp_path)
    export_subset(root, "train", num_scenes=2, seed=21, image_size=96,
                  num_views=6)
    ds = InteriorNetDataset()
    ds.load_interiornet(os.path.join(root, "HD7"), "train")
    ds.prepare()
    assert ds.num_images == 12

    # rebuild scene 0 from the same seed/params the exporter used
    rng = np.random.RandomState(21)
    sc = SyntheticScene(rng, num_objects=3, num_views=6, image_size=96,
                        num_classes=4, focal=600.0,
                        obj_px_range=(180.0, 380.0), scene_mode="shapes")
    iid = next(i for i in range(ds.num_images)
               if "S00" in str(ds.image_info[i]["id"])
               and ds.image_info[i]["path"].endswith("/0.png"))
    # cam0.render eye/lookat/up rows -> the EXACT cam->world pose
    np.testing.assert_allclose(ds.load_R(iid), sc.poses[0], atol=1e-6)
    # RGB byte-exact through PNG
    np.testing.assert_array_equal(ds.load_image(iid), sc.render(0)[0])
    # visibility masks survive the instance+NYU label pair encoding
    masks, class_ids = ds.load_mask(iid)
    src_masks, src_cls = sc.render(0)[1], sc.class_ids
    vis = src_masks.sum(axis=(0, 1))
    assert masks.shape[-1] == int((vis > 0).sum())
    assert masks.sum() == src_masks.sum()
    # every exported class id maps into the selected taxonomy (nonzero)
    assert (class_ids > 0).all()
    # view selection works on the exported mapping (>=5 covisible)
    uid = next(k for k in ds.view_map if "S00" in k)
    ids = ds.load_view(2, uid, rnd_state=0)
    assert ids is not None and len(ids) == 2


def test_apply_overrides():
    cfg = _apply_overrides(
        InteriorNetConfig(),
        "IMAGE_MIN_DIM=128,IMAGE_MAX_DIM=128,TRAIN_BN=True,"
        "IMAGES_PER_GPU=2,ZERO_PG_LEVELS=(),RPN_ANCHOR_SCALES="
        "(8, 16, 32, 64, 128)")
    assert cfg.IMAGE_MIN_DIM == 128
    assert cfg.TRAIN_BN is True
    assert cfg.ZERO_PG_LEVELS == ()
    assert cfg.RPN_ANCHOR_SCALES == (8, 16, 32, 64, 128)
    # derived values recomputed
    assert cfg.BATCH_SIZE == 2
    assert tuple(cfg.IMAGE_SHAPE[:2]) == (128, 128)


def test_apply_overrides_rejects_unknown_key():
    with pytest.raises(SystemExit):
        _apply_overrides(InteriorNetConfig(), "IMGE_MIN_DIM=128")
