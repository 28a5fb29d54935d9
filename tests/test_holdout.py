"""Held-out evaluation protocol (VERDICT r4 #1).

The reference evaluates a val split the model never trained on
(samples/interior/interior_multi.py:504-510); train_to_ap's --holdout-*
flags reproduce that protocol on the synthetic harness: unseen scenes
from the same distribution (--holdout-scenes) and unseen viewpoints of
the training scenes (--holdout-view-seed).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mulit_view_object_detection_tpu.data.synthetic import (
    SyntheticMultiViewDataset)


def test_view_seed_keeps_scenes_changes_poses():
    """view_seed must change ONLY the cameras: same objects / classes /
    colors (the model trained on them), fresh poses (it never saw them)."""
    a = SyntheticMultiViewDataset(num_scenes=2, num_views=3, seed=3)
    b = SyntheticMultiViewDataset(num_scenes=2, num_views=3, seed=3,
                                  view_seed=77)
    for sa, sb in zip(a.scenes, b.scenes):
        np.testing.assert_array_equal(sa.centers, sb.centers)
        np.testing.assert_array_equal(sa.class_ids, sb.class_ids)
        np.testing.assert_array_equal(sa.colors, sb.colors)
        assert not np.allclose(sa.poses, sb.poses)
    # different view seeds -> different cameras (it is a real seed)
    c = SyntheticMultiViewDataset(num_scenes=2, num_views=3, seed=3,
                                  view_seed=78)
    assert not np.allclose(b.scenes[0].poses, c.scenes[0].poses)
    # renders follow the new cameras (cache was cleared)
    img_a = a.scenes[0].render(1)[0]
    img_b = b.scenes[0].render(1)[0]
    assert img_a.shape == img_b.shape
    assert not np.array_equal(img_a, img_b)


def test_view_seed_absent_is_bit_identical_legacy():
    """Without view_seed the dataset must stay bit-identical to earlier
    rounds' runs (checkpoint compatibility contract, synthetic.py)."""
    a = SyntheticMultiViewDataset(num_scenes=2, num_views=2, seed=5)
    b = SyntheticMultiViewDataset(num_scenes=2, num_views=2, seed=5)
    for sa, sb in zip(a.scenes, b.scenes):
        np.testing.assert_array_equal(sa.poses, sb.poses)
        np.testing.assert_array_equal(
            sa.render(0)[0], sb.render(0)[0])


def test_train_to_ap_holdout_fields(tmp_path):
    """End-to-end: one tiny training step + train/holdout-scene/
    holdout-view evaluation all flow into the artifact, labeled."""
    from tools import train_to_ap

    out = str(tmp_path / "r.json")
    result = train_to_ap.main([
        "--image-size", "64", "--nvox", "8", "--samples", "2",
        "--scenes", "2", "--grid-reas", "add", "--steps", "1",
        "--holdout-scenes", "1", "--holdout-view-seed", "9",
        "--smoke", "--out", out,
    ])
    assert "train scenes" in result["ap50_eval_scope"]
    assert 0.0 <= result["holdout_scene_ap50"] <= 1.0
    assert 0.0 <= result["holdout_view_ap50"] <= 1.0
    assert result["holdout_scenes"] == 1
    # default holdout seed derives from --seed (disjoint scene stream)
    assert result["holdout_seed"] == result["seed"] + 1000
    assert result["holdout_view_seed"] == 9
    assert 0.0 < result["holdout_scene_nms_ceiling"] <= 1.0


def test_cumulative_seconds_across_segments(tmp_path):
    """The history sidecar carries per-segment wall time; a resumed run's
    artifact must report the SUM (VERDICT r4 weak #5: resumed artifacts
    previously reported only the final segment's cost)."""
    from tools import train_to_ap

    ckpt = str(tmp_path / "ck")
    common = [
        "--image-size", "64", "--nvox", "8", "--samples", "2",
        "--scenes", "2", "--grid-reas", "add", "--ckpt", ckpt,
        "--smoke", "--skip-eval",
    ]
    train_to_ap.main(common + ["--steps", "2"])
    result = train_to_ap.main(common + ["--steps", "2", "--resume"])
    assert result["steps"] == 4
    assert result["cumulative_seconds"] > 0
    # cumulative covers BOTH segments: at least the final segment's time
    assert result["cumulative_seconds"] >= result["seconds"] - 0.2
    assert "sum of all segments" in result["cumulative_seconds_scope"]
