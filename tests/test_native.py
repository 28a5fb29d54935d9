"""C++ maskops vs numpy fallback parity."""

import numpy as np

from mulit_view_object_detection_tpu.data import native


def _scene(rng):
    h, w = 48, 64
    instance_im = np.zeros((h, w), np.int32)
    nyu_im = np.zeros((h, w), np.int32)
    # instance 5: class 3 (mapped); instance 9: class 7 (dropped);
    # instance 12: class 4 (mapped)
    instance_im[5:15, 10:30] = 5
    nyu_im[5:15, 10:30] = 3
    instance_im[20:40, 5:20] = 9
    nyu_im[20:40, 5:20] = 7
    instance_im[30:44, 40:60] = 12
    nyu_im[30:44, 40:60] = 4
    nyu_map = {3: 1, 4: 2, 7: 0}
    return instance_im, nyu_im, nyu_map


def test_extract_instances_native(rng):
    instance_im, nyu_im, nyu_map = _scene(rng)
    masks, class_ids, boxes = native.extract_instances(
        instance_im, nyu_im, nyu_map)
    # background label 0 maps to class 0 -> dropped; instance 9 dropped
    assert len(class_ids) == 2
    assert sorted(class_ids.tolist()) == [1, 2]
    i1 = list(class_ids).index(1)
    i2 = list(class_ids).index(2)
    np.testing.assert_array_equal(boxes[i1], [5, 10, 15, 30])
    np.testing.assert_array_equal(boxes[i2], [30, 40, 44, 60])
    assert masks[i1].sum() == 10 * 20
    assert masks[i2].sum() == 14 * 20
    assert masks[i1, 6, 11] and not masks[i1, 0, 0]


def test_extract_instances_matches_fallback(rng):
    instance_im, nyu_im, nyu_map = _scene(rng)
    native_lib = native._load()
    got = native.extract_instances(instance_im, nyu_im, nyu_map)
    # force fallback
    saved, native._LIB = native._LIB, None
    try:
        ref = native.extract_instances(instance_im, nyu_im, nyu_map)
    finally:
        native._LIB = saved
    if native_lib is None:
        return  # no toolchain: both paths were the fallback anyway
    # same instances, possibly different order -> compare as sets by class
    assert sorted(got[1].tolist()) == sorted(ref[1].tolist())
    for cls in set(ref[1].tolist()):
        gi = list(got[1]).index(cls)
        ri = list(ref[1]).index(cls)
        np.testing.assert_array_equal(got[0][gi], ref[0][ri])
        np.testing.assert_array_equal(got[2][gi], ref[2][ri])


def test_extract_bboxes_native(rng):
    masks = np.zeros((3, 32, 32), bool)
    masks[0, 4:10, 6:12] = True
    masks[1, 0:32, 0:1] = True
    # masks[2] stays empty
    boxes = native.extract_bboxes(masks, layout="NHW")
    np.testing.assert_array_equal(boxes[0], [4, 6, 10, 12])
    np.testing.assert_array_equal(boxes[1], [0, 0, 32, 1])
    np.testing.assert_array_equal(boxes[2], [0, 0, 0, 0])
    # explicit layout: [H, W, N] gives the same result; an instance-major
    # stack with N > W (the old heuristic's blind spot) stays correct
    np.testing.assert_array_equal(
        native.extract_bboxes(np.transpose(masks, (1, 2, 0)),
                              layout="HWN"), boxes)
    wide = np.zeros((40, 8, 8), bool)     # N=40 > W=8
    wide[7, 2:5, 3:6] = True
    np.testing.assert_array_equal(
        native.extract_bboxes(wide, layout="NHW")[7], [2, 3, 5, 6])


def test_anchor_gt_match_native_equals_numpy(rng):
    from mulit_view_object_detection_tpu.ops.boxes import compute_overlaps_np

    anchors = np.sort(rng.uniform(0, 64, (500, 4)).astype(np.float32),
                      axis=-1)[:, [0, 2, 1, 3]].astype(np.float32)
    # (y1,x1,y2,x2) with y1<y2, x1<x2
    anchors = np.concatenate([
        np.minimum(anchors[:, :2], anchors[:, 2:]),
        np.maximum(anchors[:, :2], anchors[:, 2:]) + 1.0], axis=1)
    gt = np.array([[5, 5, 30, 30], [20, 20, 60, 60], [0, 40, 25, 64]],
                  np.float32)

    nat = native.anchor_gt_match(anchors, gt)
    if nat is None:  # toolchain unavailable
        return
    best_gt, best_iou, forced = nat

    iou = compute_overlaps_np(anchors, gt)
    np.testing.assert_array_equal(best_gt, iou.argmax(axis=1))
    np.testing.assert_array_equal(
        best_iou, iou[np.arange(anchors.shape[0]), iou.argmax(axis=1)])
    np.testing.assert_array_equal(forced,
                                  (iou == iou.max(axis=0)).any(axis=1))
    assert forced.sum() >= gt.shape[0] - 1  # at least one anchor per GT
