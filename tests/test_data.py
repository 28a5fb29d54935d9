import numpy as np
import pytest

from mulit_view_object_detection_tpu.config import Config
from mulit_view_object_detection_tpu.data.generator import (
    load_image_gt, make_batch, make_sample)
from mulit_view_object_detection_tpu.data.synthetic import (
    SyntheticMultiViewDataset, SyntheticScene)
from mulit_view_object_detection_tpu.data.view_mapping import (
    build_instance_mapping, build_view_mapping, build_view_mapping_seq,
    covisibility)


class DataCfg(Config):
    NAME = "datacfg"
    NUM_CLASSES = 4
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    NUM_VIEWS = 2
    MAX_GT_INSTANCES = 8
    RPN_TRAIN_ANCHORS_PER_IMAGE = 64
    RPN_ANCHOR_SCALES = (8, 16, 32, 64, 128)
    USE_MINI_MASK = True
    MINI_MASK_SHAPE = (28, 28)


def test_synthetic_scene_consistency(rng):
    scene = SyntheticScene(rng, num_objects=2, num_views=3, image_size=64)
    for v in range(3):
        image, masks, depth = scene.render(v)
        assert image.shape == (64, 64, 3)
        assert masks.shape == (64, 64, 2)
        assert (depth > 0).all()
    # main view must see at least one object
    _, masks, _ = scene.render(0)
    assert masks.any()


def test_synthetic_dataset_api():
    ds = SyntheticMultiViewDataset(num_scenes=2, num_views=3)
    assert ds.num_images == 6
    assert ds.num_classes == 4
    image = ds.load_image(0)
    assert image.shape == (64, 64, 3)
    masks, class_ids = ds.load_mask(0)
    assert masks.shape[:2] == (64, 64)
    assert len(class_ids) == masks.shape[-1]
    R = ds.load_R(0)
    assert R.shape == (3, 4)
    views = ds.load_view(2, "s0_v0")
    assert len(views) == 2
    depth = ds.load_depth(0, DataCfg())
    # depth rides at the P5 feature resolution: 64 / stride 32 = 2
    assert depth.shape == (2, 2)


def test_load_image_gt():
    ds = SyntheticMultiViewDataset(num_scenes=1, num_views=2)
    cfg = DataCfg()
    image, meta, class_ids, bbox, mask = load_image_gt(
        ds, cfg, 0, use_mini_mask=True)
    assert image.shape == (64, 64, 3)
    assert mask.shape[:2] == (28, 28)
    assert bbox.shape == (len(class_ids), 4)
    assert meta.shape == (cfg.IMAGE_META_SIZE,)


def test_make_sample_and_batch():
    ds = SyntheticMultiViewDataset(num_scenes=2, num_views=3)
    cfg = DataCfg()
    view_ids = ds.load_view(2, "s0_v0")
    s = make_sample(ds, cfg, view_ids, rnd_state=0, with_depth=True)
    assert s["images"].shape == (2, 64, 64, 3)
    assert s["Rcam"].shape == (2, 3, 4)
    assert s["Kmat"].shape == (3, 3)
    assert s["gt_masks"].shape == (8, 28, 28)
    assert s["gt_boxes"].max() <= 1.0
    assert s["depths"].shape == (2, 2, 2)  # [V, P5, P5] at 64px
    assert (s["rpn_match"] != 0).any()

    batch = make_batch(ds, cfg, rnd_state=0)
    assert batch["images"].shape == (1, 2, 64, 64, 3)
    assert batch["anchors"].ndim == 2


def test_view_mapping_seq():
    frames = [f"f{i}" for i in range(30)]
    vm = build_view_mapping_seq(frames, view_range=10)
    assert len(vm["f0"]) == 9
    assert "f0" not in vm["f0"]
    assert len(vm["f15"]) == 9


def test_covisibility_and_view_mapping():
    K = np.array([[64.0, 0, 32], [0, 64, 32], [0, 0, 1]])
    ident = np.eye(3, 4)
    # same camera: fully co-visible
    frac, ok = covisibility(ident, ident, K, (64, 64))
    assert ok and frac > 0.9
    # camera 1km away: not co-visible
    far = np.eye(3, 4)
    far[0, 3] = 1000.0
    frac, ok = covisibility(ident, far, K, (64, 64))
    assert not ok and frac == 0.0

    vm = build_view_mapping({"a": ident, "b": ident.copy(), "c": far},
                            K, (64, 64))
    assert "b" in vm["a"] and "a" in vm["b"]
    assert "c" not in vm["a"] and "a" not in vm["c"]


def test_instance_mapping():
    m = build_instance_mapping({
        "f0": [(7, 3), (8, 2)],
        "f1": [(7, 3)],
    })
    assert m["7"] == [[3, "f0"], [3, "f1"]]
    assert m["8"] == [[2, "f0"]]


def test_image_from_source_map_keying():
    """Pins the registry keying contract (reference utils.py:560-562):
    image_from_source_map maps "<source>.<source_image_id>" to the internal
    row index, in registration order — load_view and the eval loop both
    depend on it."""
    from mulit_view_object_detection_tpu.data.dataset import Dataset

    ds = Dataset()
    ds.add_class("synthetic", 1, "thing")
    ds.add_image("synthetic", image_id="frame_b", path="pb")
    ds.add_image("synthetic", image_id="frame_a", path="pa")
    ds.prepare()
    assert ds.image_from_source_map["synthetic.frame_b"] == 0
    assert ds.image_from_source_map["synthetic.frame_a"] == 1
    assert ds.image_info[ds.image_from_source_map["synthetic.frame_a"]][
        "path"] == "pa"
    # class map: background + registered class
    assert ds.class_from_source_map["synthetic.1"] == 1
    assert ds.class_names[0] == "BG"
    assert ds.source_class_ids["synthetic"] == [0, 1]


def _picklable_make_batch(seed):
    """Module-level batch fn — ProcessPrefetcher's spawn workers pickle
    their make_fn, so it cannot be a local closure."""
    ds = SyntheticMultiViewDataset(num_scenes=2, num_views=3)
    cfg = DataCfg()
    return make_batch(ds, cfg, rnd_state=seed)


def _seed_tagging_fn(seed):
    return {"seed": np.array([seed], np.int64)}


def _always_failing_fn(seed):
    raise ValueError(f"synthetic dataset failure (seed={seed})")


def test_prefetchers_deliver_batches():
    ds = SyntheticMultiViewDataset(num_scenes=2, num_views=3)
    cfg = DataCfg()

    def make_fn(seed):
        return make_batch(ds, cfg, rnd_state=seed)

    from mulit_view_object_detection_tpu.data.generator import (
        BatchPrefetcher, ProcessPrefetcher)

    for cls, kw, fn in (
            (BatchPrefetcher, {"num_threads": 2}, make_fn),
            (ProcessPrefetcher, {"num_procs": 2}, _picklable_make_batch)):
        pf = cls(fn, prefetch=4, **kw)
        try:
            it = iter(pf)
            for _ in range(3):
                batch = next(it)
                assert batch["images"].shape == (1, 2, 64, 64, 3)
                assert np.isfinite(batch["images"]).all()
        finally:
            pf.close()


def test_process_prefetcher_disjoint_deterministic_streams():
    """N spawn workers must draw disjoint seed streams: worker i covers
    seed + i, seed + i + N, ... with no duplicates across workers."""
    from mulit_view_object_detection_tpu.data.generator import (
        ProcessPrefetcher)

    pf = ProcessPrefetcher(_seed_tagging_fn, num_procs=2, prefetch=2,
                           seed=100)
    try:
        seen = [int(next(iter(pf))["seed"][0]) for _ in range(8)]
    finally:
        pf.close()
    assert len(set(seen)) == len(seen), f"duplicate seeds: {seen}"
    # every observed seed belongs to one of the two arithmetic streams
    for s in seen:
        assert s >= 100 and (s - 100) >= 0
    streams = {s % 2 for s in seen}
    assert streams <= {0, 1}
    # each worker's stream is consumed in order: per-parity subsequences
    # of `seen` need not be sorted globally (queue interleaving) but the
    # multiset must be a prefix-union of the two streams
    for parity in (0, 1):
        got = sorted(s for s in seen if s % 2 == parity)
        expect = [100 + parity + 2 * k for k in range(len(got))]
        assert got == expect, (parity, got)


def test_process_prefetcher_propagates_worker_failure():
    from mulit_view_object_detection_tpu.data.generator import (
        PrefetchError, ProcessPrefetcher)

    pf = ProcessPrefetcher(_always_failing_fn, num_procs=1, prefetch=2)
    try:
        with pytest.raises(PrefetchError, match="synthetic dataset"):
            next(iter(pf))
    finally:
        pf.close()


def test_process_prefetcher_detects_dead_workers():
    from mulit_view_object_detection_tpu.data.generator import (
        PrefetchError, ProcessPrefetcher)

    pf = ProcessPrefetcher(_seed_tagging_fn, num_procs=1, prefetch=1)
    try:
        next(iter(pf))  # ensure the worker came up
        for p in pf._procs:
            p.terminate()
            p.join()
        # drain anything already enqueued, then expect liveness error
        with pytest.raises(PrefetchError, match="dead"):
            for _ in range(4):
                next(iter(pf))
    finally:
        pf.close()


def test_thread_prefetcher_propagates_terminal_failure():
    """make_batch raises only after 5 consecutive failures (a systematic
    problem); the thread prefetcher must surface that as PrefetchError
    instead of retrying forever while the consumer blocks on an empty
    queue."""
    from mulit_view_object_detection_tpu.data.generator import (
        BatchPrefetcher, PrefetchError)

    pf = BatchPrefetcher(_always_failing_fn, num_threads=1, prefetch=2)
    try:
        with pytest.raises(PrefetchError, match="synthetic dataset"):
            next(iter(pf))
    finally:
        pf.close()


def test_interiornet_hd7_pose_translation_is_eye():
    """HD7 [R|t]: t must be the camera EYE position vals[0:3] — the
    reference stores vals[1:4] = (eye_y, eye_z, lookat_x)
    (interior_multi.py:192), an off-by-one its own vec2rot disproves
    (it reads the eye as vec[0:3]). Deliberate fix, documented."""
    from mulit_view_object_detection_tpu.data.interiornet import (
        InteriorNetDataset)
    from mulit_view_object_detection_tpu.utils.pose import vec2rot

    eye, lookat, up = [1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [1.0, 2.0, 4.0]
    row = [*eye, *lookat, *up]
    R = InteriorNetDataset._pose_to_R([str(v) for v in row], is_hd7=True)
    np.testing.assert_allclose(R[:, 3], eye)
    np.testing.assert_allclose(R[:, :3], vec2rot(np.array(row)))
    # HD1 quaternion path: translation is (x, y, z) of the visim row
    q = [0.123, 0.456, 0.789, 1.0, 0.0, 0.0, 0.0]
    Rq = InteriorNetDataset._pose_to_R([str(v) for v in q], is_hd7=False)
    np.testing.assert_allclose(Rq[:, 3], q[:3])


def test_interiornet_load_view_skips_short_scenes():
    """load_view must return None (skip) rather than a SHORT view list —
    a short list would stack into a ragged batch downstream."""
    from mulit_view_object_detection_tpu.data.interiornet import (
        InteriorNetDataset)

    ds = InteriorNetDataset.__new__(InteriorNetDataset)
    ds.hd_folder = "HD1"
    ds.view_map = {"main": [f"v{i}" for i in range(8)]}   # only 1 neighbor
    ds.image_from_source_map = {f"interior.v{i}": i for i in range(8)}
    ds.image_from_source_map["interior.main"] = 99
    assert ds.load_view(2, "main") == [99, 2]   # stride-5: v[::-1][5] = v2
    assert ds.load_view(3, "main") is None      # needs 2 neighbors, has 1

    ds.hd_folder = "HD7"
    ds.view_map = {"main": [f"v{i}" for i in range(6)]}
    out = ds.load_view(6, "main", rnd_state=0)  # NUM_VIEWS=6: needs 5
    assert out is not None and len(out) == 6 and out[0] == 99
    ds.view_map = {"main": [f"v{i}" for i in range(4)]}  # < 5 co-visible
    assert ds.load_view(2, "main", rnd_state=0) is None


def test_make_sample_rejects_short_view_list():
    """A view list shorter than NUM_VIEWS raises (inside make_batch's
    tolerance) instead of producing a zero-padded or ragged sample."""
    from mulit_view_object_detection_tpu.data.generator import make_sample

    ds = SyntheticMultiViewDataset(num_scenes=1, num_views=3)
    cfg = DataCfg()
    assert cfg.NUM_VIEWS == 2
    with pytest.raises(ValueError, match="NUM_VIEWS"):
        make_sample(ds, cfg, view_ids=[0])


def test_nms_protocol_ap_ceiling_640_scenes():
    """The per-class detection NMS (refine_detections, model.py:729-753)
    places a PROTOCOL ceiling on mean per-scene AP: even a perfect
    detector cannot emit two same-class detections overlapping more than
    DETECTION_NMS_THRESHOLD. For the 640^2 quality-run scene set (seed 1,
    180-380 px objects — AP_SYNTHETIC_640_r04.json) that ceiling is
    exactly 0.75 at the faithful 0.3 threshold: three of four scenes draw
    a same-class GT pair with box IoU in (0.3, 0.505]. The run's measured
    mask AP@0.5 = 0.75 therefore SATURATES the protocol; at a 0.55
    threshold the same scenes are fully reachable (ceiling 1.0)."""
    import types

    from tools.train_to_ap import _nms_ap_ceiling

    ds = SyntheticMultiViewDataset(
        num_scenes=4, num_views=2, image_size=640, num_classes=4,
        seed=1, obj_px_range=(180.0, 380.0))
    ds.prepare()
    faithful = _nms_ap_ceiling(
        ds, types.SimpleNamespace(DETECTION_NMS_THRESHOLD=0.3))
    relaxed = _nms_ap_ceiling(
        ds, types.SimpleNamespace(DETECTION_NMS_THRESHOLD=0.55))
    assert faithful == 0.75
    assert relaxed == 1.0


def test_640_harness_uses_reference_anchor_ladder():
    """Locks the round-4 fix: the 640^2 quality harness must use the
    reference's UNMODIFIED anchor ladder (config.py:76 — interior_multi
    overrides nothing). The halved (16..256) ladder it previously used
    put every ~330 px object's best anchor on P6 — zeroed under the
    transformer's P5-only protocol — making RPN localization
    unlearnable (AP_XFORMER_640_HALVED_LADDER_r04.json)."""
    from tools.train_to_ap import build_config

    assert tuple(build_config(640, 2).RPN_ANCHOR_SCALES) == (
        32, 64, 128, 256, 512)
    # tiny harness keeps its scaled-down ladder
    assert tuple(build_config(64, 2).RPN_ANCHOR_SCALES) == (
        8, 16, 32, 64, 128)
