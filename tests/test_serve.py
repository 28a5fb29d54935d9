"""MicroBatcher: request batching, padding, latency bound, failure
propagation — against a fake engine; plus one real-engine integration."""

import threading
import time

import numpy as np
import pytest

from mulit_view_object_detection_tpu.serve import MicroBatcher


class FakeEngine:
    def __init__(self, fail_times=0, delay=0.0):
        self.calls = []
        self.fail_times = fail_times
        self.delay = delay

    def detect(self, images, Rcam=None, Kmat=None, depths=None):
        self.calls.append([np.asarray(im).copy() for im in images])
        if self.fail_times > 0:
            self.fail_times -= 1
            raise RuntimeError("boom")
        if self.delay:
            time.sleep(self.delay)
        return [{"tag": float(np.asarray(im).mean())} for im in images]


def _views(val):
    return np.full((2, 8, 8, 3), val, np.float32)


def test_full_batch_dispatches_once():
    eng = FakeEngine()
    with MicroBatcher(eng, batch_size=4, max_delay_ms=200) as mb:
        futures = [mb.submit(_views(i)) for i in range(4)]
        results = [f.result(timeout=10) for f in futures]
    assert [r["tag"] for r in results] == [0.0, 1.0, 2.0, 3.0]
    s = mb.stats()
    assert s["batches"] == 1 and s["padded_slots"] == 0
    assert len(eng.calls[0]) == 4


def test_partial_batch_pads_and_drops_padding():
    eng = FakeEngine()
    with MicroBatcher(eng, batch_size=4, max_delay_ms=10) as mb:
        f = mb.submit(_views(7))
        assert f.result(timeout=10)["tag"] == 7.0
        # give the stats update a beat (set_result happens after stats)
        time.sleep(0.05)
    s = mb.stats()
    assert s["requests"] == 1
    assert s["padded_slots"] == 3
    # the engine saw a FULL fixed-size batch (single compiled shape)
    assert len(eng.calls[0]) == 4
    np.testing.assert_array_equal(eng.calls[0][1], eng.calls[0][0])


def test_engine_failure_fails_futures_but_keeps_serving():
    eng = FakeEngine(fail_times=1)
    with MicroBatcher(eng, batch_size=2, max_delay_ms=5) as mb:
        f1 = mb.submit(_views(1))
        with pytest.raises(RuntimeError, match="boom"):
            f1.result(timeout=10)
        f2 = mb.submit(_views(2))
        assert f2.result(timeout=10)["tag"] == 2.0


def test_concurrent_submitters_all_resolve():
    eng = FakeEngine()
    results = {}
    with MicroBatcher(eng, batch_size=4, max_delay_ms=20) as mb:
        def worker(i):
            results[i] = mb.submit(_views(i)).result(timeout=10)["tag"]
        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == {i: float(i) for i in range(10)}
    s = mb.stats()
    assert s["requests"] == 10
    # every engine call is exactly the fixed batch size
    assert all(len(c) == 4 for c in eng.calls)


def test_http_server_roundtrip_and_batching():
    """Concurrent HTTP clients must batch onto one engine call and get
    their own results back through the npz wire protocol."""
    from mulit_view_object_detection_tpu.serve import (
        detect_remote, make_server)

    class DictEngine(FakeEngine):
        def detect(self, images, Rcam=None, Kmat=None, depths=None):
            self.calls.append(len(images))
            out = []
            for im in images:
                v = float(np.asarray(im).mean())
                out.append({
                    "rois": np.full((1, 4), v, np.float32),
                    "class_ids": np.array([int(v)], np.int32),
                    "scores": np.array([0.9], np.float32),
                    "masks": np.zeros((8, 8, 1), np.float32),
                })
            return out

    eng = DictEngine()
    # generous fill window: 4 client threads must land inside it even on
    # a loaded 1-core host, or the batching assertion below flakes
    server, batcher = make_server(eng, port=0, batch_size=4,
                                  max_delay_ms=500)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{port}"
        Rcam = np.zeros((1, 2, 3, 4), np.float32)
        Kmat = np.eye(3, dtype=np.float32)[None]
        results = {}

        def client(i):
            results[i] = detect_remote(url, _views(i), Rcam=Rcam,
                                       Kmat=Kmat, timeout=30)
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert set(results) == {0, 1, 2, 3}
        for i, r in results.items():
            assert int(r["class_ids"][0]) == i
            assert r["rois"].shape == (1, 4)
        # concurrent clients shared device batches (not 4 x batch-1)
        assert len(eng.calls) < 4
        # stats endpoint
        from urllib.request import urlopen
        import json as _json
        with urlopen(f"{url}/stats", timeout=10) as resp:
            stats = _json.loads(resp.read())
        assert stats["requests"] == 4
        with urlopen(f"{url}/healthz", timeout=10) as resp:
            assert resp.read() == b"ok"
    finally:
        server.shutdown()
        batcher.close()


def test_real_engine_microbatched_matches_direct(tmp_path):
    """Batched-through-the-batcher results must equal a direct batched
    detect() on the real tiny engine (CPU)."""
    from mulit_view_object_detection_tpu.compat.model import MaskRCNN
    from test_cross_level import CrossCfg

    class ServeCfg(CrossCfg):
        NAME = "servecfg"
        IMAGES_PER_GPU = 2
    cfg = ServeCfg()
    engine = MaskRCNN("inference", cfg, str(tmp_path))

    rng = np.random.RandomState(3)
    scenes = [(rng.rand(cfg.NUM_VIEWS, 64, 64, 3) * 255).astype(np.uint8)
              for _ in range(2)]
    Rcam = np.zeros((1, cfg.NUM_VIEWS, 3, 4), np.float32)
    Rcam[:, :, :3, :3] = np.eye(3)
    Rcam[:, 1, 0, 3] = 0.3
    Kmat = np.array([[[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]]],
                    np.float32)

    direct = engine.detect(scenes, Rcam=np.concatenate([Rcam, Rcam]),
                           Kmat=np.concatenate([Kmat, Kmat]))

    with MicroBatcher(engine, batch_size=2, max_delay_ms=500) as mb:
        futures = [mb.submit(s, Rcam=Rcam, Kmat=Kmat) for s in scenes]
        batched = [f.result(timeout=600) for f in futures]

    for d, b in zip(direct, batched):
        np.testing.assert_array_equal(d["class_ids"], b["class_ids"])
        np.testing.assert_allclose(d["scores"], b["scores"],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(d["rois"], b["rois"],
                                   rtol=1e-5, atol=1e-5)
