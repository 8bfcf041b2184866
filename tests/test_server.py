"""Serving daemon: dynamic batching + HTTP wire protocol."""

import io
import json
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from cavp_tpu.config import get_config
from cavp_tpu.engine.predictor import Predictor
from cavp_tpu.engine.server import DynamicBatcher, make_server


class TestDynamicBatcher:
    def test_coalesces_concurrent_requests(self):
        seen = []
        gate = threading.Event()

        def slow_predict(images, waves):
            gate.wait(5)  # hold the first batch until all submits land
            seen.append(images.shape[0])
            return {"mask": np.arange(images.shape[0], dtype=np.int32)}

        b = DynamicBatcher(slow_predict, max_batch=8, max_wait_ms=200.0)
        futs = [b.submit(np.zeros((1, 4, 4, 3), np.uint8),
                         np.zeros((1, 1, 16), np.float32))
                for _ in range(4)]
        time.sleep(0.05)  # let all four enqueue into one window
        gate.set()
        outs = [f.result(timeout=5) for f in futs]
        b.close()
        # per-request results carry that request's slice
        assert all(o["mask"].shape == (1,) for o in outs)
        assert sorted(int(o["mask"][0]) for o in outs) == [0, 1, 2, 3]
        assert max(seen) >= 2, f"no coalescing happened: {seen}"
        assert b.stats["requests"] == 4 and b.stats["frames"] == 4

    def test_error_propagates_per_request(self):
        def boom(images, waves):
            raise RuntimeError("nope")

        b = DynamicBatcher(boom, max_batch=4, max_wait_ms=1.0)
        fut = b.submit(np.zeros((1, 4, 4, 3), np.uint8),
                       np.zeros((1, 1, 16), np.float32))
        with pytest.raises(RuntimeError):
            fut.result(timeout=5)
        b.close()

    def test_shape_validation(self):
        b = DynamicBatcher(lambda i, w: {"mask": np.zeros(1)}, 4, 1.0)
        with pytest.raises(ValueError):
            b.submit(np.zeros((4, 4, 3), np.uint8),
                     np.zeros((1, 1, 16), np.float32))
        b.close()

    def test_overflow_item_carries_to_next_batch(self):
        """A request that would push the batch past max_batch (the
        largest compiled bucket) must NOT be merged — an oversized batch
        silently chunks+pads inside predict."""
        seen = []
        gate = threading.Event()

        def slow_predict(images, waves):
            gate.wait(5)
            seen.append(images.shape[0])
            return {"mask": np.zeros(images.shape[0], np.int32)}

        b = DynamicBatcher(slow_predict, max_batch=8, max_wait_ms=200.0)
        futs = [b.submit(np.zeros((5, 4, 4, 3), np.uint8),
                         np.zeros((5, 1, 16), np.float32))
                for _ in range(2)]
        time.sleep(0.05)
        gate.set()
        for f in futs:
            assert f.result(timeout=5)["mask"].shape == (5,)
        b.close()
        assert seen == [5, 5], f"batches were {seen}, expected [5, 5]"


class TestHTTPServer:
    @pytest.fixture(scope="class")
    def served(self):
        cfg = get_config("avss").replace(
            image_width=64, image_height=64, num_classes=5,
            compute_dtype="float32", visual_backbone=18)
        predictor = Predictor(cfg, batch_sizes=(4,)).warmup()
        server, batcher = make_server(predictor, port=0, max_wait_ms=20.0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        yield url, predictor, cfg
        server.shutdown()
        batcher.close()

    def _post(self, url, images, waves):
        buf = io.BytesIO()
        np.savez(buf, images=images, waveforms=waves)
        req = urllib.request.Request(url + "/predict", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            return dict(np.load(io.BytesIO(r.read())))

    def test_predict_matches_direct_call(self, served):
        url, predictor, cfg = served
        rng = np.random.RandomState(0)
        images = rng.randint(0, 255, (2, 64, 64, 3), np.uint8)
        waves = (rng.rand(2, 1, cfg.audio_samples).astype(np.float32) - 0.5)
        out = self._post(url, images, waves)
        direct = predictor.predict(images, waves)
        np.testing.assert_array_equal(out["mask"], direct["mask"])

    def test_concurrent_clients_and_stats(self, served):
        url, predictor, cfg = served
        rng = np.random.RandomState(1)
        images = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
        waves = (rng.rand(1, 1, cfg.audio_samples).astype(np.float32) - 0.5)
        with ThreadPoolExecutor(4) as pool:
            outs = list(pool.map(
                lambda _: self._post(url, images, waves), range(4)))
        ref = outs[0]["mask"]
        for o in outs[1:]:
            np.testing.assert_array_equal(o["mask"], ref)
        with urllib.request.urlopen(url + "/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["frames"] >= 6 and stats["batches"] >= 1
        with urllib.request.urlopen(url + "/healthz", timeout=10) as r:
            assert r.read() == b"ok"

    def test_bad_payload_is_400(self, served):
        url, _, _ = served
        req = urllib.request.Request(url + "/predict", data=b"garbage",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=10)
        assert err.value.code == 400

    def test_off_shape_request_is_400_and_server_survives(self, served):
        """A wrong-resolution request must be rejected up front (each
        stray shape would recompile; coalescing mixed shapes would crash
        the batcher thread) and must NOT take the daemon down."""
        url, predictor, cfg = served
        rng = np.random.RandomState(7)
        bad_img = rng.randint(0, 255, (1, 32, 32, 3), np.uint8)
        wav = (rng.rand(1, 1, cfg.audio_samples).astype(np.float32))
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post(url, bad_img, wav)
        assert err.value.code == 400
        # the daemon still serves valid requests afterwards
        good = rng.randint(0, 255, (1, 64, 64, 3), np.uint8)
        out = self._post(url, good, wav)
        assert out["mask"].shape == (1, 64, 64)


class TestHTTPStatusCodes:
    """Server-side faults must be 5xx, not 400 (clients would treat the
    request as malformed and drop it)."""

    def _serve(self, predict_fn, timeout_s=60.0):
        from cavp_tpu.engine.server import DynamicBatcher, _Handler
        from http.server import ThreadingHTTPServer

        batcher = DynamicBatcher(predict_fn, max_batch=4, max_wait_ms=1.0)
        handler = type("H", (_Handler,), {"batcher": batcher,
                                          "timeout_s": timeout_s})
        server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, batcher, f"http://127.0.0.1:{server.server_address[1]}"

    def _post(self, url):
        buf = io.BytesIO()
        np.savez(buf, images=np.zeros((1, 4, 4, 3), np.uint8),
                 waveforms=np.zeros((1, 1, 16), np.float32))
        req = urllib.request.Request(url + "/predict", data=buf.getvalue(),
                                     method="POST")
        return urllib.request.urlopen(req, timeout=20)

    def test_predict_error_is_500(self):
        def boom(i, w):
            raise RuntimeError("device fell over")

        server, batcher, url = self._serve(boom)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post(url)
        assert err.value.code == 500
        assert "device fell over" in err.value.read().decode()
        server.shutdown()
        batcher.close()

    def test_timeout_is_504(self):
        ev = threading.Event()

        def slow(i, w):
            ev.wait(10)
            return {"mask": np.zeros(1, np.int32)}

        server, batcher, url = self._serve(slow, timeout_s=0.2)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post(url)
        assert err.value.code == 504
        ev.set()
        server.shutdown()
        batcher.close()
