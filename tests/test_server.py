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


class TestAdversarialServing:
    """Hostile-input hardening (VERDICT r3 #8): the serving daemon is
    the one internet-facing subsystem; every failure here must be a
    clean status code with the worker thread and daemon intact."""

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
        yield url, predictor, cfg, server, batcher
        server.shutdown()
        batcher.close()

    def _post_raw(self, url, body, timeout=60):
        req = urllib.request.Request(url + "/predict", data=body,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, r.read()

    def _npz(self, **arrays):
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return buf.getvalue()

    def _good(self, cfg, n=1, seed=0):
        rng = np.random.RandomState(seed)
        return (rng.randint(0, 255, (n, 64, 64, 3), np.uint8),
                (rng.rand(n, 1, cfg.audio_samples).astype(np.float32) - 0.5))

    def test_oversized_batch_is_400(self, served):
        """One request above max_request_frames (4x the compiled bucket)
        would monopolize the single worker for its whole chunk loop —
        fail fast instead of queueing it."""
        url, _, cfg, _, batcher = served
        n = batcher.max_request_frames + 1
        img, wav = self._good(cfg, n)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(url, self._npz(images=img, waveforms=wav))
        assert err.value.code == 400
        assert "limit" in err.value.read().decode()

    def test_huge_content_length_is_413_without_reading(self, served):
        """A Content-Length above the body cap is rejected before any
        byte of the body is read into RAM."""
        import http.client

        url, *_ = served
        host = url.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=30)
        try:
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Length", str(1 << 40))  # 1 TiB claim
            conn.endheaders()
            # send nothing further; the server must answer from the
            # header alone
            resp = conn.getresponse()
            assert resp.status == 413
        finally:
            conn.close()

    def test_negative_content_length_is_400_without_reading(self, served):
        """A negative Content-Length must not bypass the body cap:
        read(-1) would buffer the whole stream (unbounded RAM / hang)."""
        import http.client

        url, *_ = served
        host = url.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=30)
        try:
            conn.putrequest("POST", "/predict")
            conn.putheader("Content-Length", "-1")
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
        finally:
            conn.close()

    def test_pickle_payload_is_400(self, served):
        """npz bodies must never reach pickle: an object-array archive
        is refused (allow_pickle=False) as a 400, not executed."""
        url, _, cfg, _, _ = served
        img, wav = self._good(cfg)
        buf = io.BytesIO()
        np.savez(buf, images=np.array([{"rce": "attempt"}], dtype=object),
                 waveforms=wav)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(url, buf.getvalue())
        assert err.value.code == 400

    def test_missing_key_is_400(self, served):
        url, _, cfg, _, _ = served
        img, _ = self._good(cfg)
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(url, self._npz(images=img))
        assert err.value.code == 400

    def test_empty_batch_is_400(self, served):
        url, _, cfg, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as err:
            self._post_raw(url, self._npz(
                images=np.zeros((0, 64, 64, 3), np.uint8),
                waveforms=np.zeros((0, 1, cfg.audio_samples), np.float32)))
        assert err.value.code == 400

    def test_nonfinite_audio_is_served_not_crashed(self, served):
        """NaN/Inf inputs are a client-data problem, not a daemon
        problem: the request completes with a well-shaped mask and the
        next valid request still works."""
        url, _, cfg, _, _ = served
        img, wav = self._good(cfg)
        wav[:] = np.nan
        wav[0, 0, :100] = np.inf
        status, body = self._post_raw(url, self._npz(images=img,
                                                     waveforms=wav))
        assert status == 200
        out = dict(np.load(io.BytesIO(body)))
        assert out["mask"].shape == (1, 64, 64)
        img2, wav2 = self._good(cfg, seed=3)
        status, _ = self._post_raw(url, self._npz(images=img2,
                                                  waveforms=wav2))
        assert status == 200

    def test_client_disconnect_midreply_survives(self, served):
        """A client that sends a request and slams the connection must
        not kill the handler thread or the daemon."""
        import socket

        url, _, cfg, _, _ = served
        host, port = url.split("//")[1].split(":")
        img, wav = self._good(cfg)
        body = self._npz(images=img, waveforms=wav)
        s = socket.create_connection((host, int(port)), timeout=30)
        s.sendall(b"POST /predict HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: %d\r\n\r\n" % len(body) + body)
        s.close()  # gone before the reply is written
        time.sleep(0.3)
        status, _ = self._post_raw(url, body)  # daemon still up
        assert status == 200

    def test_concurrent_warmup_compiles_each_bucket_once(self, served):
        """warmup() is advertised idempotent + thread-safe: racing
        callers serialize and each bucket's predict runs exactly once."""
        _, predictor, _, _, _ = served
        calls = []
        real_predict = predictor.predict
        predictor._warmed = False
        predictor.predict = lambda i, w: calls.append(i.shape[0]) or \
            real_predict(i, w)
        try:
            with ThreadPoolExecutor(4) as pool:
                list(pool.map(lambda _: predictor.warmup(), range(4)))
        finally:
            del predictor.predict  # restore the bound method
        assert predictor._warmed
        assert calls == [b for b in predictor.batch_sizes], calls

    def test_close_midflight_drains_inflight_requests(self):
        """Batcher shutdown during traffic: everything already
        submitted resolves (result or exception), close() returns, no
        hang."""
        gate = threading.Event()

        def slow_predict(images, waves):
            gate.wait(5)
            return {"mask": np.zeros(images.shape[0], np.int32)}

        b = DynamicBatcher(slow_predict, max_batch=2, max_wait_ms=10.0)
        futs = [b.submit(np.zeros((1, 4, 4, 3), np.uint8),
                         np.zeros((1, 1, 16), np.float32))
                for _ in range(5)]
        time.sleep(0.05)
        gate.set()
        b.close()
        done = [f.result(timeout=5) for f in futs]
        assert all(d["mask"].shape == (1,) for d in done)
