"""HTTP serving daemon with dynamic request batching.

The reference has no deployment surface at all — its eval entry points
(`test_avs_semantic.py`, `test_avss_resize.py`) are research loops over
a DataLoader. This module is the production half that
:class:`cavp_tpu.engine.predictor.Predictor` needs to be a service:

- **Dynamic batching**: concurrent requests are coalesced into one
  device batch (first arrival opens a window of ``max_wait_ms``; the
  batch closes when ``max_batch`` frames are gathered or the window
  expires), so single-frame clients still drive the TPU at batched
  throughput.
- **stdlib-only transport**: ``http.server.ThreadingHTTPServer`` with an
  npz wire format (``numpy.savez`` request/response bodies) — no web
  framework dependency to pin.

Wire protocol:
  POST /predict  body: npz {images: [N,H,W,3] uint8,
                            waveforms: [N,C,L] float32}
                 reply: npz {mask: [N,H,W] int32, probs?: [N,H,W,K] f32}
  GET  /healthz  200 "ok" once the model is warmed up
  GET  /stats    JSON {requests, frames, batches, mean_batch, ...}
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple

import numpy as np


class _WorkItem:
    __slots__ = ("images", "waveforms", "future")

    def __init__(self, images: np.ndarray, waveforms: np.ndarray):
        self.images = images
        self.waveforms = waveforms
        self.future: Future = Future()


class DynamicBatcher:
    """Coalesces concurrent prediction requests into device batches.

    ``predict_fn(images, waveforms) -> dict`` is called from a single
    worker thread (jax dispatch is not thread-hostile, but one in-flight
    batch at a time keeps latency predictable); results are split back
    per request and delivered through futures.
    """

    def __init__(self, predict_fn, max_batch: int = 8,
                 max_wait_ms: float = 5.0, expected_shapes=None,
                 max_request_frames: Optional[int] = None):
        self._predict = predict_fn
        # ((H, W, 3), (Cin, L)) — when set, submit() rejects off-shape
        # requests up front: coalescing mixed shapes would crash the
        # worker on concatenate, and each stray shape would trigger a
        # fresh device compile inside the single batching thread
        self.expected_shapes = expected_shapes
        self.max_batch = int(max_batch)
        # one request may legitimately exceed the largest compiled
        # bucket (predict chunks it), but an unbounded N monopolizes
        # the single worker thread for the whole chunk loop while every
        # other client waits — cap it and fail fast instead
        self.max_request_frames = (int(max_request_frames)
                                   if max_request_frames is not None
                                   else 4 * self.max_batch)
        self.max_wait = float(max_wait_ms) / 1000.0
        self._q: "queue.Queue[Optional[_WorkItem]]" = queue.Queue()
        self._carry: Optional[_WorkItem] = None  # overflow item -> next batch
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "frames": 0, "batches": 0,
                      "batch_frames": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, images: np.ndarray, waveforms: np.ndarray) -> Future:
        if images.ndim != 4 or waveforms.ndim != 3:
            raise ValueError("images must be [N,H,W,3], waveforms [N,C,L]")
        if images.shape[0] != waveforms.shape[0]:
            raise ValueError("images/waveforms batch mismatch")
        if images.shape[0] == 0:
            raise ValueError("empty batch")
        if images.shape[0] > self.max_request_frames:
            raise ValueError(
                f"request batch {images.shape[0]} exceeds the per-request "
                f"limit {self.max_request_frames}; split the request")
        if self.expected_shapes is not None:
            img_shape, wav_shape = self.expected_shapes
            if tuple(images.shape[1:]) != tuple(img_shape):
                raise ValueError(
                    f"image shape {tuple(images.shape[1:])} != served "
                    f"{tuple(img_shape)}")
            if tuple(waveforms.shape[1:]) != tuple(wav_shape):
                raise ValueError(
                    f"waveform shape {tuple(waveforms.shape[1:])} != "
                    f"served {tuple(wav_shape)}")
        item = _WorkItem(np.ascontiguousarray(images),
                         np.ascontiguousarray(waveforms))
        with self._lock:
            self.stats["requests"] += 1
            self.stats["frames"] += int(images.shape[0])
        self._q.put(item)
        return item.future

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _gather(self) -> Optional[List[_WorkItem]]:
        """Block for the first request, then hold the window open. An
        item that would push the batch past ``max_batch`` (the largest
        compiled bucket) is carried into the next batch instead — an
        oversized device batch would silently chunk + pad inside
        ``predict``, doubling latency for exactly the coalescing case
        the batcher exists to optimize."""
        if self._carry is not None:
            first, self._carry = self._carry, None
        else:
            first = self._q.get()
            if first is None:
                return None
        items, frames = [first], first.images.shape[0]
        deadline = time.monotonic() + self.max_wait
        while frames < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post shutdown for the outer loop
                break
            if frames + nxt.images.shape[0] > self.max_batch:
                self._carry = nxt
                break
            items.append(nxt)
            frames += nxt.images.shape[0]
        return items

    def _loop(self):
        while True:
            items = self._gather()
            if items is None:
                return
            try:
                # inside the try: a mixed-shape concatenate failure must
                # fail the requests, never kill the worker thread
                images = np.concatenate([it.images for it in items])
                waves = np.concatenate([it.waveforms for it in items])
                out = self._predict(images, waves)
            except Exception as exc:  # deliver the failure per request
                for it in items:
                    it.future.set_exception(exc)
                continue
            with self._lock:
                self.stats["batches"] += 1
                self.stats["batch_frames"] += int(images.shape[0])
            start = 0
            for it in items:
                n = it.images.shape[0]
                it.future.set_result(
                    {k: v[start:start + n] for k, v in out.items()})
                start += n


def _npz_bytes(arrays: dict) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    server_version = "cavp-tpu-serve/1.0"
    batcher: DynamicBatcher = None  # set by make_server
    # generous: the first round over a remote-TPU transport can take
    # tens of seconds even after warmup
    timeout_s: float = 300.0
    # hard cap on the request body read into host RAM; sized by
    # make_server from the served shapes (a malicious Content-Length
    # must not be able to balloon the process)
    max_body_bytes: int = 1 << 28

    def log_message(self, fmt, *args):  # quiet; stats endpoint instead
        pass

    def _reply(self, code: int, body: bytes, ctype: str):
        # a client that disconnects mid-reply must not kill the handler
        # thread with an unhandled BrokenPipeError traceback
        try:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except (BrokenPipeError, ConnectionResetError):
            self.close_connection = True

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, b"ok", "text/plain")
        elif self.path == "/stats":
            st = dict(self.batcher.stats)
            st["mean_batch"] = (st["batch_frames"] / st["batches"]
                                if st["batches"] else 0.0)
            self._reply(200, json.dumps(st).encode(), "application/json")
        else:
            self._reply(404, b"not found", "text/plain")

    def do_POST(self):
        if self.path != "/predict":
            self._reply(404, b"not found", "text/plain")
            return
        # 400 only for a malformed request; server-side faults are 5xx so
        # clients/load balancers don't blame (and drop) a valid request
        try:
            length = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            self._reply(400, b'{"error": "bad Content-Length"}',
                        "application/json")
            return
        if length <= 0:
            # a negative length would skip the 413 cap below and make
            # rfile.read(-1) buffer the whole stream (unbounded)
            self._reply(400, b'{"error": "bad Content-Length"}',
                        "application/json")
            return
        if length > self.max_body_bytes:
            self._reply(413, json.dumps(
                {"error": f"body {length}B exceeds "
                          f"{self.max_body_bytes}B limit"}).encode(),
                "application/json")
            return
        try:
            # allow_pickle stays False (also numpy's default): a npz
            # body must never be able to execute pickle payloads
            payload = np.load(io.BytesIO(self.rfile.read(length)),
                              allow_pickle=False)
            images = np.asarray(payload["images"], np.uint8)
            waveforms = np.asarray(payload["waveforms"], np.float32)
            fut = self.batcher.submit(images, waveforms)
        except Exception as exc:
            self._reply(400, json.dumps({"error": str(exc)}).encode(),
                        "application/json")
            return
        try:
            out = fut.result(timeout=self.timeout_s)
        except FuturesTimeout:
            self._reply(504, json.dumps(
                {"error": f"prediction exceeded {self.timeout_s}s"}).encode(),
                "application/json")
            return
        except Exception as exc:
            self._reply(500, json.dumps(
                {"error": repr(exc)}).encode(), "application/json")
            return
        self._reply(200, _npz_bytes(out), "application/octet-stream")


def make_server(predictor, host: str = "127.0.0.1", port: int = 0,
                max_batch: Optional[int] = None, max_wait_ms: float = 5.0,
                max_request_frames: Optional[int] = None
                ) -> Tuple[ThreadingHTTPServer, DynamicBatcher]:
    """Build (but do not start) the HTTP server around a warmed Predictor.

    ``max_batch`` defaults to the predictor's largest compiled bucket so
    coalesced batches never trigger chunking inside ``predict``.
    """
    if max_batch is None:
        max_batch = max(getattr(predictor, "batch_sizes", [8]))
    shapes = None
    if hasattr(predictor, "expected_shapes"):
        shapes = predictor.expected_shapes()
    batcher = DynamicBatcher(predictor.predict, max_batch=max_batch,
                             max_wait_ms=max_wait_ms,
                             expected_shapes=shapes,
                             max_request_frames=max_request_frames)
    # body cap: the largest legal request (uint8 images + f32 waves at
    # the served shapes, npz-uncompressed) plus generous container
    # overhead; unknown shapes fall back to the class default
    attrs = {"batcher": batcher}
    if shapes is not None:
        (ih, iw, ic), (wc, wl) = shapes
        frame = ih * iw * ic + wc * wl * 4
        attrs["max_body_bytes"] = 2 * batcher.max_request_frames * frame \
            + (1 << 20)
    handler = type("BoundHandler", (_Handler,), attrs)
    server = ThreadingHTTPServer((host, port), handler)
    return server, batcher


def serve(predictor, host: str = "0.0.0.0", port: int = 8000,
          max_batch: Optional[int] = None, max_wait_ms: float = 5.0):
    """Blocking entry point: warm the buckets, then serve forever."""
    predictor.warmup()
    server, _ = make_server(predictor, host, port, max_batch, max_wait_ms)
    print(f"serving on http://{host}:{server.server_address[1]} "
          f"(max_batch={max_batch or max(predictor.batch_sizes)}, "
          f"window={max_wait_ms}ms)")
    server.serve_forever()
