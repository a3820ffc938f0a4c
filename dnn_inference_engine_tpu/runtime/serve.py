"""Continuous-batching serving loop (SURVEY.md section 2.9 N1, section 5).

Net-new scope vs the reference (which is batch-1 single-process): a
host-side request queue feeding fixed-size device batches. Requests are
padded to the compiled batch size (static shapes — one XLA program), and
per-request results resolve through futures. Multi-host deployment runs
one server per host with batch-sharded forwards (parallel/sharding.py);
this loop is the per-host component.

Observability (SURVEY.md section 5): structured per-batch stats —
images/s, queue depth, p50/p99 latency — exposed via ``stats()`` and an
optional /stats HTTP endpoint.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import numpy as np


class ContinuousBatcher:
    """Assembles incoming single-image requests into device batches."""

    def __init__(self, engine, max_batch: Optional[int] = None,
                 timeout_ms: Optional[float] = None):
        self.engine = engine
        self.max_batch = max_batch or engine.config.serve_max_batch
        self.timeout_s = (timeout_ms if timeout_ms is not None
                          else engine.config.serve_timeout_ms) / 1e3
        self.q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._lat_ms: List[float] = []
        self._lat_lock = threading.Lock()
        self._n_images = 0
        self._n_batches = 0
        self._t_start = None

    # -- client API ----------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """image: preprocessed (S, S, 3) f32. Resolves to (boxes, scores,
        classes) for this image."""
        fut: Future = Future()
        self.q.put((image, fut, time.perf_counter()))
        return fut

    def infer(self, image: np.ndarray, timeout: float = 30.0):
        return self.submit(image).result(timeout=timeout)

    # -- lifecycle -----------------------------------------------------

    def start(self):
        assert self._thread is None
        self._t_start = time.perf_counter()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    # -- batching loop -------------------------------------------------

    def _collect(self):
        """Blockingly grab 1 request, then greedily fill the batch until
        full or the assembly window closes."""
        try:
            first = self.q.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.timeout_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self.q.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _resolve(self, pending):
        """Sync a dispatched batch's device results and fulfil futures."""
        batch, res = pending
        try:
            boxes, scores, classes = tuple(np.asarray(t) for t in res)
        except Exception as e:                         # resolve, don't wedge
            for _img, fut, _t in batch:
                fut.set_exception(e)
            return
        now = time.perf_counter()
        with self._lat_lock:
            self._n_images += len(batch)
            self._n_batches += 1
            for i, (_img, fut, t0) in enumerate(batch):
                self._lat_ms.append((now - t0) * 1e3)
                if len(self._lat_ms) > 10000:
                    self._lat_ms = self._lat_ms[-5000:]
                fut.set_result((boxes[i], scores[i], classes[i]))

    def _loop(self):
        size = self.engine.config.input_size
        # depth-1 software pipeline: batch n is dispatched (async — JAX
        # queues the transfer + program) BEFORE batch n-1's results are
        # pulled to host, so host-side assembly + H2D of the next batch
        # overlap device execution + D2H of the previous one. Under the
        # sandbox relay (docs/RELAY.md: transfers dominate) this is the
        # difference between serialized and overlapped transfer cost; on
        # real PCIe it hides the entire host round trip.
        pending = None
        while not self._stop.is_set():
            # A dispatched batch with no follow-up work behind it must
            # resolve NOW — blocking in _collect first would delay its
            # futures by up to the 100 ms poll timeout (p99 regression
            # on the last batch of a burst).
            if pending is not None and self.q.empty():
                self._resolve(pending)
                pending = None
            batch = self._collect()
            if not batch:
                if pending is not None:
                    self._resolve(pending)
                    pending = None
                continue
            # ship uint8: 4x less host->device transfer; the engine
            # normalizes on device (f32 [0,1] inputs are converted here,
            # uint8 inputs pass through)
            x = np.zeros((self.max_batch, size, size, 3), np.uint8)
            for i, (img, _f, _t) in enumerate(batch):
                if img.dtype == np.uint8:
                    x[i] = img
                else:
                    x[i] = np.clip(np.round(img * 255.0), 0, 255
                                   ).astype(np.uint8)
            try:
                res = self.engine.detect_device(x)
            except Exception as e:                     # resolve, don't wedge
                for _img, fut, _t in batch:
                    fut.set_exception(e)
                continue
            if pending is not None:
                self._resolve(pending)
            pending = (batch, res)
        if pending is not None:
            self._resolve(pending)

    # -- observability -------------------------------------------------

    def stats(self) -> dict:
        with self._lat_lock:
            lat = np.asarray(self._lat_ms[-2000:], np.float64)
            elapsed = (time.perf_counter() - self._t_start
                       if self._t_start else 0.0)
            return {
                "images": self._n_images,
                "batches": self._n_batches,
                "queue_depth": self.q.qsize(),
                "images_per_s": self._n_images / elapsed if elapsed else 0.0,
                "avg_batch_fill": (self._n_images / self._n_batches
                                   if self._n_batches else 0.0),
                "p50_ms": float(np.percentile(lat, 50)) if lat.size else None,
                "p99_ms": float(np.percentile(lat, 99)) if lat.size else None,
            }

    def serve_http(self, port: int = 8000):
        """HTTP ingestion + observability surface:

        - ``POST /detect``: request body = encoded image (JPEG/PNG/BMP —
          anything PIL decodes) or a raw ``.npy`` array (H,W,3 uint8).
          Blocks through the batcher and returns detections as JSON in
          ORIGINAL image coordinates.
        - ``GET /stats``: per-batch serving metrics (images/s, queue
          depth, p50/p99 latency).
        - ``GET /healthz``: liveness.
        """
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        batcher = self

        def _decode_image(data: bytes):
            if data[:6] == b"\x93NUMPY":
                import io
                arr = np.load(io.BytesIO(data), allow_pickle=False)
                return np.asarray(arr)
            import io
            from PIL import Image
            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))

        class H(BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path not in ("/stats", "/healthz"):
                    self.send_response(404); self.end_headers(); return
                self._reply(200, batcher.stats() if self.path == "/stats"
                            else {"ok": True})

            def do_POST(self):
                if self.path != "/detect":
                    self.send_response(404); self.end_headers(); return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    img = _decode_image(self.rfile.read(n))
                    from dnn_inference_engine_tpu.config import VOC_CLASSES
                    from dnn_inference_engine_tpu.preprocess import (
                        boxes_to_original, preprocess_image)
                    x, meta = preprocess_image(
                        img, batcher.engine.config.input_size)
                    boxes, scores, classes = batcher.infer(x)
                    keep = scores > 0
                    orig = boxes_to_original(boxes[keep], meta)
                    self._reply(200, {
                        "boxes": orig.tolist(),
                        "scores": scores[keep].tolist(),
                        "classes": classes[keep].tolist(),
                        "names": [VOC_CLASSES[c] if c < len(VOC_CLASSES)
                                  else str(c) for c in classes[keep]],
                    })
                except Exception as e:            # bad image, engine error
                    self._reply(400, {"error": f"{type(e).__name__}: {e}"})

            def _reply(self, code: int, obj: dict):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = ThreadingHTTPServer(("0.0.0.0", port), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv
