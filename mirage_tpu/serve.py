"""Model serving: dynamic request batching + a small HTTP server.

Production-deployment layer beyond the reference repo (which only ships the
`python mirage_wrapper.py` one-shot CLI, mirage_wrapper.py:269-313): TPUs
want large batches (BASELINE.md round-5 latency table: the flagship runs
261 img/s at batch 1 vs 877 at batch 64 / 898 at the batch-512 headline —
a single triplet costs 3.83 ms on-device), so the server coalesces
concurrent single-image
requests into one device dispatch.

Design: stdlib-only (http.server + threads + numpy). The model is a plain
callable `dict[str, np.ndarray] -> dict[str, np.ndarray]` over batched
arrays, so the batching/HTTP layers are testable without weights and any
wrapper (single-chip, multi-chip `mesh=`, features-only) plugs in.

Protocol (all bodies are npz — `np.savez` bytes):
  POST /v1/reconstruct   {modality: (1,H,W) | (H,W) float/int arrays}
                         -> {task: prediction array for this sample}
  POST /v1/features      same input -> {"features": (N+G, D)}
  GET  /healthz          -> JSON {status, device, n_params, pending}
  GET  /stats            -> JSON {requests, batches, mean_batch,
                                  latency_ms: {p50, p95, max}}
"""

from __future__ import annotations

import collections
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional

import numpy as np

# stats window: bounds memory/CPU on long-running servers
STATS_MAXLEN = 10_000


def _batch_signature(sample: Dict[str, np.ndarray]):
    """Modality-set + per-key shape/dtype signature. Only requests with
    identical signatures may be stacked into one model call: batch[0]'s keys
    would otherwise silently drop another request's extra modalities (wrong
    prediction) or crash the whole batch on a missing key / np.stack shape
    mismatch."""
    return tuple(sorted(
        (k, tuple(np.shape(v)), str(np.asarray(v).dtype))
        for k, v in sample.items()))


class _Pending:
    __slots__ = ("sample", "sig", "event", "result", "error", "t_submit")

    def __init__(self, sample):
        self.sample = sample
        self.sig = _batch_signature(sample)
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.perf_counter()


class BatchingQueue:
    """Coalesces concurrent single-sample requests into batched model calls.

    The dispatcher thread waits for the first request, then keeps collecting
    until `max_batch` samples are queued or `max_wait_ms` elapsed, stacks
    them on axis 0, runs `model_fn` ONCE, and fans the per-sample slices back
    to the waiting requests. Mirrors the standard accelerator-serving
    pattern; wrap `model_fn` in :func:`pow2_padded` to bound how many
    distinct batch shapes reach the compiler.
    """

    def __init__(self, model_fn: Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]],
                 max_batch: int = 16, max_wait_ms: float = 5.0):
        self.model_fn = model_fn
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        self._queue: List[_Pending] = []
        self._cond = threading.Condition()
        self._stop = False
        self.batch_sizes = collections.deque(maxlen=STATS_MAXLEN)
        self.latencies_s = collections.deque(maxlen=STATS_MAXLEN)
        self.n_requests = 0
        self.n_batches = 0
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()

    # -- client side --------------------------------------------------------

    def submit(self, sample: Dict[str, np.ndarray], timeout: float = 120.0):
        """Blocks until the sample's result is ready; returns the per-sample
        result dict. Raises whatever the model raised for its batch."""
        p = _Pending(sample)
        with self._cond:
            if self._stop:
                raise RuntimeError("server is shutting down")
            self._queue.append(p)
            self._cond.notify()
        if not p.event.wait(timeout):
            raise TimeoutError("model batch did not complete in time")
        if p.error is not None:
            raise p.error
        with self._cond:
            self.n_requests += 1
            self.latencies_s.append(time.perf_counter() - p.t_submit)
        return p.result

    def close(self):
        with self._cond:
            self._stop = True
            self._cond.notify()
        self._thread.join(timeout=5)

    # -- dispatcher ---------------------------------------------------------

    def _take_batch(self) -> List[_Pending]:
        with self._cond:
            while not self._queue and not self._stop:
                self._cond.wait()
            if self._stop and not self._queue:
                return []
            deadline = time.monotonic() + self.max_wait_s
            while (len(self._queue) < self.max_batch and not self._stop):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cond.wait(timeout=remaining)
            # Take only requests whose (modalities, shapes, dtypes) signature
            # matches the head of the queue; differently-shaped requests stay
            # queued and form the next batch.
            sig = self._queue[0].sig
            batch, rest = [], []
            for p in self._queue:
                if p.sig == sig and len(batch) < self.max_batch:
                    batch.append(p)
                else:
                    rest.append(p)
            self._queue[:] = rest
            return batch

    def _dispatch_loop(self):
        while True:
            batch = self._take_batch()
            if not batch:
                return
            try:
                stacked = {
                    k: np.stack([p.sample[k] for p in batch])
                    for k in batch[0].sample
                }
                out = self.model_fn(stacked)
                for i, p in enumerate(batch):
                    p.result = {k: np.asarray(v)[i] for k, v in out.items()}
            except BaseException as e:  # propagate to every waiter
                for p in batch:
                    p.error = e
            finally:
                with self._cond:
                    self.n_batches += 1
                    self.batch_sizes.append(len(batch))
                for p in batch:
                    p.event.set()


def pow2_padded(model_fn: Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]]
                ) -> Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]]:
    """Pad every batched call up to the next power of two (zeros), slice the
    outputs back.

    The dynamic batcher produces batch sizes 1..max_batch as load varies, and
    under jit EVERY novel batch shape is a fresh XLA compile of the full model
    (minutes of tunnel latency each on this image; the single-chip wrapper has
    no device-multiple to pad to — `MIRAGEWrapper._batch_multiple()` is 1).
    Padding to the power-of-two ladder bounds a long-running server to
    log2(max_batch)+1 compiled shapes, all pre-compilable by a startup warmup
    and replayed from the persistent compilation cache across restarts
    (cli/config.apply_compile_cache). Latency cost is bounded by the next
    ladder rung (BASELINE.md round-5 latency table: the rungs are ~1.7x
    apart in ms, far below one avoided 100s compile amortized over a run).
    """

    def fn(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        b = next(iter(batch.values())).shape[0]
        p = 1 << max(b - 1, 0).bit_length()
        if p == b:
            return model_fn(batch)
        padded = {
            k: np.concatenate(
                [v, np.zeros((p - b,) + v.shape[1:], dtype=v.dtype)])
            for k, v in batch.items()
        }
        out = model_fn(padded)
        return {k: np.asarray(v)[:b] for k, v in out.items()}

    return fn


def _encode_npz(arrays: Dict[str, np.ndarray]) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _decode_npz(body: bytes) -> Dict[str, np.ndarray]:
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class MIRAGEServer:
    """HTTP front for one or two batching queues (reconstruct / features)."""

    def __init__(self, reconstruct_fn=None, features_fn=None, *,
                 max_batch: int = 16, max_wait_ms: float = 5.0,
                 device: str = "unknown", n_params: int = 0,
                 request_timeout_s: float = 120.0):
        """request_timeout_s: how long a request waits for its batch. Must
        cover the worst cold XLA compile (minutes on novel shapes) if the
        server starts without --warmup; with warmup + the persistent
        compilation cache the default is generous."""
        assert reconstruct_fn is not None or features_fn is not None
        self.request_timeout_s = request_timeout_s
        self.queues: Dict[str, BatchingQueue] = {}
        if reconstruct_fn is not None:
            self.queues["/v1/reconstruct"] = BatchingQueue(
                reconstruct_fn, max_batch=max_batch, max_wait_ms=max_wait_ms)
        if features_fn is not None:
            self.queues["/v1/features"] = BatchingQueue(
                features_fn, max_batch=max_batch, max_wait_ms=max_wait_ms)
        self.device = device
        self.n_params = n_params
        self._httpd: Optional[ThreadingHTTPServer] = None

    # -- stats --------------------------------------------------------------

    def stats(self) -> Dict:
        """Counters are lifetime totals; latency percentiles / mean batch are
        over the last STATS_MAXLEN samples per queue (bounded memory).
        Snapshots are taken under each queue's lock: deque iteration raises
        RuntimeError if another thread appends mid-iteration."""
        sizes, lats = [], []
        for q in self.queues.values():
            with q._cond:
                sizes.extend(q.batch_sizes)
                lats.extend(q.latencies_s)
        lats.sort()

        def pct(p):
            return round(lats[min(len(lats) - 1, int(p * len(lats)))] * 1e3, 3) \
                if lats else None

        return {
            "requests": sum(q.n_requests for q in self.queues.values()),
            "batches": sum(q.n_batches for q in self.queues.values()),
            "mean_batch": round(sum(sizes) / len(sizes), 2) if sizes else None,
            "latency_ms": {"p50": pct(0.50), "p95": pct(0.95),
                           "max": round(lats[-1] * 1e3, 3) if lats else None},
        }

    def health(self) -> Dict:
        return {
            "status": "ok",
            "device": self.device,
            "n_params": self.n_params,
            "pending": sum(len(q._queue) for q in self.queues.values()),
        }

    # -- http ---------------------------------------------------------------

    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, json.dumps(server.health()).encode(),
                               "application/json")
                elif self.path == "/stats":
                    self._send(200, json.dumps(server.stats()).encode(),
                               "application/json")
                else:
                    self._send(404, b"{}", "application/json")

            def do_POST(self):
                q = server.queues.get(self.path)
                if q is None:
                    self._send(404, b"{}", "application/json")
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    sample = _decode_npz(self.rfile.read(n))
                    result = q.submit(sample,
                                      timeout=server.request_timeout_s)
                    self._send(200, _encode_npz(result), "application/npz")
                except Exception as e:  # noqa: BLE001 — report to client
                    self._send(500, json.dumps({"error": repr(e)}).encode(),
                               "application/json")

        return Handler

    def serve(self, host: str = "127.0.0.1", port: int = 8473,
              background: bool = False) -> ThreadingHTTPServer:
        self._httpd = ThreadingHTTPServer((host, port), self.make_handler())
        if background:
            threading.Thread(target=self._httpd.serve_forever,
                             daemon=True).start()
        else:
            self._httpd.serve_forever()
        return self._httpd

    def close(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
        for q in self.queues.values():
            q.close()
