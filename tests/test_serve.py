"""Serving layer: dynamic batching + HTTP protocol (mirage_tpu/serve.py)."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest


def _post(url, arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        body = r.read()
    with np.load(io.BytesIO(body), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def test_batching_queue_coalesces_and_fans_out():
    from mirage_tpu.serve import BatchingQueue

    calls = []

    def model(batch):
        calls.append(batch["x"].shape[0])
        time.sleep(0.01)  # let the queue fill while a batch is in flight
        return {"y": batch["x"] * 2.0}

    q = BatchingQueue(model, max_batch=4, max_wait_ms=20)
    results = [None] * 10

    def worker(i):
        results[i] = q.submit({"x": np.full((3,), float(i), np.float32)})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    q.close()

    for i in range(10):
        np.testing.assert_allclose(results[i]["y"], np.full((3,), 2.0 * i))
    assert sum(calls) == 10
    assert max(calls) <= 4
    assert len(calls) < 10, "requests were never coalesced into batches"


def test_batching_queue_propagates_model_errors():
    from mirage_tpu.serve import BatchingQueue

    def model(batch):
        raise ValueError("boom")

    q = BatchingQueue(model, max_batch=2, max_wait_ms=1)
    with pytest.raises(ValueError, match="boom"):
        q.submit({"x": np.zeros((2,), np.float32)})
    q.close()


def test_http_server_end_to_end():
    from mirage_tpu.serve import MIRAGEServer

    def reconstruct(batch):
        # stub model: per-task outputs with a batch-dependent stamp
        b = batch["bscan"].shape[0]
        return {"bscan": batch["bscan"] + 1.0,
                "meta": np.full((b,), float(b), np.float32)}

    server = MIRAGEServer(reconstruct_fn=reconstruct, max_batch=8,
                          max_wait_ms=10, device="cpu-test", n_params=123)
    httpd = server.serve(port=0, background=True)  # ephemeral port
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        outs = [None] * 6

        def worker(i):
            outs[i] = _post(f"{base}/v1/reconstruct",
                            {"bscan": np.full((4, 4), float(i), np.float32)})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(6):
            np.testing.assert_allclose(outs[i]["bscan"],
                                       np.full((4, 4), i + 1.0))

        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["n_params"] == 123
        with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 6
        assert stats["batches"] <= 6
        assert stats["latency_ms"]["p95"] is not None
    finally:
        server.close()


def test_serve_cli_model_fns_shapes():
    """make_model_fns adapts (B,H,W) image batches / int layermaps to the
    wrapper input contract."""
    from mirage_tpu.cli.serve import make_model_fns

    seen = {}

    class FakeWrapper:
        in_domains = ["bscan", "bscanlayermap"]

        def __call__(self, x):
            import jax.numpy as jnp

            seen.update({k: (v.shape, v.dtype) for k, v in x.items()})
            return {"bscan": jnp.zeros((x["bscan"].shape[0], 1, 8, 8))}

        def features(self, x):
            import jax.numpy as jnp

            return jnp.zeros((x["bscan"].shape[0], 5, 16))

    rec, feat = make_model_fns(FakeWrapper(), ["bscan", "bscanlayermap"])
    out = rec({"bscan": np.zeros((2, 8, 8), np.float32),
               "bscanlayermap": np.zeros((2, 4, 4), np.int64)})
    assert out["bscan"].shape == (2, 1, 8, 8)
    assert seen["bscan"][0] == (2, 1, 8, 8)
    assert str(seen["bscanlayermap"][1]) == "int32"
    assert feat({"bscan": np.zeros((3, 8, 8), np.float32)})["features"].shape \
        == (3, 5, 16)
    with pytest.raises(ValueError, match="unknown modality"):
        rec({"slo": np.zeros((1, 8, 8), np.float32)})


def test_batching_queue_buckets_by_signature():
    """Requests with different modality sets / shapes are never stacked into
    one model call (ADVICE r2: batch[0]'s keys silently dropped other
    requests' modalities or crashed the whole batch)."""
    from mirage_tpu.serve import BatchingQueue

    seen = []

    def model(batch):
        seen.append(tuple(sorted(batch)))
        time.sleep(0.02)  # force the mixed requests to queue up together
        return {k: v + 1.0 for k, v in batch.items()}

    q = BatchingQueue(model, max_batch=8, max_wait_ms=30)
    results = {}

    def worker(i):
        if i % 2:
            sample = {"bscan": np.full((4, 4), float(i), np.float32),
                      "slo": np.full((4, 4), float(i), np.float32)}
        else:
            sample = {"bscan": np.full((2, 2), float(i), np.float32)}
        results[i] = (sample, q.submit(sample))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    q.close()

    for i, (sample, out) in results.items():
        assert set(out) == set(sample), (i, set(out), set(sample))
        for k, v in sample.items():
            np.testing.assert_allclose(out[k], v + 1.0)
    # every model call saw a homogeneous batch
    assert all(s in ((("bscan",)), ("bscan", "slo")) for s in seen)


def test_pow2_padded_bounds_compiled_shapes():
    from mirage_tpu.serve import pow2_padded

    seen_sizes = []

    def model(batch):
        b = batch["x"].shape[0]
        seen_sizes.append(b)
        # padding rows must be zeros (the wrapper's zero-fill semantics)
        if b > 3:
            np.testing.assert_array_equal(batch["x"][3:], 0)
        return {"y": batch["x"] * 2.0, "z": batch["x"].sum(axis=1)}

    fn = pow2_padded(model)
    for b in range(1, 9):
        x = np.arange(b * 4, dtype=np.float32).reshape(b, 4) + 1.0
        x = np.minimum(x, 0.0) if b > 3 else x  # keep rows >=3 zero-checkable
        out = fn({"x": x if b <= 3 else np.zeros((b, 4), np.float32)})
        assert out["y"].shape == (b, 4)
        assert out["z"].shape == (b,)
        if b <= 3:
            np.testing.assert_allclose(out["y"], x * 2.0)
    # batch sizes 1..8 reach the model only as the power-of-two ladder
    assert set(seen_sizes) == {1, 2, 4, 8}


def test_pow2_padded_exact_pow2_passthrough():
    from mirage_tpu.serve import pow2_padded

    def model(batch):
        return {"y": batch["x"] + 1.0}

    fn = pow2_padded(model)
    x = np.ones((4, 2), np.float32)
    np.testing.assert_allclose(fn({"x": x})["y"], x + 1.0)


def test_serve_cli_warmup_covers_ladder():
    from mirage_tpu.cli.serve import warmup
    from mirage_tpu.serve import pow2_padded

    class StubWrapper:
        in_domains = ["bscan", "bscanlayermap"]
        input_size = {"bscan": (8, 8), "bscanlayermap": (4, 4)}

    seen = []

    def model(batch):
        assert batch["bscan"].shape[1:] == (1, 8, 8)
        assert batch["bscanlayermap"].dtype == np.int32
        seen.append(batch["bscan"].shape[0])
        return {"y": batch["bscan"]}

    warmup(StubWrapper(), [pow2_padded(model)], max_batch=6, pow2=True)
    # largest-first ladder covering max_batch=6: 8, 4, 2, 1
    assert seen == [8, 4, 2, 1]

    seen.clear()
    warmup(StubWrapper(), [model], max_batch=3, pow2=False)
    assert seen == [3, 2, 1]


def test_request_timeout_plumbed_to_submit():
    import urllib.error
    from mirage_tpu.serve import MIRAGEServer

    def slow_model(batch):
        time.sleep(0.5)
        return {"y": batch["x"]}

    srv = MIRAGEServer(reconstruct_fn=slow_model, max_batch=2, max_wait_ms=1,
                       request_timeout_s=0.05)
    httpd = srv.serve(port=8717, background=True)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post("http://127.0.0.1:8717/v1/reconstruct",
                  {"x": np.ones((2,), np.float32)})
        assert ei.value.code == 500
    finally:
        srv.close()
