"""Request micro-batching tests (serve.batching.MicroBatcher)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model

    tmp = tmp_path_factory.mktemp("batching")
    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return export_model(params, model, tmp, step=1)


def _request(i, n=1):
    rng = np.random.default_rng(i)
    return {
        "user_id": rng.integers(0, 900, n),
        "item_id": rng.integers(0, 1600, n),
        "age": rng.integers(10, 70, n),
        "gender": np.array(["F", "M"][i % 2], dtype=object).repeat(n),
        "occupation": np.array("student", dtype=object).repeat(n),
        "zipcode": np.array(str(10000 + i), dtype=object).repeat(n),
        "release_year": rng.integers(1930, 1998, n),
    }


def test_coalesced_batch_matches_direct(export_dir):
    """Drain logic (no dispatcher thread): 3 queued requests of different
    sizes become ONE device batch; per-request slices equal direct predicts."""
    from rectpu.serve.batching import MicroBatcher, _Pending
    from rectpu.serve.export import load_model

    served = load_model(export_dir)
    mb = MicroBatcher(served, max_delay_ms=50.0, start=False)
    reqs = [_request(0, 1), _request(1, 3), _request(2, 2)]
    items = []
    for r in reqs:
        b = served.encode_request(r)
        it = _Pending(b, b["cat_ids"].shape[0])
        items.append(it)
        mb._queue.append(it)
    got = mb._take_batch()
    assert len(got) == 3
    mb._dispatch(got)
    assert mb.batches_dispatched == 1
    assert mb.requests_served == 3
    assert mb.rows_dispatched == 6
    for r, it in zip(reqs, items):
        assert it.error is None
        direct = served.predict(r)
        np.testing.assert_allclose(
            it.result["probabilities"], direct["probabilities"], rtol=1e-5
        )
        np.testing.assert_array_equal(it.result["class_id"], direct["class_id"])


def test_concurrent_threads_coalesce_and_match(export_dir):
    """Live dispatcher: concurrent threads get correct per-request results
    and fewer device dispatches than requests."""
    from rectpu.serve.batching import MicroBatcher
    from rectpu.serve.export import load_model

    served = load_model(export_dir)
    served.warmup(sizes=(1, 8, 16))
    mb = MicroBatcher(served, max_delay_ms=200.0)
    n_threads = 8
    barrier = threading.Barrier(n_threads)
    results, errors = {}, {}

    def worker(i):
        barrier.wait()
        try:
            results[i] = mb.predict(_request(i, n=i % 3 + 1))
        except BaseException as e:  # pragma: no cover
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    assert len(results) == n_threads
    for i in range(n_threads):
        direct = served.predict(_request(i, n=i % 3 + 1))
        np.testing.assert_allclose(
            results[i]["probabilities"], direct["probabilities"], rtol=1e-5
        )
    assert mb.requests_served == n_threads
    # the barrier releases all 8 within the 200 ms window; allow scheduler
    # slop but require real coalescing
    assert mb.batches_dispatched < n_threads
    mb.close()


def test_batcher_error_isolation(export_dir):
    """Encode errors raise in the calling thread only; the dispatcher
    keeps serving afterwards."""
    from rectpu.serve.batching import MicroBatcher
    from rectpu.serve.export import load_model

    served = load_model(export_dir)
    mb = MicroBatcher(served, max_delay_ms=1.0)
    with pytest.raises(ValueError, match="missing required"):
        mb.predict({"user_id": [1]})
    out = mb.predict(_request(5))
    assert 0.0 <= float(out["probabilities"][0]) <= 1.0
    mb.close()
    with pytest.raises(RuntimeError):
        mb.predict(_request(6))


def test_http_server_with_batching(export_dir):
    """End-to-end: HTTP handler over a MicroBatcher, parallel clients."""
    from http.server import ThreadingHTTPServer

    from rectpu.serve.batching import MicroBatcher
    from rectpu.serve.export import load_model
    from rectpu.serve.server import make_handler

    served = load_model(export_dir)
    mb = MicroBatcher(served, max_delay_ms=100.0)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(mb))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        outs, errs = {}, {}

        def client(i):
            body = json.dumps({"instances": [
                {"user_id": i, "item_id": 10 * i, "age": 25, "gender": "F",
                 "occupation": "student", "zipcode": "85711",
                 "release_year": 1990}
            ]}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=body,
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=60) as resp:
                    outs[i] = json.loads(resp.read())
            except BaseException as e:  # pragma: no cover
                errs[i] = e

        threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errs
        for i in range(6):
            p = outs[i]["predictions"][0]
            assert 0.0 <= p["probabilities"] <= 1.0
        # malformed request still returns 400 through the batcher
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b'{"instances": [{}]}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        mb.close()


def test_pipelined_sustained_load_matches_direct(export_dir):
    """Sustained concurrent load through the pipelined dispatcher (bounded
    in-flight queue): every response matches the direct prediction and all
    batches complete (no lost wakeups between dispatcher and completer)."""
    from rectpu.serve.batching import MicroBatcher
    from rectpu.serve.export import load_model

    served = load_model(export_dir)
    served.warmup(sizes=(1, 2, 8))
    mb = MicroBatcher(served, max_delay_ms=1.0, max_in_flight=2)
    results, errors = {}, {}

    def worker(i):
        try:
            for j in range(5):
                results[(i, j)] = mb.predict(_request(100 * i + j))
        except BaseException as e:  # pragma: no cover
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert len(results) == 20
    for (i, j), got in results.items():
        direct = served.predict(_request(100 * i + j))
        np.testing.assert_allclose(got["probabilities"], direct["probabilities"], rtol=1e-5)
    assert mb.requests_served == 20
    mb.close()


def test_dispatcher_pool_matches_direct(export_dir):
    """num_dispatchers>1: the pool serves concurrent load correctly (each
    worker runs coalesced batches end-to-end; stats stay consistent)."""
    from rectpu.serve.batching import MicroBatcher
    from rectpu.serve.export import load_model

    served = load_model(export_dir)
    served.warmup(sizes=(1, 2, 8))
    mb = MicroBatcher(served, max_delay_ms=1.0, num_dispatchers=4)
    results, errors = {}, {}

    def worker(i):
        try:
            for j in range(4):
                results[(i, j)] = mb.predict(_request(200 * i + j))
        except BaseException as e:  # pragma: no cover
            errors[i] = e

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    assert len(results) == 24
    for (i, j), got in results.items():
        direct = served.predict(_request(200 * i + j))
        np.testing.assert_allclose(got["probabilities"], direct["probabilities"], rtol=1e-5)
    assert mb.requests_served == 24
    mb.close()
