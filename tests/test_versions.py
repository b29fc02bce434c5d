"""ML-Engine-style multi-version serving (serve/server.py::ModelVersions)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def job_dir(tmp_path_factory):
    """A job dir with TWO exports whose predictions differ."""
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model

    tmp = tmp_path_factory.mktemp("versions")
    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DeepFMModel(cfg)
    for step, seed in ((100, 0), (200, 1)):
        params = model.init(jax.random.PRNGKey(seed))
        export_model(params, model, tmp, step=step)
    return tmp


def _req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


INSTANCE = {"user_id": 1, "item_id": 10, "age": 25, "gender": "F",
            "occupation": "student", "zipcode": "85711", "release_year": 1994}


def test_registry_discovery_and_lazy_loading(job_dir):
    from rectpu.serve.export import load_model
    from rectpu.serve.server import ModelVersions

    mv = ModelVersions(job_dir, "ctr", load_model, warmup_sizes=(1,))
    assert len(mv.versions()) == 2
    assert mv.default_version == mv.versions()[-1]
    assert mv._loaded == {}  # nothing loaded yet
    s = mv.get()
    assert mv.get() is s  # cached
    assert len(mv._loaded) == 1  # only the default materialized
    with pytest.raises(KeyError, match="unknown version"):
        mv.get("nope")

    listing = mv.listing()
    assert listing["name"] == "models/ctr"
    assert len(listing["versions"]) == 2
    assert listing["defaultVersion"]["name"].endswith(mv.default_version)


def test_http_version_routing(job_dir):
    from http.server import ThreadingHTTPServer

    from rectpu.serve.export import load_model
    from rectpu.serve.server import ModelVersions, make_handler

    mv = ModelVersions(job_dir, "ctr", load_model, warmup_sizes=(1,))
    v_old, v_new = mv.versions()
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(None, mv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        body = {"instances": [INSTANCE]}
        # flat route and named-model route hit the default (newest) version
        flat = _req(port, "/predict", body)["predictions"][0]
        named = _req(port, "/v1/models/ctr:predict", body)["predictions"][0]
        newest = _req(port, f"/v1/models/ctr/versions/{v_new}:predict", body)["predictions"][0]
        assert flat == named == newest
        # the older version is addressable and differs (different init seed)
        oldest = _req(port, f"/v1/models/ctr/versions/{v_old}:predict", body)["predictions"][0]
        assert not np.isclose(oldest["probabilities"], newest["probabilities"])

        # version listing
        listing = _req(port, "/v1/models/ctr")
        assert {v["name"].rsplit("/", 1)[1] for v in listing["versions"]} == {v_old, v_new}

        # unknown version -> 404 with an error payload
        try:
            _req(port, "/v1/models/ctr/versions/999:predict", body)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "unknown version" in json.loads(e.read())["error"]

        # wrong model name -> 404
        try:
            _req(port, "/v1/models/other:predict", body)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_missing_instances_is_400_not_404(job_dir):
    """Only an unknown VERSION maps to 404; a malformed body (KeyError on
    'instances') stays a 400 client error."""
    from http.server import ThreadingHTTPServer

    from rectpu.serve.export import load_model
    from rectpu.serve.server import ModelVersions, make_handler

    mv = ModelVersions(job_dir, "ctr", load_model, warmup_sizes=(1,))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(None, mv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        try:
            _req(port, "/predict", {"examples": [INSTANCE]})
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "instances" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()


def test_registry_rescans_for_new_and_pruned_exports(job_dir, tmp_path):
    """Exports written or pruned AFTER startup are reflected: new versions
    become servable, pruned unloaded ones leave the listing."""
    import shutil

    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model, load_model
    from rectpu.serve.server import ModelVersions, UnknownVersion

    job = tmp_path / "rescan"
    shutil.copytree(job_dir, job)
    mv = ModelVersions(job, "ctr", load_model, warmup_sizes=(1,))
    before = mv.versions()

    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DeepFMModel(cfg)
    export_model(model.init(jax.random.PRNGKey(9)), model, job, step=999)
    after = mv.versions()
    assert len(after) == len(before) + 1
    new_v = (set(after) - set(before)).pop()
    assert mv.get(new_v) is not None  # lazily servable without restart

    # prune an unloaded old version: it leaves the listing and 404s
    old_v = before[0]
    shutil.rmtree(job / "export" / "exporter" / old_v)
    assert old_v not in mv.versions()
    with pytest.raises(UnknownVersion):
        mv.get(old_v)
    # the loaded new version keeps serving even if pruned from disk
    shutil.rmtree(job / "export" / "exporter" / new_v)
    assert mv.get(new_v) is not None


def test_follow_latest_hot_picks_new_exports(job_dir, tmp_path):
    """--follow-latest: the default version tracks the newest export on disk;
    a pinned registry keeps its startup default."""
    import shutil

    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model, load_model
    from rectpu.serve.server import ModelVersions

    job = tmp_path / "follow"
    shutil.copytree(job_dir, job)
    follow = ModelVersions(job, "ctr", load_model, warmup_sizes=(1,),
                           follow_latest=True)
    pinned = ModelVersions(job, "ctr", load_model, warmup_sizes=(1,))
    v0 = follow.default_version
    assert pinned.default_version == v0

    model = DeepFMModel(TowerConfig(feature_set=ml_100k_feature_set()))
    export_model(model.init(jax.random.PRNGKey(5)), model, job, step=300)
    assert follow.default_version != v0  # hot-picked the new export
    assert pinned.default_version == v0  # pinned stays
    assert follow.get() is follow.get()  # and it loads + caches


def test_concurrent_loads_and_predicts(job_dir):
    """Hammer two versions + /metrics from many threads while both lazily
    load: every request succeeds, each version loads exactly once (the
    per-version lock), and no dict-iteration race crashes /metrics."""
    from concurrent.futures import ThreadPoolExecutor
    from http.server import ThreadingHTTPServer

    from rectpu.serve.export import load_model
    from rectpu.serve.server import ModelVersions, make_handler

    loads = []

    def counting_loader(d):
        loads.append(str(d))
        return load_model(d)

    mv = ModelVersions(job_dir, "ctr", counting_loader, warmup_sizes=(1,))
    v_old, v_new = sorted(set(mv._scan()))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(None, mv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        body = {"instances": [INSTANCE]}
        paths = (
            [f"/v1/models/ctr/versions/{v_old}:predict"] * 8
            + [f"/v1/models/ctr/versions/{v_new}:predict"] * 8
            + ["/metrics"] * 8
        )

        def hit(p):
            return _req(port, p, body if p != "/metrics" else None)

        with ThreadPoolExecutor(max_workers=12) as ex:
            results = list(ex.map(hit, paths))
        assert len(results) == 24
        assert len(loads) == 2  # each version loaded exactly once
        for r in results:
            assert ("predictions" in r) or ("versions_loaded" in r)
    finally:
        httpd.shutdown()


def test_metrics_endpoint(job_dir):
    from http.server import ThreadingHTTPServer

    from rectpu.serve.batching import MicroBatcher
    from rectpu.serve.export import load_model
    from rectpu.serve.server import ModelVersions, make_handler

    mv = ModelVersions(job_dir, "ctr", load_model, wrap=MicroBatcher,
                       warmup_sizes=(1,))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(None, mv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        m0 = _req(port, "/metrics")
        assert m0["versions_loaded"] == {}  # lazy: nothing served yet
        _req(port, "/predict", {"instances": [INSTANCE, INSTANCE]})
        m1 = _req(port, "/metrics")
        stats = m1["versions_loaded"][m1["default_version"]]
        assert stats["requests_served"] == 1
        assert stats["rows_dispatched"] == 2
        assert m1["versions_available"] == mv.versions()
    finally:
        httpd.shutdown()


def test_single_model_handler_unchanged(job_dir):
    """Without a registry the handler keeps its original contract."""
    from http.server import ThreadingHTTPServer

    from rectpu.serve.export import latest_export, load_model
    from rectpu.serve.server import make_handler

    served = load_model(latest_export(job_dir))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(served))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        out = _req(port, "/predict", {"instances": [INSTANCE]})
        assert len(out["predictions"]) == 1
        # versioned routes 404 without a registry
        try:
            _req(port, "/v1/models/ctr:predict", {"instances": [INSTANCE]})
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
