"""Serving tests: HTTP predict server, dataset cache, event-file writer."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model

    tmp = tmp_path_factory.mktemp("serve")
    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return export_model(params, model, tmp, step=1)


def test_http_predict_server(export_dir):
    from http.server import ThreadingHTTPServer

    from rectpu.serve.export import load_model
    from rectpu.serve.server import make_handler

    served = load_model(export_dir)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(served))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        body = json.dumps(
            {
                "instances": [
                    {"user_id": 1, "item_id": 10, "age": 25, "gender": "F",
                     "occupation": "student", "zipcode": "85711",
                     "release_year": 1994, "action": 1},
                    {"user_id": 2, "item_id": 20, "age": 60, "gender": "M",
                     "occupation": "retired", "zipcode": "00000",
                     "release_year": 1950},
                ]
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            out = json.loads(resp.read())
        assert len(out["predictions"]) == 2
        p = out["predictions"][0]
        assert 0.0 <= p["probabilities"] <= 1.0
        assert p["class_id"] in (0, 1)
        # the reference binary head's full output set rides the response
        # (ref model_utils.py:9-20): logistic == probabilities for this head
        assert p["logistic"] == p["probabilities"]
        assert "logits" in p

        # health check
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
            assert resp.read() == b"ok"

        # malformed request -> 400 with error payload
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b'{"instances": [{}]}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "missing required" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()


def test_dataset_cache_roundtrip(synthetic_dir):
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.records import cache_path, load_cached, _spec_fingerprint

    fs = ml_100k_feature_set()
    a = load_cached(synthetic_dir["test"], fs)
    cp = cache_path(synthetic_dir["test"], _spec_fingerprint(fs, "rating", 5))
    assert cp.exists()
    b = load_cached(synthetic_dir["test"], fs)  # cache hit
    np.testing.assert_array_equal(a["cat_ids"], b["cat_ids"])
    np.testing.assert_array_equal(a["labels"], b["labels"])

    # different schema -> different cache key, fresh encode
    fs2 = ml_100k_feature_set(numeric=("age",))
    c = load_cached(synthetic_dir["test"], fs2)
    assert c["num_vals"].shape[1] == 1


def test_event_writer_crc_and_format(tmp_path):
    """Records are valid TFRecord frames with masked CRC32C; scalars decode."""
    import struct

    from rectpu.utils.events import EventWriter, _masked_crc, crc32c

    # crc32c known-answer tests (RFC 3720 vectors)
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283

    w = EventWriter(tmp_path)
    w.add_scalar("loss", 0.5, step=10)
    w.add_scalars({"a": 1.0, "b": 2.0}, step=11)
    w.add_histogram("h", np.random.default_rng(0).normal(size=100), step=12)
    w.close()

    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    data = files[0].read_bytes()
    # walk the TFRecord framing, verifying every CRC
    off = 0
    events = []
    while off < len(data):
        (length,) = struct.unpack("<Q", data[off : off + 8])
        (len_crc,) = struct.unpack("<I", data[off + 8 : off + 12])
        assert len_crc == _masked_crc(data[off : off + 8])
        payload = data[off + 12 : off + 12 + length]
        (data_crc,) = struct.unpack("<I", data[off + 12 + length : off + 16 + length])
        assert data_crc == _masked_crc(payload)
        events.append(payload)
        off += 16 + length
    assert len(events) == 4  # file_version + 3 summaries
    # first event carries the brain.Event:2 version marker
    assert b"brain.Event:2" in events[0]
    assert b"loss" in events[1]


def test_profiling_step_timer():
    from rectpu.utils.profiling import StepTimer

    t = StepTimer()
    t.update(10, 320)
    rates = t.rates()
    assert rates["examples_per_sec"] > 0
    assert rates["steps_per_sec"] > 0


def test_event_file_readable_by_tensorboard(tmp_path):
    """The self-built writer's output loads through TensorBoard's own reader."""
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing.event_file_loader import EventFileLoader

    from rectpu.utils.events import EventWriter

    w = EventWriter(tmp_path)
    w.add_scalar("train/loss", 0.125, step=7)
    w.add_histogram("act", np.linspace(-1, 1, 50), step=7)
    w.close()
    f = next(tmp_path.glob("events.out.tfevents.*"))
    events = list(EventFileLoader(str(f)).Load())
    assert events[0].file_version == "brain.Event:2"
    scalar_events = [e for e in events if e.summary.value and e.summary.value[0].tag == "train/loss"]
    assert len(scalar_events) == 1
    assert scalar_events[0].step == 7
    sv = scalar_events[0].summary.value[0]
    # TB's loader migrates simple_value summaries to tensor form; accept both
    got = sv.simple_value if sv.HasField("simple_value") else sv.tensor.float_val[0]
    assert abs(got - 0.125) < 1e-9
    histo_events = [e for e in events if e.summary.value and e.summary.value[0].tag == "act"]
    hv = histo_events[0].summary.value[0]
    if hv.HasField("histo"):
        h = hv.histo
        assert h.num == 50 and abs(h.min + 1) < 1e-9 and abs(h.max - 1) < 1e-9
        assert len(h.bucket) == len(h.bucket_limit)
        assert abs(sum(h.bucket) - 50) < 1e-9
    else:  # migrated to tensor [[left, right, count] ...]
        tensor = hv.tensor
        if tensor.tensor_content:
            dt = np.float32 if tensor.dtype == 1 else np.float64  # 1 == DT_FLOAT
            vals = np.frombuffer(tensor.tensor_content, dtype=dt)
        elif tensor.double_val:
            vals = np.array(tensor.double_val)
        else:
            vals = np.array(tensor.float_val)
        counts = vals.reshape(-1, 3)[:, 2]
        assert abs(counts.sum() - 50) < 1e-9


def test_serialized_apply_matches_python(export_dir):
    """The jax.export StableHLO artifact (SavedModel-graph parity) predicts
    identically to the retraced Python model, at multiple batch sizes (the
    graph is batch-polymorphic)."""
    import json as _json

    from rectpu.serve.export import load_model

    meta = _json.loads((export_dir / "model.json").read_text())
    assert meta.get("serialized_apply"), meta.get("serialized_apply_error")
    assert (export_dir / "apply.jaxexport").exists()
    py = load_model(export_dir)
    hlo = load_model(export_dir, use_serialized=True)
    rng = np.random.default_rng(0)
    for n in (1, 3, 17):
        feats = {
            "user_id": rng.integers(0, 1000, n),
            "item_id": rng.integers(0, 2000, n),
            "age": rng.integers(10, 70, n),
            "gender": np.asarray(["F", "M"] * n)[:n],
            "occupation": np.asarray(["student"] * n),
            "zipcode": np.asarray(["85711"] * n),
            "release_year": rng.integers(1930, 1998, n),
        }
        a = py.predict(dict(feats))
        b = hlo.predict(dict(feats))
        for key in a:
            if np.issubdtype(np.asarray(a[key]).dtype, np.integer):
                # hard 0.5 thresholds may flip between compilations when the
                # probability sits within float noise of the boundary
                decided = np.abs(np.asarray(a["probabilities"]).ravel() - 0.5) > 1e-5
                np.testing.assert_array_equal(
                    np.asarray(a[key]).ravel()[decided],
                    np.asarray(b[key]).ravel()[decided],
                )
            else:
                # rtol 1e-4: the retraced-Python and StableHLO executables may
                # compile to differently-ordered fp32 reductions (multithreaded
                # XLA:CPU), which occasionally exceeds 1e-5 relative — observed
                # as a rare full-suite-only flake
                np.testing.assert_allclose(a[key], b[key], rtol=1e-4, atol=1e-5)


def test_export_with_bf16_param_leaf_roundtrips():
    """Exports whose table leaf is bf16 (--table-dtype / --table-store
    bfloat16) load and predict on both paths. Regression: _flatten stores
    bf16 leaves under a tagged uint16 key, and load_model read the npz raw,
    so any bf16-leaf export died with KeyError at serve time."""
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model, load_model

    cfg = TowerConfig(feature_set=ml_100k_feature_set(), compute_dtype="bfloat16")
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "emb" in params
    params["emb"] = params["emb"].astype(jnp.bfloat16)  # stored-table form

    with tempfile.TemporaryDirectory() as tmp:
        d = export_model(params, model, Path(tmp), step=1)
        feats = {
            "user_id": np.array([1, 7]),
            "item_id": np.array([10, 55]),
            "age": np.array([25, 40]),
            "gender": np.array(["F", "M"]),
            "occupation": np.array(["student", "writer"]),
            "zipcode": np.array(["85711", "10027"]),
            "release_year": np.array([1994, 1987]),
        }
        served = load_model(d)
        assert served.params["emb"].dtype == jnp.bfloat16
        a = served.predict(dict(feats))
        assert np.all(np.isfinite(a["probabilities"]))
        hlo = load_model(d, use_serialized=True)
        b = hlo.predict(dict(feats))
        np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                                   rtol=1e-4, atol=1e-5)


def test_best_exporter_only_exports_on_improvement(tmp_path):
    """tf BestExporter parity: exports happen only when the compared eval
    metric improves; the best value persists across exporter instances."""
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import make_exporter

    model = DeepFMModel(TowerConfig(feature_set=ml_100k_feature_set()))
    params = model.init(jax.random.PRNGKey(0))
    exp = make_exporter(model, tmp_path, mode="best")

    def n_exports():
        base = tmp_path / "export" / "exporter"
        return len(list(base.iterdir())) if base.exists() else 0

    exp(params, 100, metrics={"auc": 0.6})
    assert n_exports() == 1
    exp(params, 200, metrics={"auc": 0.55})  # worse -> skipped
    assert n_exports() == 1
    exp(params, 300, metrics={"auc": 0.65})  # better -> exported
    assert n_exports() == 2
    exp(params, 400, metrics=None)  # no metrics -> skipped, no crash
    assert n_exports() == 2

    # a NEW exporter instance (restart) remembers the best via job-dir state
    exp2 = make_exporter(model, tmp_path, mode="best")
    exp2(params, 500, metrics={"auc": 0.64})
    assert n_exports() == 2
    exp2(params, 600, metrics={"auc": 0.66})
    assert n_exports() == 3

    # lower-is-better metric
    exp3 = make_exporter(model, tmp_path / "loss", mode="best",
                         compare_metric="average_loss")
    exp3(params, 1, metrics={"average_loss": 0.5})
    exp3(params, 2, metrics={"average_loss": 0.6})  # worse
    exp3(params, 3, metrics={"average_loss": 0.4})  # better
    base = tmp_path / "loss" / "export" / "exporter"
    assert len(list(base.iterdir())) == 2


def test_trainer_with_best_exporter(synthetic_dir, tmp_path):
    """--exporter best through the real trainer CLI: training runs, the best
    marker exists, and the newest export serves."""
    import importlib

    mod = importlib.import_module("rectpu.trainers.deep_fm")
    args = mod.build_parser().parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / "best"),
        "--train-steps", "300", "--batch-size", "64",
        "--steps-per-loop", "50", "--save-checkpoints-steps", "100",
        "--exporter", "best",
    ])
    metrics = mod.train_and_evaluate(args)
    import json as _json

    marker = tmp_path / "best" / "best_metric.json"
    assert marker.exists()
    best = _json.loads(marker.read_text())
    assert best["auc"] <= max(metrics["auc"], best["auc"])

    from rectpu.serve.export import latest_export, load_model

    served = load_model(latest_export(args.job_dir))
    out = served.predict({
        "user_id": np.array([1]), "item_id": np.array([5]), "age": np.array([30]),
        "gender": np.array(["F"]), "occupation": np.array(["student"]),
        "zipcode": np.array(["12345"]), "release_year": np.array([1990]),
    })
    assert 0 <= float(out["probabilities"][0]) <= 1


def test_encode_request_nonascii_and_leading_zero_strings():
    """The fast S-dtype encode path must keep raw-string hash semantics:
    leading-zero zipcodes hash as their full text, and non-ASCII values fall
    back to the object path with identical utf-8 hashing."""
    import numpy as np

    from rectpu.features.hashing import hash_bucket
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import ServingModel

    import jax

    fs = ml_100k_feature_set()
    model = DeepFMModel(TowerConfig(feature_set=fs))
    sm = ServingModel(model, model.init(jax.random.PRNGKey(0)), fs)
    req = {
        "user_id": [1, 2], "item_id": [3, 4], "age": [25, 30],
        "gender": ["F", "M"], "occupation": ["café-owner", "writer"],
        "zipcode": ["03364", "94043"], "release_year": [1990, 1991],
    }
    b = sm.encode_request(req)
    occ = b["cat_ids"][:, 4] - int(fs.offsets[4])
    assert np.array_equal(
        occ, hash_bucket(np.array(["café-owner", "writer"], dtype=object), 50)
    )
    zc = b["cat_ids"][:, 5] - int(fs.offsets[5])
    assert np.array_equal(
        zc, hash_bucket(np.array(["03364", "94043"], dtype=object), 1000)
    )


def test_native_json_parse_matches_python_fallback():
    """The native request parser (io/native/json_columns.cc) must yield the
    SAME encoded batch as the json.loads + instances_to_columns path for
    every body it accepts — and bail (None) on everything else so the Python
    path defines behavior."""
    import json

    import jax
    import numpy as np
    import pytest as _pytest

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io import native
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import ServingModel
    from rectpu.serve.server import instances_to_columns

    if not native.available():
        _pytest.skip("native lib not built")

    fs = ml_100k_feature_set()
    model = DeepFMModel(TowerConfig(feature_set=fs))
    sm = ServingModel(model, model.init(jax.random.PRNGKey(0)), fs)

    instances = [
        {"user_id": 1, "item_id": 3, "age": 25, "gender": "F",
         "occupation": "writer", "zipcode": "03364", "release_year": 1990,
         "action": 1},
        {"user_id": 2, "item_id": 4, "age": 60, "gender": "M",
         "occupation": "retired", "zipcode": "94043", "release_year": 1955,
         "action": 0},
    ]
    raw = json.dumps({"instances": instances}).encode()
    parsed = native.parse_json_instances(raw)
    assert parsed is not None
    cols, n = parsed
    assert n == 2
    b_native = sm.encode_request(dict(cols))
    b_python = sm.encode_request(instances_to_columns(instances))
    np.testing.assert_array_equal(b_native["cat_ids"], b_python["cat_ids"])
    np.testing.assert_array_equal(b_native["num_vals"], b_python["num_vals"])

    # float values land as float64, matching np.asarray of the json floats
    raw_f = json.dumps({"instances": [{"age": 1.5}, {"age": 2}]}).encode()
    cols_f, _ = native.parse_json_instances(raw_f)
    np.testing.assert_array_equal(cols_f["age"],
                                  np.asarray([1.5, 2.0]))
    assert cols_f["age"].dtype == np.float64

    # round-4 widened coverage: escapes, \uXXXX (incl. surrogate pairs),
    # non-ASCII passthrough, booleans, extra scalar top-level keys — each
    # must produce EXACTLY what the json.loads fallback feeds downstream
    def fallback_columns(raw):
        body = json.loads(raw)
        return instances_to_columns(body["instances"])

    for wide in [
        '{"instances": [{"a": "café"}, {"a": "ü"}]}'.encode("utf-8"),
        b'{"instances": [{"a": "x\\ny"}, {"a": "q\\"\\\\"}]}',
        b'{"instances": [{"a": "\\u00e9\\u4e2d"}, {"a": "\\ud83d\\ude00"}]}',
        b'{"instances": [{"flag": true}, {"flag": false}]}',
        b'{"signature_name": "serving_default", "instances": [{"a": 1}]}',
        b'{"instances": [{"a": 1}], "signature_name": "x"}',
    ]:
        got = native.parse_json_instances(wide)
        assert got is not None, wide
        cols_w, n_w = got
        ref = fallback_columns(wide)
        assert n_w == len(next(iter(ref.values())))
        assert set(cols_w) == set(ref)
        for k in ref:
            ref_k = ref[k]
            if ref_k.dtype.kind == "U":  # str objects -> utf-8 bytes
                ref_k = np.asarray([s.encode("utf-8") for s in ref_k])
            np.testing.assert_array_equal(
                cols_w[k].astype(ref_k.dtype, copy=False)
                if cols_w[k].dtype.kind != "S" else cols_w[k],
                ref_k, err_msg=f"{wide} col {k}")

    # everything still outside the fast shape bails to the Python path
    for bad in [
        b"",                                        # empty body
        b"not json",
        b'{"x": 1}',                                # no instances key
        b'{"instances": [{"a": 1}, {"b": 2}]}',     # inconsistent keys
        b'{"instances": [{"a": [1]}]}',             # nested value
        b'{"instances": [{"a": null}]}',            # null (fallback fills 0)
        b'{"instances": [{"a": "\\ud800"}]}',       # lone surrogate
        b'{"instances": [{"a": "\\u0000"}]}',       # NUL (S-dtype can't)
        b'{"instances": [{"a": 1}], "y": {"n": 1}}',  # nested extra key
        b'{"instances": [{"a": 1}, {"a": "s"}]}',   # mixed column
    ]:
        assert native.parse_json_instances(bad) is None, bad


def test_parse_request_columns_end_to_end_equality():
    """parse_request_columns (native or fallback) feeds predict identically."""
    import json

    import jax
    import numpy as np

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import ServingModel
    from rectpu.serve.server import instances_to_columns, parse_request_columns

    fs = ml_100k_feature_set()
    model = DeepFMModel(TowerConfig(feature_set=fs))
    sm = ServingModel(model, model.init(jax.random.PRNGKey(0)), fs)
    instances = [
        {"user_id": 7, "item_id": 9, "age": 31, "gender": "M",
         "occupation": "artist", "zipcode": "10001", "release_year": 1999},
    ]
    raw = json.dumps({"instances": instances}).encode()
    cols, n = parse_request_columns(raw)
    assert n == 1
    a = sm.predict(dict(cols))
    b = sm.predict(instances_to_columns(instances))
    np.testing.assert_allclose(a["probabilities"], b["probabilities"],
                               rtol=1e-6, atol=1e-7)
