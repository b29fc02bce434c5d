"""Post-training int8 table quantization for serving (rectpu/serve/quant.py)."""

import json

import numpy as np
import pytest


def test_quantize_rows_error_bound():
    from rectpu.serve.quant import dequantize_rows, quantize_rows

    rng = np.random.default_rng(0)
    arr = rng.normal(size=(257, 9)).astype(np.float32) * rng.uniform(
        0.01, 10.0, size=(257, 1)
    ).astype(np.float32)
    arr[13] = 0.0  # zero row must quantize exactly
    q, s = quantize_rows(arr)
    assert q.dtype == np.int8 and s.dtype == np.float32
    back = dequantize_rows(q, s)
    # symmetric rounding: |err| <= scale/2 per element
    assert np.all(np.abs(back - arr) <= s[:, None] / 2 + 1e-7)
    np.testing.assert_array_equal(back[13], 0.0)
    # scales are positive even for the zero row
    assert np.all(s > 0)


def test_dequant_lookup_matches_numpy():
    import jax.numpy as jnp

    from rectpu.serve.quant import dequant_lookup, dequantize_rows, quantize_rows

    rng = np.random.default_rng(1)
    table = rng.normal(size=(64, 5)).astype(np.float32)
    q, s = quantize_rows(table)
    ids = rng.integers(0, 64, size=(7, 3)).astype(np.int32)
    out = np.asarray(dequant_lookup({"q": jnp.asarray(q), "s": jnp.asarray(s)}, jnp.asarray(ids)))
    np.testing.assert_allclose(out, dequantize_rows(q, s)[ids], rtol=1e-6, atol=1e-7)


def _random_features(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "user_id": rng.integers(0, 1000, n),
        "item_id": rng.integers(0, 2000, n),
        "age": rng.integers(10, 70, n),
        "gender": np.asarray(["F", "M"] * n)[:n],
        "occupation": np.asarray(["student", "writer", "retired"] * n)[:n],
        "zipcode": np.asarray(["85711", "10027", "00000"] * n)[:n],
        "release_year": rng.integers(1930, 1998, n),
    }


def _build(family, packed=False, k=4):
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import MODEL_REGISTRY, TowerConfig

    cfg = TowerConfig(feature_set=ml_100k_feature_set(), packed_linear=packed,
                      embedding_size=k)
    model = MODEL_REGISTRY[family](cfg)
    params = model.init(jax.random.PRNGKey(3))
    return model, params


@pytest.mark.parametrize("family,packed", [
    ("deep_fm", False),   # fused non-packed: quantizer pre-packs [emb | w]
    ("deep_fm", True),    # packed single-table parameter
    ("deep", False),      # plain emb table, no linear tower
    ("linear_deep", False),
])
def test_quantized_predictions_close(family, packed):
    """int8 table quantization perturbs serving probabilities only slightly."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.serve.export import ServingModel
    from rectpu.serve.quant import quantize_serving

    model, params = _build(family, packed)
    fp = ServingModel(model, params, ml_100k_feature_set())
    qt = quantize_serving(fp)
    assert qt is not fp
    feats = _random_features(33, seed=4)
    a = fp.predict(dict(feats))
    b = qt.predict(dict(feats))
    np.testing.assert_allclose(a["probabilities"], b["probabilities"], atol=0.02)
    # the heavyweight leaf really is int8 now
    leaf = qt.params.get("table", qt.params.get("emb"))
    assert leaf["q"].dtype == np.int8


def test_linear_model_passthrough():
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.serve.export import ServingModel
    from rectpu.serve.quant import quantize_serving

    model, params = _build("linear")
    fp = ServingModel(model, params, ml_100k_feature_set())
    assert quantize_serving(fp) is fp


def test_quantize_export_roundtrip(tmp_path):
    """quantize_export writes a loadable artifact: smaller npz, close
    predictions, packed template, serialized path refused."""
    from rectpu.serve.export import export_model, load_model
    from rectpu.serve.quant import quantize_export

    # K=32 so the table dominates the artifact (at tiny K the per-row fp32
    # scale is a comparable share and the size ratio is untruthful)
    model, params = _build("deep_fm", k=32)
    d = export_model(params, model, tmp_path, step=1)
    fp = load_model(d)
    fp_size = (d / "arrays.npz").stat().st_size

    out = quantize_export(d, tmp_path / "quantized")
    meta = json.loads((out / "model.json").read_text())
    assert meta["table_quant"] == "int8"
    assert meta["tower_config"]["packed_linear"] is True
    assert not (out / "apply.jaxexport").exists()
    q_size = (out / "arrays.npz").stat().st_size
    assert q_size < fp_size / 2.5  # fp32 [V,K] + fp32 w -> int8 [V,K+1] + f32 scale

    served = load_model(out)
    feats = _random_features(17, seed=5)
    a = fp.predict(dict(feats))
    b = served.predict(dict(feats))
    np.testing.assert_allclose(a["probabilities"], b["probabilities"], atol=0.02)

    with pytest.raises(ValueError, match="quantized"):
        load_model(out, use_serialized=True)


def test_quantize_export_in_place(tmp_path):
    from rectpu.serve.export import export_model, load_model
    from rectpu.serve.quant import quantize_export

    model, params = _build("deep")
    d = export_model(params, model, tmp_path, step=1)
    out = quantize_export(d)
    assert out == d
    served = load_model(d)
    feats = _random_features(9, seed=6)
    p = served.predict(dict(feats))
    assert np.all(np.isfinite(p["probabilities"]))


def test_quantized_auc_preserved_on_trained_model(synthetic_dir, tmp_path):
    """On a trained DeepFM, int8 table quantization keeps eval ranking:
    AUC moves < 0.005 and probabilities stay close."""
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.loader import CsvDataset
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import ServingModel
    from rectpu.serve.quant import make_quantized_apply, quantize_params
    from rectpu.train.loop import TrainConfig, Trainer
    from rectpu.train.metrics import binary_predictions

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs)
    model = DeepFMModel(cfg)
    train_ds = CsvDataset(synthetic_dir["train"], fs)
    eval_ds = CsvDataset(synthetic_dir["test"], fs)
    trainer = Trainer(
        model, model.default_optimizer(), train_ds, eval_ds, tmp_path / "q",
        TrainConfig(batch_size=64, train_steps=300, steps_per_loop=50,
                    save_checkpoints_steps=10**6),
    )
    trainer.train_and_evaluate(restore=False)
    params = trainer._final_params

    def exact_auc(scores, labels):
        order = np.argsort(scores, kind="stable")
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(scores) + 1)
        # average ranks over ties
        for s in np.unique(scores):
            m = scores == s
            ranks[m] = ranks[m].mean()
        pos = labels > 0.5
        n_pos, n_neg = pos.sum(), (~pos).sum()
        return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    batch = {"cat_ids": eval_ds.cat_ids, "num_vals": eval_ds.num_vals}
    p_fp = np.asarray(jax.nn.sigmoid(model.apply(params, batch)))

    qmodel, qparams, did = quantize_params(model, params)
    assert did
    p_q = np.asarray(make_quantized_apply(qmodel)(qparams, batch)["probabilities"]).ravel()

    auc_fp = exact_auc(p_fp, eval_ds.labels)
    auc_q = exact_auc(p_q, eval_ds.labels)
    assert abs(auc_fp - auc_q) < 0.005, (auc_fp, auc_q)
    np.testing.assert_allclose(p_fp, p_q, atol=0.03)


def test_double_quantization_is_noop(tmp_path):
    """--table-quant int8 on a pre-quantized export (or quantizing twice)
    must pass through, not crash on the dict leaf."""
    from rectpu.serve.export import ServingModel, export_model, load_model
    from rectpu.serve.quant import quantize_export, quantize_serving

    model, params = _build("deep_fm")
    served = quantize_serving(
        ServingModel(model, params, model.cfg.feature_set)
    )
    assert quantize_serving(served) is served  # idempotent in memory

    d = export_model(params, model, tmp_path, step=1)
    quantize_export(d)
    with pytest.raises(ValueError, match="already quantized"):
        quantize_export(d)
    # and the load-time flag on the pre-quantized artifact still serves
    again = quantize_serving(load_model(d))
    feats = _random_features(3, seed=9)
    assert np.all(np.isfinite(again.predict(dict(feats))["probabilities"]))


def test_serialized_and_quant_flags_conflict(tmp_path):
    from rectpu.serve.server import serve

    with pytest.raises(ValueError, match="mutually exclusive"):
        serve(export_dir=str(tmp_path), use_serialized=True, table_quant="int8",
              compilation_cache_dir=None)


def test_latest_export_skips_dot_dirs(tmp_path):
    """In-flight tmp/backup dirs (leading dot) must never be served even if
    they contain a model.json (the in-place quant swap leaves .old-* briefly)."""
    from rectpu.serve.export import latest_export

    base = tmp_path / "export" / "exporter"
    (base / "100").mkdir(parents=True)
    (base / "100" / "model.json").write_text("{}")
    (base / ".old-200").mkdir()
    (base / ".old-200" / "model.json").write_text("{}")
    assert latest_export(tmp_path).name == "100"


def test_server_table_quant_flag(tmp_path):
    """serve(..., table_quant='int8') swaps in the quantized ServingModel."""
    from rectpu.serve.export import ServingModel, export_model, load_model
    from rectpu.serve.quant import quantize_serving

    model, params = _build("deep_fm")
    d = export_model(params, model, tmp_path, step=1)
    served = quantize_serving(load_model(d))
    leaf = served.params.get("table")
    assert leaf is not None and leaf["q"].dtype == np.int8
    feats = _random_features(5, seed=8)
    p = served.predict(dict(feats))
    assert np.all(np.isfinite(p["probabilities"]))
