"""DCN-v2 model family (rectpu/models/dcn.py) — beyond-reference addition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DCNModel, TowerConfig


def test_cross_layer_matches_numpy():
    """x0 * (W x + b) + x against a float64 numpy oracle."""
    rng = np.random.default_rng(0)
    d = 12
    x0 = rng.normal(size=(5, d)).astype(np.float64)
    x = rng.normal(size=(5, d)).astype(np.float64)
    w = rng.normal(size=(d, d)).astype(np.float64)
    b = rng.normal(size=(d,)).astype(np.float64)

    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DCNModel(cfg, num_cross_layers=1)
    got = np.asarray(model._cross(
        {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)},
        jnp.asarray(x0, jnp.float32), jnp.asarray(x, jnp.float32)))
    want = x0 * (x @ w + b) + x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_low_rank_cross_is_factored_full_rank():
    """The low-rank layer computes x0 * (x V U^T + b) + x exactly."""
    rng = np.random.default_rng(1)
    d, r = 10, 3
    x0 = rng.normal(size=(4, d)).astype(np.float64)
    x = rng.normal(size=(4, d)).astype(np.float64)
    u = rng.normal(size=(d, r)).astype(np.float64)
    v = rng.normal(size=(d, r)).astype(np.float64)
    b = rng.normal(size=(d,)).astype(np.float64)

    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DCNModel(cfg, low_rank=r)
    got = np.asarray(model._cross(
        {"u": jnp.asarray(u, jnp.float32), "v": jnp.asarray(v, jnp.float32),
         "b": jnp.asarray(b, jnp.float32)},
        jnp.asarray(x0, jnp.float32), jnp.asarray(x, jnp.float32)))
    want = x0 * (x @ (v @ u.T) + b) + x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("low_rank", [None, 8])
def test_forward_shapes_and_param_sizes(low_rank):
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,))
    model = DCNModel(cfg, num_cross_layers=2, low_rank=low_rank)
    params = model.init(jax.random.PRNGKey(0))
    d = 26 * 4
    assert len(params["cross"]) == 2
    if low_rank is None:
        assert params["cross"][0]["w"].shape == (d, d)
    else:
        assert params["cross"][0]["u"].shape == (d, 8)
        assert params["cross"][0]["v"].shape == (d, 8)
    rng = np.random.default_rng(2)
    batch = {
        "cat_ids": np.stack(
            [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=16)
             for f in range(fs.num_fields)], axis=1).astype(np.int32),
        "num_vals": np.zeros((16, 0), np.float32),
    }
    logits = model.apply(params, batch)
    assert logits.shape == (16,)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_trainer_learns_exports_and_serves(synthetic_dir, tmp_path):
    """Full e2e through the DCN trainer CLI: learn, export, serve, quantize."""
    import importlib

    mod = importlib.import_module("rectpu.trainers.dcn")
    args = mod.build_parser().parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / "dcn"),
        "--train-steps", "800",
        "--batch-size", "64",
        "--steps-per-loop", "100",
        "--save-checkpoints-steps", "1000000",
        "--num-cross-layers", "2",
    ])
    metrics = mod.train_and_evaluate(args)
    assert metrics["auc"] > 0.57, metrics

    from rectpu.serve.export import latest_export, load_model
    from rectpu.serve.quant import quantize_serving

    served = load_model(latest_export(args.job_dir))
    assert served.model.name == "dcn"
    assert served.model.num_cross_layers == 2
    req = {
        "user_id": np.array([1, 2]), "item_id": np.array([10, 20]),
        "age": np.array([25, 60]), "gender": np.array(["F", "M"]),
        "occupation": np.array(["student", "retired"]),
        "zipcode": np.array(["85711", "00000"]),
        "release_year": np.array([1994, 1950]),
    }
    a = served.predict(dict(req))
    assert np.all((a["probabilities"] >= 0) & (a["probabilities"] <= 1))
    b = quantize_serving(served).predict(dict(req))
    np.testing.assert_allclose(a["probabilities"], b["probabilities"], atol=0.03)


@pytest.mark.parametrize("scatter_impl", ["xla", "mxu"])
def test_flat_layout_matches_3d_path(scatter_impl, rng):
    """flat_layout x0 == reshape of the 3D lookup: logits AND full grads."""
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    pad = 2048 if scatter_impl == "mxu" else 128
    base = dict(feature_set=fs, embedding_size=8, hidden_units=(16,),
                table_padding=pad)
    m3 = DCNModel(TowerConfig(**base), num_cross_layers=2)
    mf = DCNModel(TowerConfig(**base, flat_layout=True, scatter_impl=scatter_impl),
                  num_cross_layers=2)
    params = m3.init(jax.random.PRNGKey(0))
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=64)
             for f in range(fs.num_fields)], axis=1).astype(np.int32)),
        "num_vals": jnp.zeros((64, 0), jnp.float32),
    }
    labels = jnp.asarray((rng.random(64) < 0.3).astype(np.float32))

    def loss(model, p):
        return sigmoid_xent(model.apply(p, batch), labels).mean()

    l3, g3 = jax.value_and_grad(lambda p: loss(m3, p))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(mf, p))(params)
    assert np.isclose(float(l3), float(lf), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(g3), jax.device_get(gf),
    )


def test_export_kwargs_roundtrip(tmp_path):
    import json

    from rectpu.serve.export import export_model, load_model

    cfg = TowerConfig(feature_set=ml_100k_feature_set(), embedding_size=4,
                      hidden_units=(8,))
    model = DCNModel(cfg, num_cross_layers=4, low_rank=5)
    params = model.init(jax.random.PRNGKey(3))
    d = export_model(params, model, tmp_path, step=1)
    meta = json.loads((d / "model.json").read_text())
    assert meta.get("serialized_apply"), meta.get("serialized_apply_error")
    served = load_model(d)
    assert served.model.num_cross_layers == 4
    assert served.model.low_rank == 5
    req = {
        "user_id": np.array([7]), "item_id": np.array([3]), "age": np.array([33]),
        "gender": np.array(["M"]), "occupation": np.array(["artist"]),
        "zipcode": np.array(["10001"]), "release_year": np.array([1999]),
    }
    want = np.asarray(jax.nn.sigmoid(model.apply(params, served.encode_request(req))))
    np.testing.assert_allclose(served.predict(req)["probabilities"], want,
                               rtol=1e-5, atol=1e-6)


def test_sharded_dcn_step_matches_single_device(rng):
    """EP sharding applies to DCN via the shape-keyed rules."""
    from rectpu.parallel import ParallelPlan
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      table_padding=16)
    model = DCNModel(cfg, num_cross_layers=2)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    opt_state = opt.init(params)
    batch = {
        "cat_ids": np.stack(
            [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=32)
             for f in range(fs.num_fields)], axis=1).astype(np.int32),
        "num_vals": np.zeros((32, 0), np.float32),
        "labels": (rng.random(32) < 0.3).astype(np.float32),
    }

    def step(params, opt_state, batch, lookup_fn):
        def loss_fn(p):
            logits = model.apply(p, batch, train=False, lookup_fn=lookup_fn)
            return sigmoid_xent(logits, batch["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    p_ref, _, loss_ref = jax.jit(lambda p, s, b: step(p, s, b, None))(
        params, opt_state, batch_j)

    plan = ParallelPlan.create(4, 2, table_rows=cfg.padded_buckets)
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state), plan.shard_batch(batch))

    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(p_ref), jax.device_get(p_out),
    )
