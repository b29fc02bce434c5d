"""DLRM model family (rectpu/models/dlrm.py) — beyond-reference addition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DLRMModel, TowerConfig


def _naive_interactions(vectors, itself=False):
    """fp64 loop oracle for the pairwise-dot block."""
    b, n, k = vectors.shape
    out = []
    for i in range(n):
        for j in range(i if itself else i + 1, n):
            out.append(np.einsum("bk,bk->b", vectors[:, i], vectors[:, j]))
    return np.stack(out, axis=1)


@pytest.mark.parametrize("itself", [False, True])
def test_interaction_block_matches_naive(itself):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(5, 7, 4)).astype(np.float64)
    cfg = TowerConfig(feature_set=ml_100k_feature_set())
    model = DLRMModel(cfg, arch_interaction_itself=itself)
    got = np.asarray(model._interact(jnp.asarray(v.astype(np.float32))))
    want = _naive_interactions(v, itself)
    assert got.shape[1] == model._num_interactions if v.shape[1] == 26 else True
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shapes_and_logit_forward():
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=8, hidden_units=(16, 16))
    model = DLRMModel(cfg)
    assert model._n_vectors == 26
    assert model._num_interactions == 26 * 25 // 2
    assert model._top_in_dim == 325
    params = model.init(jax.random.PRNGKey(0))
    assert "bot" not in params  # no numerics
    rng = np.random.default_rng(1)
    batch = {
        "cat_ids": np.stack(
            [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=16)
             for f in range(fs.num_fields)], axis=1).astype(np.int32),
        "num_vals": np.zeros((16, 0), np.float32),
    }
    logits = model.apply(params, batch)
    assert logits.shape == (16,)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_dense_features_ride_bottom_mlp():
    fs = ml_100k_feature_set(numeric=("age", "release_year"))
    cfg = TowerConfig(feature_set=fs, embedding_size=8, hidden_units=(16,))
    model = DLRMModel(cfg, bot_hidden_units=(12,))
    assert model._n_vectors == 27
    assert model._top_in_dim == 8 + 27 * 26 // 2
    params = model.init(jax.random.PRNGKey(0))
    assert [layer["kernel"].shape for layer in params["bot"]] == [(2, 12), (12, 8)]
    rng = np.random.default_rng(2)
    batch = {
        "cat_ids": np.stack(
            [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=8)
             for f in range(fs.num_fields)], axis=1).astype(np.int32),
        "num_vals": rng.normal(size=(8, 2)).astype(np.float32),
    }
    logits = model.apply(params, batch)
    assert logits.shape == (8,)
    # dense features actually influence the logit
    batch2 = dict(batch, num_vals=batch["num_vals"] + 1.0)
    assert np.abs(np.asarray(model.apply(params, batch2)) - np.asarray(logits)).max() > 1e-6


def test_trainer_learns_exports_and_serves(synthetic_dir, tmp_path):
    """Full e2e through the DLRM trainer CLI: learn, export, serve, quantize."""
    import importlib

    mod = importlib.import_module("rectpu.trainers.dlrm")
    parser = mod.build_parser()
    args = parser.parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / "dlrm"),
        "--train-steps", "800",
        "--batch-size", "64",
        "--steps-per-loop", "100",
        "--save-checkpoints-steps", "1000000",
    ])
    metrics = mod.train_and_evaluate(args)
    assert metrics["auc"] > 0.57, metrics

    from rectpu.serve.export import latest_export, load_model
    from rectpu.serve.quant import quantize_serving

    served = load_model(latest_export(args.job_dir))
    assert served.model.name == "dlrm"
    req = {
        "user_id": np.array([1, 2]), "item_id": np.array([10, 20]),
        "age": np.array([25, 60]), "gender": np.array(["F", "M"]),
        "occupation": np.array(["student", "retired"]),
        "zipcode": np.array(["85711", "00000"]),
        "release_year": np.array([1994, 1950]),
    }
    a = served.predict(dict(req))
    assert np.all((a["probabilities"] >= 0) & (a["probabilities"] <= 1))

    q = quantize_serving(served)
    b = q.predict(dict(req))
    np.testing.assert_allclose(a["probabilities"], b["probabilities"], atol=0.03)


@pytest.mark.parametrize("scatter_impl", ["xla", "mxu"])
def test_flat_layout_matches_3d_path(scatter_impl, rng):
    """flat_layout lookup reshaped to [B, F, K] == the 3D lookup: logits AND
    full grads (the DeepFM headline table machinery feeding the pairwise-dot
    interaction block)."""
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set(numeric=("age",))
    pad = 2048 if scatter_impl == "mxu" else 128
    base = dict(feature_set=fs, embedding_size=8, hidden_units=(16,),
                table_padding=pad)
    m3 = DLRMModel(TowerConfig(**base), bot_hidden_units=(6,))
    mf = DLRMModel(TowerConfig(**base, flat_layout=True,
                               scatter_impl=scatter_impl),
                   bot_hidden_units=(6,))
    params = m3.init(jax.random.PRNGKey(0))
    rng_np = rng
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [fs.offsets[f] + rng_np.integers(0, fs.field_sizes[f], size=64)
             for f in range(fs.num_fields)], axis=1).astype(np.int32)),
        "num_vals": jnp.asarray(rng_np.normal(size=(64, 1)).astype(np.float32)),
    }
    labels = jnp.asarray((rng_np.random(64) < 0.3).astype(np.float32))

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


def test_trainer_accepts_flat_layout(synthetic_dir, tmp_path):
    """--flat-layout / --scatter-impl mxu now train DLRM end-to-end."""
    import importlib

    mod = importlib.import_module("rectpu.trainers.dlrm")
    args = mod.build_parser().parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / "x"), "--train-steps", "200",
        "--batch-size", "64", "--steps-per-loop", "100",
        "--save-checkpoints-steps", "1000000",
        "--flat-layout", "--scatter-impl", "mxu",
    ])
    metrics = mod.train_and_evaluate(args)
    assert np.isfinite(metrics["average_loss"])


def test_export_kwargs_roundtrip(tmp_path):
    """bot_hidden_units / arch_interaction_itself survive export -> load."""
    from rectpu.serve.export import export_model, load_model

    fs = ml_100k_feature_set(numeric=("age",))
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(8,))
    model = DLRMModel(cfg, bot_hidden_units=(6, 5), arch_interaction_itself=True)
    params = model.init(jax.random.PRNGKey(3))
    d = export_model(params, model, tmp_path, step=1)
    import json

    meta = json.loads((d / "model.json").read_text())
    assert meta.get("serialized_apply"), meta.get("serialized_apply_error")
    served = load_model(d)
    assert served.model.bot_hidden_units == (6, 5)
    assert served.model.arch_interaction_itself is True
    req = {
        "user_id": np.array([7]), "item_id": np.array([3]), "age": np.array([33]),
        "gender": np.array(["M"]), "occupation": np.array(["artist"]),
        "zipcode": np.array(["10001"]), "release_year": np.array([1999]),
    }
    want = np.asarray(jax.nn.sigmoid(model.apply(params, served.encode_request(req))))
    got = served.predict(req)["probabilities"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_dlrm_step_matches_single_device(rng):
    """DLRM gets EP table sharding for free (shape-keyed rules): one sharded
    train step == the single-device step."""
    from rectpu.parallel import ParallelPlan
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      table_padding=16)
    model = DLRMModel(cfg)
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


@pytest.mark.parametrize("ep_mode", ["2d", "dedup"])
def test_sharded_flat_dlrm_matches_single_device(ep_mode, rng):
    """flat DLRM (lane-packed EP exchange + fast interaction backward)
    under a (2, 4) mesh == the single-device flat step."""
    from rectpu.parallel import ParallelPlan
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      table_padding=16, flat_layout=True)
    model = DLRMModel(cfg)
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

    plan = ParallelPlan.create(2, 4, table_rows=cfg.padded_buckets,
                               ep_mode=ep_mode)
    assert getattr(plan.lookup_fn, "flat_variant", None) is not None
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state),
        plan.shard_batch(batch))

    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(p_ref), jax.device_get(p_out),
    )
