"""xDeepFM (CIN) model family: math oracle, layout equality, CLI e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import TowerConfig, XDeepFMModel


def _batch(fs, b, rng):
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack([offs[f] + rng.integers(0, sizes[f], size=b)
                    for f in range(fs.num_fields)], 1)
    return {
        "cat_ids": ids.astype(np.int32),
        "num_vals": np.zeros((b, 0), np.float32),
        "labels": (rng.random(b) < 0.3).astype(np.float32),
    }


def _cin_reference(emb, cin_layers, out_w, out_b):
    """Literal per-definition CIN (numpy loops over h, m, k)."""
    x0 = np.asarray(emb, np.float64)
    b, m, k = x0.shape
    x = x0
    pools = []
    for layer in cin_layers:
        w = np.asarray(layer["w"], np.float64)  # [H, M, O]
        h, _, o = w.shape
        nxt = np.zeros((b, o, k))
        for oo in range(o):
            for hh in range(h):
                for mm in range(m):
                    nxt[:, oo, :] += w[hh, mm, oo] * x[:, hh, :] * x0[:, mm, :]
        x = nxt
        pools.append(x.sum(axis=2))
    p = np.concatenate(pools, axis=1)
    return p @ np.asarray(out_w, np.float64) + np.asarray(out_b, np.float64)


def test_cin_matches_literal_definition(rng):
    """The dot_general CIN equals the paper's triple loop."""
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(8,),
                      table_padding=8)
    model = XDeepFMModel(cfg, cin_units=(5, 3))
    params = model.init(jax.random.PRNGKey(0))
    emb = rng.normal(size=(6, fs.num_fields, 4)).astype(np.float32)
    got = np.asarray(model._cin_logit(params, jnp.asarray(emb)))
    want = _cin_reference(emb, params["cin"], params["cin_out"]["w"],
                          params["cin_out"]["b"])[:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flat_layout_matches_3d_path(rng):
    """flat_layout apply == the [B, M, K] path on the same params."""
    fs = ml_100k_feature_set()
    kw = dict(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
              table_padding=8, packed_linear=True)
    m_flat = XDeepFMModel(TowerConfig(**kw, flat_layout=True))
    m_3d = XDeepFMModel(TowerConfig(**kw))
    params = m_flat.init(jax.random.PRNGKey(1))
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 16, rng).items()}
    a = np.asarray(m_flat.apply(params, batch, train=False))
    b = np.asarray(m_3d.apply(params, batch, train=False))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_component_toggles(rng):
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, table_padding=8)
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 8, rng).items()}
    for kw in ({"use_cin": False}, {"use_dnn": False}, {"use_linear": False},
               {"use_cin": False, "use_dnn": False}):
        model = XDeepFMModel(cfg, **kw)
        params = model.init(jax.random.PRNGKey(0))
        out = np.asarray(model.apply(params, batch, train=False))
        assert out.shape == (8,) and np.all(np.isfinite(out))
    with pytest.raises(ValueError, match="At least 1"):
        XDeepFMModel(cfg, use_linear=False, use_cin=False, use_dnn=False)


def test_sparse_fast_step_runs(rng):
    """apply_looked hook: the lazy-Adam fast step trains xDeepFM."""
    from rectpu.train.fast_step import make_sparse_step

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(8,),
                      table_padding=8, packed_linear=True)
    model = XDeepFMModel(cfg, cin_units=(4,))
    params = model.init(jax.random.PRNGKey(0))
    init_opt, step = make_sparse_step(model, learning_rate=0.01)
    opt_state = init_opt(params)
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 16, rng).items()}
    key = jax.random.PRNGKey(2)
    p, o, loss0 = jax.jit(step)(params, opt_state, batch, key, jnp.asarray(0))
    for i in range(1, 30):
        p, o, loss = jax.jit(step)(p, o, batch, key, jnp.asarray(i))
    assert float(loss) < float(loss0)  # memorizes the fixed batch


def test_trainer_e2e_learns_and_serves(synthetic_dir, tmp_path):
    from rectpu.serve.export import latest_export, load_model
    from rectpu.trainers.xdeep_fm import build_parser, train_and_evaluate

    args = build_parser().parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / "xdf"),
        "--train-steps", "1200", "--batch-size", "64",
        "--steps-per-loop", "100", "--save-checkpoints-steps", "1000000",
        "--cin-units", "8", "8",
    ])
    metrics = train_and_evaluate(args)
    assert metrics["auc"] > 0.57, metrics
    assert metrics["count"] == 1200

    export_dir = latest_export(args.job_dir)
    assert export_dir is not None
    out = load_model(export_dir).predict({
        "user_id": np.array([1, 2]), "item_id": np.array([10, 20]),
        "age": np.array([25, 40]), "gender": np.array(["F", "M"]),
        "occupation": np.array(["student", "engineer"]),
        "zipcode": np.array(["12345", "54321"]),
        "release_year": np.array([1994, 1980]),
    })
    assert out["probabilities"].shape == (2,)
    assert np.all((out["probabilities"] >= 0) & (out["probabilities"] <= 1))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_matches_single_device(rng):
    """xDeepFM under 2x4 EP sharding: sharded == single-device exactly
    (the shape-keyed sharding rules generalize to the new family)."""
    from rectpu.parallel import ParallelPlan
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      table_padding=32)
    model = XDeepFMModel(cfg, cin_units=(4,))
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    opt_state = opt.init(params)
    batch = _batch(fs, 32, rng)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}

    def step(params, opt_state, batch, lookup_fn):
        def loss_fn(p):
            logits = model.apply(p, batch, train=False, lookup_fn=lookup_fn)
            return sigmoid_xent(logits, batch["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    p_ref, _, loss_ref = jax.jit(lambda p, s, b: step(p, s, b, None))(
        params, opt_state, batch_j)
    plan = ParallelPlan.create(2, 4, table_rows=cfg.padded_buckets)
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state),
        plan.shard_batch(batch))
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(p_ref), jax.device_get(p_out),
    )
