"""AutoInt (self-attention CTR) model family: attention oracle, layout
equality, sharding, fast step, CLI e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import AutoIntModel, TowerConfig


def _batch(fs, b, rng):
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack([offs[f] + rng.integers(0, sizes[f], size=b)
                    for f in range(fs.num_fields)], 1)
    return {
        "cat_ids": ids.astype(np.int32),
        "num_vals": np.zeros((b, 0), np.float32),
        "labels": (rng.random(b) < 0.3).astype(np.float32),
    }


def test_attention_matches_literal_definition(rng):
    """One interacting layer == the paper's per-head loop in numpy."""
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=6, table_padding=8)
    model = AutoIntModel(cfg, num_layers=1, num_heads=2, head_dim=3)
    params = model.init(jax.random.PRNGKey(0))
    layer = params["att"][0]
    x = rng.normal(size=(4, fs.num_fields, 6)).astype(np.float32)
    got = np.asarray(model._interacting_layer(layer, jnp.asarray(x)))

    wq, wk, wv = (np.asarray(layer[n], np.float64) for n in ("wq", "wk", "wv"))
    wres = np.asarray(layer["wres"], np.float64)
    x64 = x.astype(np.float64)
    nh, dh = 2, 3
    outs = []
    for h in range(nh):
        q = x64 @ wq[:, h * dh:(h + 1) * dh]
        k = x64 @ wk[:, h * dh:(h + 1) * dh]
        v = x64 @ wv[:, h * dh:(h + 1) * dh]
        logits = q @ k.transpose(0, 2, 1) / np.sqrt(dh)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        att = e / e.sum(axis=-1, keepdims=True)
        outs.append(att @ v)
    want = np.maximum(np.concatenate(outs, axis=-1) + x64 @ wres, 0.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_flat_layout_matches_3d_path(rng):
    fs = ml_100k_feature_set()
    kw = dict(feature_set=fs, embedding_size=4, table_padding=8,
              packed_linear=True)
    m_flat = AutoIntModel(TowerConfig(**kw, flat_layout=True))
    m_3d = AutoIntModel(TowerConfig(**kw))
    params = m_flat.init(jax.random.PRNGKey(1))
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 16, rng).items()}
    np.testing.assert_allclose(
        np.asarray(m_flat.apply(params, batch)),
        np.asarray(m_3d.apply(params, batch)), rtol=2e-5, atol=1e-6)


def test_sparse_fast_step_runs(rng):
    from rectpu.train.fast_step import make_sparse_step

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, table_padding=8,
                      packed_linear=True)
    model = AutoIntModel(cfg, num_layers=1)
    params = model.init(jax.random.PRNGKey(0))
    init_opt, step = make_sparse_step(model, learning_rate=0.01)
    o = init_opt(params)
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 16, rng).items()}
    key = jax.random.PRNGKey(2)
    p, o, loss0 = jax.jit(step)(params, o, batch, key, jnp.asarray(0))
    for i in range(1, 30):
        p, o, loss = jax.jit(step)(p, o, batch, key, jnp.asarray(i))
    assert float(loss) < float(loss0)


def test_trainer_e2e_learns_and_serves(synthetic_dir, tmp_path):
    from rectpu.serve.export import latest_export, load_model
    from rectpu.trainers.autoint import build_parser, train_and_evaluate

    args = build_parser().parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / "ai"),
        "--train-steps", "1200", "--batch-size", "64",
        "--steps-per-loop", "100", "--save-checkpoints-steps", "1000000",
    ])
    metrics = train_and_evaluate(args)
    assert metrics["auc"] > 0.57, metrics
    assert metrics["count"] == 1200
    export_dir = latest_export(args.job_dir)
    out = load_model(export_dir).predict({
        "user_id": np.array([1]), "item_id": np.array([10]),
        "age": np.array([25]), "gender": np.array(["F"]),
        "occupation": np.array(["student"]), "zipcode": np.array(["12345"]),
        "release_year": np.array([1994]),
    })
    assert out["probabilities"].shape == (1,)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_matches_single_device(rng):
    from rectpu.parallel import ParallelPlan
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, table_padding=32)
    model = AutoIntModel(cfg, num_layers=1)
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


@pytest.mark.parametrize("g", [2, 4])
def test_grouped_attention_matches_broadcast(rng, g):
    """att_impl='grouped' (block-diagonal MXU packing) == the broadcast
    lowering: off-block logits are masked to -inf and softmax to exactly 0,
    so packing g examples into one [g*M, g*M] attention is EXACT math."""
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=8, table_padding=8)
    m_b = AutoIntModel(cfg, num_layers=2, num_heads=2, att_impl="broadcast")
    m_g = AutoIntModel(cfg, num_layers=2, num_heads=2, att_impl="grouped",
                       att_group=g)
    params = m_b.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 4 * g, rng).items()}

    out_b = np.asarray(m_b.apply(params, batch))
    out_g = np.asarray(m_g.apply(params, batch))
    np.testing.assert_allclose(out_g, out_b, rtol=2e-4, atol=1e-5)

    # gradients agree too (the training path)
    def loss(model, p):
        from rectpu.train.metrics import sigmoid_xent
        return sigmoid_xent(model.apply(p, batch, train=False),
                            batch["labels"]).mean()

    g_b = jax.grad(lambda p: loss(m_b, p))(params)
    g_g = jax.grad(lambda p: loss(m_g, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5),
        g_b, g_g)


def test_grouped_attention_falls_back_on_ragged_batch(rng):
    """A batch not divisible by att_group silently uses the broadcast path
    (e.g. the eval tail batch) — same math either way."""
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=8, table_padding=8)
    m_g = AutoIntModel(cfg, num_layers=1, att_impl="grouped", att_group=8)
    params = m_g.init(jax.random.PRNGKey(0))
    batch = {k: jnp.asarray(v) for k, v in _batch(fs, 9, rng).items()}
    out = np.asarray(m_g.apply(params, batch))
    assert np.all(np.isfinite(out)) and out.shape == (9,)
