"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded == single-device results for EP lookup, DP training, sharded eval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.parallel import ParallelPlan, make_ep_lookup, make_mesh
from rectpu.train.metrics import sigmoid_xent

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _batch(fs, b, rng):
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack([offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], 1)
    return {
        "cat_ids": ids.astype(np.int32),
        "num_vals": np.zeros((b, 0), np.float32),
        "labels": (rng.random(b) < 0.3).astype(np.float32),
    }


def test_ep_lookup_matches_local(rng):
    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup(mesh)
    v, k = 512, 8
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(16, 26)).astype(np.int32))
    got = lookup(table, ids)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_ep_lookup_grad_matches_local(rng):
    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup(mesh)
    v, k = 256, 4
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(8, 26)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(8, 26, k)).astype(np.float32))

    def obj(fn):
        return jax.grad(lambda t: jnp.sum(w * fn(t, ids)))(table)

    np.testing.assert_allclose(
        np.asarray(obj(lookup)), np.asarray(obj(lambda t, i: jnp.take(t, i, axis=0))),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("shape,dropout_impl", [
    # full mesh-shape sweep with the pure math; dropout ON (the production
    # default, ref deep_fm.py:206) certified for BOTH mask impls — the masks
    # key on the GLOBAL element index (threefry counters / hash_dropout_mask
    # iota), so sharded training with dropout is exactly the single-device
    # function (round-4 VERDICT item 2)
    ((8, 1), None), ((4, 2), None), ((2, 4), None),
    ((2, 4), "threefry"), ((4, 2), "hash"), ((2, 4), "hash"),
])
def test_sharded_train_step_matches_single_device(shape, dropout_impl, rng):
    """One jitted train step on a (data x model) mesh must equal the
    single-device step bit-for-bit (same math, just sharded) — including
    train=True with dropout active."""
    nd, nm = shape
    fs = ml_100k_feature_set()
    train = dropout_impl is not None
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm, dropout=0.1 if train else 0.0,
                      dropout_impl=dropout_impl or "threefry")
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    opt_state = opt.init(params)
    batch = _batch(fs, 32, rng)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(123)

    def step(params, opt_state, batch, lookup_fn):
        def loss_fn(p):
            logits = model.apply(p, batch, train=train, rng=step_rng,
                                 lookup_fn=lookup_fn)
            return sigmoid_xent(logits, batch["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    # single device reference
    p_ref, _, loss_ref = jax.jit(lambda p, s, b: step(p, s, b, None))(
        params, opt_state, batch_j
    )

    # sharded
    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets)
    p_sh = plan.shard_params(params)
    s_sh = plan.shard_params(opt_state)
    b_sh = plan.shard_batch(batch)
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        p_sh, s_sh, b_sh
    )

    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


def test_param_sharding_rules():
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, table_padding=32)
    plan = ParallelPlan.create(2, 4, table_rows=cfg.padded_buckets)
    model = DeepFMModel(cfg)
    params = plan.shard_params(model.init(jax.random.PRNGKey(0)))
    emb_sharding = params["emb"].sharding
    assert emb_sharding.spec == jax.sharding.PartitionSpec("model", None)
    # mlp kernels replicated
    assert params["mlp"][0]["kernel"].sharding.spec == jax.sharding.PartitionSpec()


@pytest.mark.parametrize("dropout_impl", [None, "hash"])
def test_trainer_with_plan_matches_unsharded(synthetic_dir, tmp_path, dropout_impl):
    """A full Trainer run on a 4x2 (DP x EP) mesh reproduces the unsharded
    run's eval metrics exactly — the strongest distributed-correctness check.
    The dropout_impl='hash' case runs the PRODUCTION configuration (training
    with dropout active every step) through the real loop."""
    from rectpu.io.loader import CsvDataset
    from rectpu.train.loop import TrainConfig, Trainer

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=16,
                      dropout=0.1 if dropout_impl else 0.0,
                      dropout_impl=dropout_impl or "threefry")
    train_ds = CsvDataset(synthetic_dir["train"], fs)
    eval_ds = CsvDataset(synthetic_dir["test"], fs)
    # eval_auc=exact under the plan: the probability gather is collective
    # (round 4) — the equality below then pins the EXACT AUC, not just the
    # streaming approximation
    tc = TrainConfig(batch_size=64, train_steps=400, steps_per_loop=50,
                     save_checkpoints_steps=10**6, eval_auc="exact")

    def run(plan, tag):
        model = DeepFMModel(cfg)
        trainer = Trainer(
            model, model.default_optimizer(), train_ds, eval_ds, tmp_path / tag, tc, plan=plan
        )
        return trainer.train_and_evaluate(restore=False)

    m_ref = run(None, "unsharded")
    m_sh = run(ParallelPlan.create(4, 2, table_rows=cfg.padded_buckets), "sharded")
    assert m_sh["count"] == 1200
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(m_ref[key], m_sh[key], rtol=1e-5, atol=1e-6), (key, m_ref, m_sh)


def test_ep2d_lookup_matches_local(rng):
    from rectpu.parallel.embedding_ep import make_ep_lookup_2d

    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup_2d(mesh)
    v, k = 512, 8
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(16, 26)).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(lookup(table, ids)), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
    )


def test_ep2d_lookup_grad_matches_local(rng):
    from rectpu.parallel.embedding_ep import make_ep_lookup_2d

    mesh = make_mesh(4, 2)
    lookup = make_ep_lookup_2d(mesh)
    v, k = 256, 4
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(8, 26)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(8, 26, k)).astype(np.float32))

    def obj(fn):
        return jax.grad(lambda t: jnp.sum(w * fn(t, ids)))(table)

    np.testing.assert_allclose(
        np.asarray(obj(lookup)), np.asarray(obj(lambda t, i: jnp.take(t, i, axis=0))),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("ep_mode", ["1d", "2d", "dedup"])
def test_sharded_train_step_both_ep_modes(ep_mode, rng):
    """2x4 mesh, both EP exchanges: identical to the single-device step."""
    nd, nm = 2, 4
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm)
    model = DeepFMModel(cfg)
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
        params, opt_state, batch_j
    )
    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets, ep_mode=ep_mode)
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state), plan.shard_batch(batch)
    )
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2)])
def test_ep_dedup_lookup_matches_local(mesh_shape, rng):
    from rectpu.parallel.embedding_ep import make_ep_lookup_dedup

    mesh = make_mesh(*mesh_shape)
    lookup = make_ep_lookup_dedup(mesh)
    v, k = 512, 8
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    # heavy duplication (ids from a small range) exercises the dedup path
    ids = jnp.asarray(rng.integers(0, 40, size=(16, 26)).astype(np.int32) * 12)
    np.testing.assert_allclose(
        np.asarray(lookup(table, ids)), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
    )


def test_ep_dedup_lookup_grad_matches_local(rng):
    """Gradients dedup-accumulate locally, ride the all_to_all back, and
    scatter into the owning shard — must equal the plain gather's grad."""
    from rectpu.parallel.embedding_ep import make_ep_lookup_dedup

    mesh = make_mesh(4, 2)
    lookup = make_ep_lookup_dedup(mesh)
    v, k = 256, 4
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(8, 26)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(8, 26, k)).astype(np.float32))

    def obj(fn):
        return jax.grad(lambda t: jnp.sum(w * fn(t, ids)))(table)

    np.testing.assert_allclose(
        np.asarray(obj(lookup)), np.asarray(obj(lambda t, i: jnp.take(t, i, axis=0))),
        rtol=1e-5, atol=1e-6,
    )


def test_ep_dedup_capacity_starved_drops(rng):
    """peer_capacity=1 cannot carry the requests: dropped ids come back as
    ZERO embeddings (MoE-capacity contract), never garbage."""
    from rectpu.parallel.embedding_ep import make_ep_lookup_dedup

    mesh = make_mesh(2, 4)
    v, k = 512, 8
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32) + 1.0)
    ids = jnp.asarray(rng.integers(0, v, size=(16, 26)).astype(np.int32))
    got = np.asarray(make_ep_lookup_dedup(mesh, peer_capacity=1)(table, ids))
    ref = np.asarray(jnp.take(table, ids, axis=0))
    # every output row is either exactly right or exactly zero
    row_ok = np.isclose(got, ref, rtol=1e-6).all(axis=-1)
    row_zero = (got == 0.0).all(axis=-1)
    assert np.all(row_ok | row_zero)
    assert row_zero.any()  # capacity 1 must actually drop something


def test_ep2d_flat_lookup_matches_local(rng):
    """Lane-packed EP exchange == the local flat lookup (values + lin)."""
    from rectpu.ops.embedding import lookup_flat
    from rectpu.parallel.embedding_ep import make_ep_lookup_2d_flat

    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup_2d_flat(mesh)
    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4  # divisible by the model axis
    table = jnp.asarray(rng.normal(size=(v, k + 1)).astype(np.float32))
    ids = jnp.asarray(_batch(fs, 16, rng)["cat_ids"])
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
    got_emb, got_lin = lookup(table, ids)
    ref_emb, ref_lin = lookup_flat(table, ids, field_info, k)
    np.testing.assert_allclose(np.asarray(got_emb), np.asarray(ref_emb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_lin), np.asarray(ref_lin), rtol=1e-5,
                               atol=1e-6)


def test_ep2d_flat_grad_matches_local(rng):
    from rectpu.ops.embedding import lookup_flat
    from rectpu.parallel.embedding_ep import make_ep_lookup_2d_flat

    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup_2d_flat(mesh)
    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4
    table = jnp.asarray(rng.normal(size=(v, k + 1)).astype(np.float32))
    ids = jnp.asarray(_batch(fs, 16, rng)["cat_ids"])
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
    w_emb = jnp.asarray(rng.normal(size=(16, fs.num_fields * k)).astype(np.float32))
    w_lin = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))

    def obj(fn):
        def f(t):
            emb, lin = fn(t)
            return jnp.sum(w_emb * emb) + jnp.sum(w_lin * lin)
        return jax.grad(f)(table)

    g_sh = obj(lambda t: lookup(t, ids))
    g_ref = obj(lambda t: lookup_flat(t, ids, field_info, k))
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_flat_train_step_matches_single_device(rng):
    """flat_layout + 2D EP: the full sharded train step equals the
    single-device FLAT step (the plan's .flat_variant upgrade path)."""
    nd, nm = 2, 4
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm, packed_linear=True, flat_layout=True)
    model = DeepFMModel(cfg)
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
        params, opt_state, batch_j
    )
    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets, ep_mode="2d")
    assert getattr(plan.lookup_fn, "flat_variant", None) is not None
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state), plan.shard_batch(batch)
    )
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


@pytest.mark.parametrize("has_lin", [True, False])
def test_ep_dedup_flat_lookup_matches_local(rng, has_lin):
    """Flat dedup exchange == the local flat lookup (values, lin, grads)."""
    from rectpu.ops.embedding import lookup_flat
    from rectpu.parallel.embedding_ep import make_ep_lookup_dedup_flat

    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup_dedup_flat(mesh)
    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4
    w = k + 1 if has_lin else k
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32))
    ids = jnp.asarray(_batch(fs, 16, rng)["cat_ids"])
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))

    got_emb, got_lin = lookup(table, ids, has_lin=has_lin)
    ref_emb, ref_lin = lookup_flat(table, ids, field_info, k)
    np.testing.assert_allclose(np.asarray(got_emb), np.asarray(ref_emb), rtol=1e-6)
    if has_lin:
        np.testing.assert_allclose(np.asarray(got_lin), np.asarray(ref_lin),
                                   rtol=1e-5, atol=1e-6)
    else:
        assert got_lin is None

    w_emb = jnp.asarray(rng.normal(size=(16, fs.num_fields * k)).astype(np.float32))

    def obj(fn):
        def f(t):
            emb, lin = fn(t)
            out = jnp.sum(w_emb * emb)
            return out + jnp.sum(lin) if lin is not None else out
        return jax.grad(f)(table)

    g_sh = obj(lambda t: lookup(t, ids, has_lin=has_lin))
    g_ref = obj(lambda t: lookup_flat(t, ids, field_info, k))
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_flat_train_step_dedup_matches_single_device(rng):
    """flat_layout + dedup EP: the sharded train step equals the
    single-device flat step (plan attaches the flat dedup variant)."""
    nd, nm = 2, 4
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm, packed_linear=True, flat_layout=True)
    model = DeepFMModel(cfg)
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
        params, opt_state, batch_j
    )
    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets, ep_mode="dedup")
    assert getattr(plan.lookup_fn, "flat_variant", None) is not None
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state), plan.shard_batch(batch)
    )
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


@pytest.mark.parametrize("has_lin", [True, False])
def test_ep1d_flat_lookup_matches_local(rng, has_lin):
    """Flat 1D exchange (masked gather + psum) == the local flat lookup."""
    from rectpu.ops.embedding import lookup_flat
    from rectpu.parallel.embedding_ep import make_ep_lookup_flat

    mesh = make_mesh(2, 4)
    lookup = make_ep_lookup_flat(mesh)
    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4
    w = k + 1 if has_lin else k
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32))
    ids = jnp.asarray(_batch(fs, 16, rng)["cat_ids"])
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))

    got_emb, got_lin = lookup(table, ids, has_lin=has_lin)
    ref_emb, ref_lin = lookup_flat(table, ids, field_info, k)
    np.testing.assert_allclose(np.asarray(got_emb), np.asarray(ref_emb), rtol=1e-6)
    if has_lin:
        np.testing.assert_allclose(np.asarray(got_lin), np.asarray(ref_lin),
                                   rtol=1e-5, atol=1e-6)
    else:
        assert got_lin is None

    w_emb = jnp.asarray(rng.normal(size=(16, fs.num_fields * k)).astype(np.float32))

    def obj(fn):
        def f(t):
            emb, lin = fn(t)
            out = jnp.sum(w_emb * emb)
            return out + jnp.sum(lin) if lin is not None else out
        return jax.grad(f)(table)

    g_sh = obj(lambda t: lookup(t, ids, has_lin=has_lin))
    g_ref = obj(lambda t: lookup_flat(t, ids, field_info, k))
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-6)


def test_sharded_flat_train_step_1d_matches_single_device(rng):
    """flat_layout + 1D EP: the sharded train step equals the single-device
    flat step (plan now attaches a flat variant in 1d mode too)."""
    nd, nm = 2, 4
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm, packed_linear=True, flat_layout=True)
    model = DeepFMModel(cfg)
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
        params, opt_state, batch_j
    )
    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets, ep_mode="1d")
    assert getattr(plan.lookup_fn, "flat_variant", None) is not None
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state), plan.shard_batch(batch)
    )
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


# --- Tensor parallelism for the dense towers (SURVEY §2c TP row) -------------


@pytest.mark.parametrize("shape", [(2, 4), (4, 2)])
def test_tp_train_step_matches_single_device(shape, rng):
    """tp_mlp=True: Megatron column/row-sharded towers must reproduce the
    single-device step (allclose: GSPMD's psum changes reduction order)."""
    nd, nm = shape
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm)
    model = DeepFMModel(cfg)
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
        params, opt_state, batch_j
    )

    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets, tp_mlp=True)
    p_sh = plan.shard_params(params)
    s_sh = plan.shard_params(opt_state)
    b_sh = plan.shard_batch(batch)
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        p_sh, s_sh, b_sh
    )

    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5
        ),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


def test_tp_param_sharding_rules():
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=32)
    plan = ParallelPlan.create(2, 4, table_rows=cfg.padded_buckets, tp_mlp=True)
    model = DeepFMModel(cfg)
    params = plan.shard_params(model.init(jax.random.PRNGKey(0)))
    P = jax.sharding.PartitionSpec
    # layer 0: column-sharded kernel + sharded bias
    assert params["mlp"][0]["kernel"].sharding.spec == P(None, "model")
    assert params["mlp"][0]["bias"].sharding.spec == P("model")
    # layer 1: row-sharded kernel, replicated bias
    assert params["mlp"][1]["kernel"].sharding.spec == P("model", None)
    assert params["mlp"][1]["bias"].sharding.spec == P()
    # final logit layer (out=1): row-sharded on the input dim
    assert params["mlp"][2]["kernel"].sharding.spec == P("model", None)
    # embedding table keeps the EP rule
    assert params["emb"].sharding.spec == P("model", None)
    # optimizer-state twins follow the same path rules
    opt_state = plan.shard_params(model.default_optimizer().init(params))
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    kernel_specs = {
        tuple(str(k) for k in path): leaf.sharding.spec
        for path, leaf in flat
        if "kernel" in str(path[-1])
    }
    assert any(s == P(None, "model") for s in kernel_specs.values())


# --- MXU scatter in the EP backward (round-3 VERDICT item 2) ------------------


@pytest.mark.parametrize("mode", ["2d", "1d"])
@pytest.mark.parametrize("has_lin", [True, False])
def test_ep_flat_grad_mxu_matches_xla(rng, mode, has_lin):
    """scatter_impl='mxu' on the flat EP exchanges: the table cotangent built
    by the sorted one-hot MXU rebuild equals the autodiff serial scatter."""
    from rectpu.parallel.embedding_ep import (
        make_ep_lookup_2d_flat,
        make_ep_lookup_flat,
    )

    mesh = make_mesh(2, 4)
    factory = make_ep_lookup_2d_flat if mode == "2d" else make_ep_lookup_flat
    lookup_xla = factory(mesh)
    lookup_mxu = factory(mesh, scatter_impl="mxu")
    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4
    w = k + 1 if has_lin else k
    table = jnp.asarray(rng.normal(size=(v, w)).astype(np.float32))
    ids_np = np.stack(
        [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=16)
         for f in range(fs.num_fields)], 1).astype(np.int32)
    ids = jnp.asarray(ids_np)
    w_emb = jnp.asarray(rng.normal(size=(16, fs.num_fields * k)).astype(np.float32))

    def obj(fn):
        def f(t):
            emb, lin = fn(t, ids, has_lin=has_lin)
            out = jnp.sum(w_emb * emb)
            return out + jnp.sum(lin) if lin is not None else out
        return jax.grad(f)(table)

    # forward values identical too (the custom VJP must not change the primal)
    e_x, l_x = lookup_xla(table, ids, has_lin=has_lin)
    e_m, l_m = lookup_mxu(table, ids, has_lin=has_lin)
    np.testing.assert_allclose(np.asarray(e_x), np.asarray(e_m), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(obj(lookup_mxu)), np.asarray(obj(lookup_xla)),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("fm_order,dropout", [(2, False), (3, False), (2, True)])
def test_sharded_flat_train_step_mxu_matches_single_device(rng, fm_order, dropout):
    """flat_layout + 2D EP + scatter_impl='mxu' end to end: the full sharded
    train step (custom-VJP MXU cotangent on every shard) equals the
    single-device flat step. fm_order=3 locks the sharded==unsharded
    invariant for the order-3 term too (ADVICE round-2); dropout=True runs
    the scaled-preset combination (flat + mxu + hash dropout, train=True)."""
    nd, nm = 2, 4
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8 * nm, packed_linear=True, flat_layout=True,
                      dropout=0.1 if dropout else 0.0, dropout_impl="hash")
    model = DeepFMModel(cfg, fm_order=fm_order)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    opt_state = opt.init(params)
    batch = _batch(fs, 32, rng)
    batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
    step_rng = jax.random.PRNGKey(321)

    def step(params, opt_state, batch, lookup_fn):
        def loss_fn(p):
            logits = model.apply(p, batch, train=dropout, rng=step_rng,
                                 lookup_fn=lookup_fn)
            return sigmoid_xent(logits, batch["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    p_ref, _, loss_ref = jax.jit(lambda p, s, b: step(p, s, b, None))(
        params, opt_state, batch_j
    )
    plan = ParallelPlan.create(nd, nm, table_rows=cfg.padded_buckets,
                               ep_mode="2d", scatter_impl="mxu")
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        plan.shard_params(params), plan.shard_params(opt_state), plan.shard_batch(batch)
    )
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        ),
        jax.device_get(p_ref), jax.device_get(p_out),
    )


@pytest.mark.parametrize("flat", [False, True])
def test_ep_dedup_grad_mxu_matches_xla(rng, flat):
    """scatter_impl='mxu' on the dedup exchanges: the owner-side gather's
    transpose (dedup + scatter_rows rebuild) equals autodiff's scatter."""
    from rectpu.ops.embedding import lookup_flat
    from rectpu.parallel.embedding_ep import (
        make_ep_lookup_dedup,
        make_ep_lookup_dedup_flat,
    )

    mesh = make_mesh(2, 4)
    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4
    ids = jnp.asarray(_batch(fs, 16, rng)["cat_ids"])

    if flat:
        table = jnp.asarray(rng.normal(size=(v, k + 1)).astype(np.float32))
        w_emb = jnp.asarray(
            rng.normal(size=(16, fs.num_fields * k)).astype(np.float32))

        def obj(fn):
            def f(t):
                emb, lin = fn(t, ids)
                return jnp.sum(w_emb * emb) + jnp.sum(lin)
            return jax.grad(f)(table)

        g_x = obj(make_ep_lookup_dedup_flat(mesh))
        g_m = obj(make_ep_lookup_dedup_flat(mesh, scatter_impl="mxu"))
    else:
        table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
        w3 = jnp.asarray(
            rng.normal(size=(16, fs.num_fields, k)).astype(np.float32))

        def obj(fn):
            return jax.grad(lambda t: jnp.sum(w3 * fn(t, ids)))(table)

        g_x = obj(make_ep_lookup_dedup(mesh))
        g_m = obj(make_ep_lookup_dedup(mesh, scatter_impl="mxu"))

    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_x),
                               rtol=1e-5, atol=1e-6)
