"""Lane-packed (flat) lookup + FM + DeepFM path: parity with the 3D path.

The flat layout (ops/embedding.lookup_flat, ops/fm.fm_cross_flat,
DeepFMModel._apply_flat) must compute the SAME model as the stacked
[B, F, K+1] path — same gathered values, same FM identity, same MLP — with
only reduction-order float differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.ops.embedding import lookup_flat, lookup_take
from rectpu.ops.fm import fm_cross_flat, fm_cross_xla


@pytest.fixture(scope="module")
def setup():
    fs = ml_100k_feature_set()
    rng = np.random.default_rng(11)
    k, b = 8, 96
    v = fs.total_buckets
    table = jnp.asarray(rng.normal(size=(v, k + 1)).astype(np.float32))  # packed [V, K+1]
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], axis=1
    ).astype(np.int32)
    field_info = (tuple(int(o) for o in offs), tuple(sizes))
    return fs, table, jnp.asarray(ids), field_info, k


@pytest.mark.parametrize("threshold", [0, 60, 1500, 10**6])
def test_flat_forward_matches_take(setup, threshold):
    """emb_flat == take(table)[..., :K].reshape(B, F*K); lin == sum_f w[id]."""
    fs, table, ids, field_info, k = setup
    b, f = ids.shape
    emb_flat, lin = lookup_flat(table, ids, field_info, k, small_threshold=threshold)
    ref = lookup_take(table, ids)  # [B, F, K+1]
    np.testing.assert_allclose(
        np.asarray(emb_flat), np.asarray(ref[..., :k]).reshape(b, f * k), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(lin), np.asarray(ref[..., k].sum(axis=1)), rtol=1e-5, atol=1e-6
    )


def test_flat_forward_unpacked_table(setup):
    """A [V, K] table (no linear column) yields lin=None."""
    fs, table, ids, field_info, k = setup
    emb_flat, lin = lookup_flat(table[:, :k], ids, field_info, k, small_threshold=60)
    assert lin is None
    b, f = ids.shape
    ref = lookup_take(table[:, :k], ids).reshape(b, f * k)
    np.testing.assert_allclose(np.asarray(emb_flat), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("threshold", [60, 1500])
@pytest.mark.parametrize("scatter_impl,dense_threshold", [
    ("xla", 16384),
    ("mxu", 16384),  # every big field <= 2000 rows -> all dense-medium one-hot
    ("mxu", 0),      # force every big field into the scatter_rows stream
    ("mxu", 1000),   # mixed: some medium rebuilds, some stream fields
])
def test_flat_grad_matches_take(setup, threshold, scatter_impl, dense_threshold):
    """d table through the flat path == d table through plain gather."""
    fs, table, ids, field_info, k = setup
    b, f = ids.shape
    rng = np.random.default_rng(12)
    w_emb = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    w_lin = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))

    def flat_obj(t):
        emb_flat, lin = lookup_flat(t, ids, field_info, k, small_threshold=threshold,
                                    scatter_impl=scatter_impl,
                                    dense_threshold=dense_threshold)
        return jnp.sum(w_emb * emb_flat) + jnp.sum(w_lin * lin)

    def ref_obj(t):
        looked = lookup_take(t, ids)
        emb = looked[..., :k].reshape(b, f * k)
        lin = looked[..., k].sum(axis=1)
        return jnp.sum(w_emb * emb) + jnp.sum(w_lin * lin)

    g_flat = jax.grad(flat_obj)(table)
    g_ref = jax.grad(ref_obj)(table)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_fm_flat_matches_xla():
    rng = np.random.default_rng(13)
    b, f, k = 64, 26, 8
    v3 = jnp.asarray(rng.normal(size=(b, f, k)).astype(np.float32))
    v2 = v3.reshape(b, f * k)
    got = fm_cross_flat(v2, f, k)
    ref = fm_cross_xla(v3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    g_got = jax.grad(lambda x: jnp.sum(fm_cross_flat(x, f, k)))(v2)
    g_ref = jax.grad(lambda x: jnp.sum(fm_cross_xla(x)))(v3).reshape(b, f * k)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def _batch(fs, b, seed):
    rng = np.random.default_rng(seed)
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], axis=1
    ).astype(np.int32)
    return {
        "cat_ids": jnp.asarray(ids),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((rng.random(b) < 0.3).astype(np.float32)),
    }


@pytest.mark.parametrize("toggles", [(True, True), (True, False), (False, True)])
@pytest.mark.parametrize("scatter_impl", ["xla", "mxu"])
def test_deepfm_flat_matches_standard(setup, toggles, scatter_impl):
    """Full model: flat_layout logits and table grads match the 3D path."""
    use_mf, use_dnn = toggles
    fs = ml_100k_feature_set()
    kwargs = dict(
        feature_set=fs, embedding_size=8, hidden_units=(16, 16),
        packed_linear=True, split_threshold=1500,
    )
    cfg_std = TowerConfig(**kwargs)
    cfg_flat = TowerConfig(flat_layout=True, scatter_impl=scatter_impl, **kwargs)
    m_std = DeepFMModel(cfg_std, use_mf=use_mf, use_dnn=use_dnn)
    m_flat = DeepFMModel(cfg_flat, use_mf=use_mf, use_dnn=use_dnn)
    params = m_std.init(jax.random.PRNGKey(0))
    batch = _batch(fs, 64, seed=21)

    out_std = m_std.apply(params, batch)
    out_flat = m_flat.apply(params, batch)
    np.testing.assert_allclose(
        np.asarray(out_flat), np.asarray(out_std), rtol=1e-4, atol=1e-5
    )

    from rectpu.train.metrics import sigmoid_xent

    def loss(model):
        def f(p):
            return sigmoid_xent(model.apply(p, batch), batch["labels"]).mean()
        return f

    g_std = jax.grad(loss(m_std))(params)
    g_flat = jax.grad(loss(m_flat))(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_std)
    flat_f, _ = jax.tree_util.tree_flatten(g_flat)
    for a, b_ in zip(flat_s, flat_f):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=1e-4, atol=1e-6)


def test_deepfm_flat_trains(setup):
    """Loss decreases under the flat path with the bench dtypes (bf16 gather,
    bf16 table grad) — exercises the custom VJP end-to-end with an optimizer."""
    fs = ml_100k_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=8, hidden_units=(16, 16),
        packed_linear=True, flat_layout=True, split_threshold=1500,
        compute_dtype="bfloat16", table_grad_dtype="bfloat16",
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    state = opt.init(params)
    batch = _batch(fs, 256, seed=31)

    from rectpu.train.metrics import sigmoid_xent

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            return sigmoid_xent(model.apply(pp, batch), batch["labels"]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, s = opt.update(grads, s, p)
        return p, s, loss

    losses = []
    for _ in range(60):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.05, losses[::10]


@pytest.mark.parametrize("scatter_impl", ["xla", "mxu"])
def test_dnn_flat_matches_standard(scatter_impl):
    """DNN: flat_layout logits and emb-table grads match the 3D path
    ([B, F*K] is exactly the MLP input; no linear column)."""
    from rectpu.models.dnn import DNNModel

    fs = ml_100k_feature_set()
    kwargs = dict(feature_set=fs, embedding_size=8, hidden_units=(16, 16),
                  split_threshold=1500)
    m_std = DNNModel(TowerConfig(**kwargs))
    m_flat = DNNModel(TowerConfig(flat_layout=True, scatter_impl=scatter_impl,
                                  **kwargs))
    params = m_std.init(jax.random.PRNGKey(0))
    batch = _batch(fs, 64, 21)

    def logits(model):
        return model.apply(params, batch, train=False)

    np.testing.assert_allclose(np.asarray(logits(m_std)), np.asarray(logits(m_flat)),
                               rtol=1e-5, atol=1e-5)

    def loss(model, p):
        out = model.apply(p, batch, train=False)
        return jnp.mean((out - batch["labels"]) ** 2)

    g_std = jax.grad(lambda p: loss(m_std, p))(params)
    g_flat = jax.grad(lambda p: loss(m_flat, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        g_std, g_flat,
    )


@pytest.mark.parametrize("scatter_impl", ["xla", "mxu"])
def test_wide_deep_flat_matches_standard(scatter_impl):
    """Wide&Deep: flat_layout (one lookup -> MLP input + summed wide logit)
    matches the fused 3D path, logits and grads incl. the linear weights."""
    from rectpu.models.wide_deep import WideDeepModel

    fs = ml_100k_feature_set()
    kwargs = dict(feature_set=fs, embedding_size=8, hidden_units=(16, 16),
                  split_threshold=1500)
    m_std = WideDeepModel(TowerConfig(**kwargs))
    m_flat = WideDeepModel(TowerConfig(flat_layout=True, scatter_impl=scatter_impl,
                                       **kwargs))
    params = m_std.init(jax.random.PRNGKey(1))
    # non-zero linear weights so the wide-path grad check is meaningful
    params["linear"]["w"] = jnp.asarray(
        np.random.default_rng(5).normal(size=params["linear"]["w"].shape)
        .astype(np.float32) * 0.1
    )
    batch = _batch(fs, 64, 22)

    def logits(model):
        return model.apply(params, batch, train=False)

    np.testing.assert_allclose(np.asarray(logits(m_std)), np.asarray(logits(m_flat)),
                               rtol=1e-5, atol=1e-5)

    def loss(model, p):
        out = model.apply(p, batch, train=False)
        return jnp.mean((out - batch["labels"]) ** 2)

    g_std = jax.grad(lambda p: loss(m_std, p))(params)
    g_flat = jax.grad(lambda p: loss(m_flat, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        g_std, g_flat,
    )


def test_wide_deep_packed_matches_unpacked_training():
    """Packed [V, K+1] Wide&Deep (column-split FTRL+Adagrad optimizer)
    reproduces the unpacked per-subtree training trajectory."""
    from rectpu.models.wide_deep import WideDeepModel
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    kwargs = dict(feature_set=fs, embedding_size=8, hidden_units=(16, 16))
    m_u = WideDeepModel(TowerConfig(**kwargs))
    m_p = WideDeepModel(TowerConfig(packed_linear=True, **kwargs))
    assert not m_u.packed and m_p.packed
    p_u = m_u.init(jax.random.PRNGKey(3))
    p_p = m_p.init(jax.random.PRNGKey(3))
    np.testing.assert_array_equal(
        np.asarray(p_p["table"][:, :8]), np.asarray(p_u["emb"])
    )
    opt_u, opt_p = m_u.default_optimizer(), m_p.default_optimizer()
    s_u, s_p = opt_u.init(p_u), opt_p.init(p_p)
    batch = _batch(fs, 128, 41)

    def make_step(model, opt):
        @jax.jit
        def step(p, s):
            def loss_fn(pp):
                out = model.apply(pp, batch, train=False)
                return sigmoid_xent(out, batch["labels"]).mean()
            loss, grads = jax.value_and_grad(loss_fn)(p)
            p, s = opt.update(grads, s, p)
            return p, s, loss
        return step

    step_u, step_p = make_step(m_u, opt_u), make_step(m_p, opt_p)
    for _ in range(10):
        p_u, s_u, loss_u = step_u(p_u, s_u)
        p_p, s_p, loss_p = step_p(p_p, s_p)
    assert np.isclose(float(loss_u), float(loss_p), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_p["table"][:, :8]), np.asarray(p_u["emb"]), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(p_p["table"][:, 8]), np.asarray(p_u["linear"]["w"]),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(p_p["linear"]["b"]), np.asarray(p_u["linear"]["b"]),
        rtol=1e-5, atol=1e-7,
    )


def test_wide_deep_packed_flat_trains():
    """packed + flat Wide&Deep trains (loss decreases) — the production
    configuration: one param read, flat towers, column-split optimizer."""
    from rectpu.models.wide_deep import WideDeepModel
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=8, hidden_units=(16, 16),
                      packed_linear=True, flat_layout=True)
    model = WideDeepModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    state = opt.init(params)
    batch = _batch(fs, 256, 42)

    @jax.jit
    def step(p, s):
        def loss_fn(pp):
            out = model.apply(pp, batch, train=False)
            return sigmoid_xent(out, batch["labels"]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, s = opt.update(grads, s, p)
        return p, s, loss

    losses = []
    for _ in range(50):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.03, losses[::10]
