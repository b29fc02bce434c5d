"""Sparse-update fast step: correctness vs dense Adam and a lazy-Adam oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.fast_step import make_sparse_deepfm_step
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import adam
from rectpu.train.sparse import adam_lr_t, dedupe_rows, sparse_adam_rows


def test_dedupe_rows_sums_duplicates():
    ids = jnp.asarray([5, 3, 5, 7, 3, 3], jnp.int32)
    grads = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    rows, row_grads = dedupe_rows(ids, grads, num_rows=10)
    rows_np, rg = np.asarray(rows), np.asarray(row_grads)
    # unique rows in sorted order, padding = num_rows (dropped sentinel)
    assert list(rows_np[:3]) == [3, 5, 7]
    assert (rows_np[3:] == 10).all()
    np.testing.assert_allclose(rg[0], grads[1] + grads[4] + grads[5])  # id 3
    np.testing.assert_allclose(rg[1], grads[0] + grads[2])  # id 5
    np.testing.assert_allclose(rg[2], grads[3])  # id 7
    np.testing.assert_allclose(rg[3:], 0.0)


def test_sparse_adam_rows_matches_dense_on_touched():
    rng = np.random.default_rng(0)
    v, k = 50, 4
    p = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    m = jnp.zeros((v, k))
    vv = jnp.zeros((v, k))
    ids = jnp.asarray([3, 7, 3, 20], jnp.int32)
    g_rows = jnp.asarray(rng.normal(size=(4, k)).astype(np.float32))
    # dense reference: scatter grads then dense Adam step 1
    dense_g = np.zeros((v, k), np.float32)
    for i, r in enumerate(np.asarray(ids)):
        dense_g[r] += np.asarray(g_rows)[i]
    opt = adam(0.01)
    state = opt.init({"p": p})
    p_dense, _ = opt.update({"p": jnp.asarray(dense_g)}, state, {"p": p})

    rows, rg = dedupe_rows(ids, g_rows, v)
    lr_t = adam_lr_t(0.01, jnp.asarray(1))
    p_sparse, m2, v2 = sparse_adam_rows(p, m, vv, rows, rg, lr_t)
    np.testing.assert_allclose(np.asarray(p_sparse), np.asarray(p_dense["p"]), rtol=1e-6)
    # untouched rows keep zero m/v
    assert float(jnp.abs(m2[0]).sum()) == 0.0


@pytest.fixture(scope="module")
def setup():
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16))
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    b = 64
    offs, sizes = fs.offsets, fs.field_sizes
    batches = []
    for i in range(3):
        r = np.random.default_rng(10 + i)
        batches.append({
            "cat_ids": jnp.asarray(np.stack(
                [offs[f] + r.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], 1
            ).astype(np.int32)),
            "num_vals": jnp.zeros((b, 0), jnp.float32),
            "labels": jnp.asarray((r.random(b) < 0.3).astype(np.float32)),
        })
    return model, params, batches


def test_fast_step_first_step_matches_dense(setup):
    """From zero optimizer state, step 1 of lazy Adam == dense Adam exactly."""
    model, params, batches = setup
    batch = batches[0]
    rng = jax.random.PRNGKey(3)

    # dense step
    opt = adam(0.001)
    state = opt.init(params)

    def loss_fn(p):
        return sigmoid_xent(model.apply(p, batch, train=False), batch["labels"]).mean()

    loss_d, grads = jax.value_and_grad(loss_fn)(params)
    p_dense, _ = opt.update(grads, state, params)

    # sparse fast step (dropout off: train=True but cfg.dropout == 0)
    init_opt, step = make_sparse_deepfm_step(model, learning_rate=0.001)
    opt_state = init_opt(params)
    p_sparse, opt_state, loss_s = jax.jit(step)(params, opt_state, batch, rng, jnp.asarray(0))

    assert np.isclose(float(loss_d), float(loss_s), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        jax.device_get(p_dense), jax.device_get(p_sparse),
    )


def test_fast_step_multi_step_lazy_oracle(setup):
    """Multi-step: table rows follow lazy Adam (stale m/v on untouched rows)."""
    model, params, batches = setup
    rng = jax.random.PRNGKey(3)
    init_opt, step = make_sparse_deepfm_step(model, learning_rate=0.001)
    opt_state = init_opt(params)
    jstep = jax.jit(step)

    # oracle: numpy lazy Adam on the emb table driven by per-step dense grads
    emb = np.asarray(params["emb"]).copy()
    m = np.zeros_like(emb)
    v = np.zeros_like(emb)
    p_cur = params
    for t, batch in enumerate(batches, start=1):
        def loss_fn(p):
            return sigmoid_xent(model.apply(p, batch, train=False), batch["labels"]).mean()

        g = np.asarray(jax.grad(loss_fn)(p_cur)["emb"])
        touched = np.unique(np.asarray(batch["cat_ids"]).ravel())
        lr_t = 0.001 * np.sqrt(1 - 0.999**t) / (1 - 0.9**t)
        m[touched] = 0.9 * m[touched] + 0.1 * g[touched]
        v[touched] = 0.999 * v[touched] + 0.001 * g[touched] ** 2
        emb[touched] -= lr_t * m[touched] / (np.sqrt(v[touched]) + 1e-8)

        p_cur, opt_state, _ = jstep(p_cur, opt_state, batch, rng, jnp.asarray(t - 1))

    np.testing.assert_allclose(np.asarray(p_cur["emb"]), emb, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("family", ["deep", "dlrm", "dcn"])
def test_sparse_step_generalizes_to_zoo(family, synthetic_dir):
    """make_sparse_step's first step from zero state matches the dense Adam
    step for every apply_looked model (table rows update sparsely)."""
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import MODEL_REGISTRY, TowerConfig
    from rectpu.train.fast_step import make_sparse_step
    from rectpu.train.metrics import sigmoid_xent
    from rectpu.train.optimizers import adam

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(8,))
    model = MODEL_REGISTRY[family](cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(3)
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [fs.offsets[f] + rng_np.integers(0, fs.field_sizes[f], size=32)
             for f in range(fs.num_fields)], axis=1).astype(np.int32)),
        "num_vals": jnp.zeros((32, 0), jnp.float32),
        "labels": jnp.asarray((rng_np.random(32) < 0.3).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(7)

    # dense reference step
    opt = adam(learning_rate=0.001)
    opt_state = opt.init(params)

    def loss_fn(p):
        logits = model.apply(p, batch, train=False, rng=rng)
        return sigmoid_xent(logits, batch["labels"]).mean()

    loss_d, grads = jax.value_and_grad(loss_fn)(params)
    p_dense, _ = opt.update(grads, opt_state, params)

    # sparse fast step (train=True but these models only use rng for dropout,
    # which is 0 here)
    init_opt, step = make_sparse_step(model, learning_rate=0.001)
    p_sparse, _, loss_s = jax.jit(step)(params, init_opt(params), batch, rng, 0)

    assert np.isclose(float(loss_d), float(loss_s), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=1e-6),
        jax.device_get(p_dense), jax.device_get(p_sparse),
    )


def test_sparse_step_requires_apply_looked():
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import LinearModel, TowerConfig
    from rectpu.train.fast_step import make_sparse_step

    with pytest.raises(ValueError, match="apply_looked"):
        make_sparse_step(LinearModel(TowerConfig(feature_set=ml_100k_feature_set())))


def test_ids_in_field_ranges_guard():
    """The unique_capacity slice contract (ADVICE r4): the pipeline's encoded
    ids always lie in their field ranges, and the debug guard catches a
    violation loudly instead of letting rows be silently dropped."""
    import numpy as np

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.train.sparse import check_ids_in_field_ranges

    fs = ml_100k_feature_set()
    rng = np.random.default_rng(0)
    ids = np.stack(
        [fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=64)
         for f in range(fs.num_fields)],
        axis=1,
    ).astype(np.int32)
    check_ids_in_field_ranges(ids, fs.offsets, fs.field_sizes)  # in-range: ok

    bad = ids.copy()
    bad[3, 1] = fs.offsets[1] + fs.field_sizes[1]  # first id of the NEXT field
    with pytest.raises(ValueError, match="field 1"):
        check_ids_in_field_ranges(bad, fs.offsets, fs.field_sizes)

    neg = ids.copy()
    neg[0, 0] = -1
    with pytest.raises(ValueError, match="field 0"):
        check_ids_in_field_ranges(neg, fs.offsets, fs.field_sizes)


def test_fast_step_dma_scatter_backend_bitwise():
    """scatter_backend='dma' (window-RMW kernel, interpret mode here) ==
    'xla' bitwise on the packed table: same lazy-Adam rows, same untouched
    rows."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.fast_step import make_sparse_step

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      packed_linear=True)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    r = np.random.default_rng(11)
    b = 64
    offs, sizes = fs.offsets, fs.field_sizes
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [offs[f] + r.integers(0, sizes[f], size=b)
             for f in range(fs.num_fields)], 1).astype(np.int32)),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((r.random(b) < 0.3).astype(np.float32)),
    }

    # state_pad=True on both: the dma backend forces lane-aligned slabs
    init_x, step_x = make_sparse_step(model, learning_rate=0.001,
                                      scatter_backend="xla", state_pad=True)
    init_d, step_d = make_sparse_step(model, learning_rate=0.001,
                                      scatter_backend="dma")
    px, sx, _ = jax.jit(step_x)(params, init_x(params), batch, rng, 0)
    pd, sd, _ = jax.jit(step_d)(params, init_d(params), batch, rng, 0)
    # second step exercises nonzero m/v rows too
    px, sx, _ = jax.jit(step_x)(px, sx, batch, rng, 1)
    pd, sd, _ = jax.jit(step_d)(pd, sd, batch, rng, 1)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        jax.device_get((px, sx)), jax.device_get((pd, sd)))


def test_fast_step_lane_padded_mv_bitwise():
    """state_pad=True (the big-table [V, 2*128] m|v layout) == the tight
    [V, 2W] layout bitwise, including the DMA scatter backend on the
    padded slab."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.fast_step import make_sparse_step

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      packed_linear=True)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    r = np.random.default_rng(12)
    b = 64
    offs, sizes = fs.offsets, fs.field_sizes
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [offs[f] + r.integers(0, sizes[f], size=b)
             for f in range(fs.num_fields)], 1).astype(np.int32)),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((r.random(b) < 0.3).astype(np.float32)),
    }

    outs = {}
    for name, kw in [
        ("tight", dict(state_pad=False)),
        ("padded", dict(state_pad=True)),
        ("padded-dma", dict(state_pad=True, scatter_backend="dma")),
    ]:
        init, step = make_sparse_step(model, learning_rate=0.001, **kw)
        p, s, _ = jax.jit(step)(params, init(params), batch, rng, 0)
        p, s, _ = jax.jit(step)(p, s, batch, rng, 1)
        outs[name] = jax.device_get(p)
        if name == "padded":
            mv = s["mv_sparse"]["table"]
            assert mv.shape[1] == 2 * 128, mv.shape  # 5 cols -> 128 pad

    for name in ("padded", "padded-dma"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            outs["tight"], outs[name])


def test_packed_col_pad_table_equality():
    """packed_col_pad=128 (the [V, 128] lane-aligned table) changes NO
    math: apply logits, the fast-step trajectory, and eval all match the
    tight [V, 65] layout (pad columns are zero-init and untouched: their
    grads are zero, so lazy Adam writes zeros back)."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.fast_step import make_sparse_step

    fs = ml_100k_feature_set()
    kw = dict(feature_set=fs, embedding_size=4, hidden_units=(16,),
              packed_linear=True)
    m_t = DeepFMModel(TowerConfig(**kw))
    m_p = DeepFMModel(TowerConfig(**kw, packed_col_pad=128))
    p_t = m_t.init(jax.random.PRNGKey(0))
    p_p = m_p.init(jax.random.PRNGKey(0))
    assert p_p["table"].shape[1] == 128
    np.testing.assert_array_equal(np.asarray(p_p["table"][:, :5]),
                                  np.asarray(p_t["table"]))
    assert float(jnp.abs(p_p["table"][:, 5:]).sum()) == 0.0

    r = np.random.default_rng(13)
    b = 64
    offs, sizes = fs.offsets, fs.field_sizes
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [offs[f] + r.integers(0, sizes[f], size=b)
             for f in range(fs.num_fields)], 1).astype(np.int32)),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((r.random(b) < 0.3).astype(np.float32)),
    }
    # forward equality (the eval/serving path)
    np.testing.assert_allclose(
        np.asarray(m_p.apply(p_p, batch)), np.asarray(m_t.apply(p_t, batch)),
        rtol=1e-6, atol=1e-7)

    # two fast steps: table trajectories match on the real columns
    rng = jax.random.PRNGKey(3)
    for m, p, tag in ((m_t, p_t, "tight"), (m_p, p_p, "padded")):
        init, step = make_sparse_step(m, learning_rate=0.001,
                                      state_pad=True)
        s = init(p)
        p, s, _ = jax.jit(step)(p, s, batch, rng, 0)
        p, s, _ = jax.jit(step)(p, s, batch, rng, 1)
        if tag == "tight":
            want = jax.device_get(p)
        else:
            got = jax.device_get(p)
    np.testing.assert_allclose(got["table"][:, :5], want["table"],
                               rtol=1e-6, atol=1e-8)
    assert float(np.abs(got["table"][:, 5:]).sum()) == 0.0
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        got["mlp"], want["mlp"])


def test_fast_step_bf16_sr_slots_track_fp32():
    """slot_dtype='bfloat16_sr' (the capacity layout): the table trajectory
    tracks the fp32-slot trajectory closely over a few steps (m plain bf16,
    v stochastically rounded — the dense-path recipe, RESULTS.md)."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.fast_step import make_sparse_step

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16,),
                      packed_linear=True)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(3)
    r = np.random.default_rng(14)
    b = 64
    offs, sizes = fs.offsets, fs.field_sizes
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [offs[f] + r.integers(0, sizes[f], size=b)
             for f in range(fs.num_fields)], 1).astype(np.int32)),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((r.random(b) < 0.3).astype(np.float32)),
    }
    trajs = {}
    for name, dt in [("f32", "float32"), ("bf16", "bfloat16_sr")]:
        init, step = make_sparse_step(model, learning_rate=0.001,
                                      slot_dtype=dt, state_pad=True)
        p, s = params, init(params)
        for t in range(4):
            p, s, loss = jax.jit(step)(p, s, batch, rng, t)
        assert np.isfinite(float(loss))
        trajs[name] = np.asarray(jax.device_get(p)["table"])
        if name == "bf16":
            assert s["mv_sparse"]["table"].dtype == jnp.bfloat16
    # bf16 slots perturb the trajectory by rounding noise only
    np.testing.assert_allclose(trajs["bf16"], trajs["f32"], rtol=0.1,
                               atol=2e-3)
