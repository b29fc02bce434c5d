"""Model-zoo tests: logit parity vs NumPy re-implementations, shapes, toggles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DeepFMModel, DNNModel, LinearModel, TowerConfig, WideDeepModel


@pytest.fixture(scope="module")
def cfg():
    return TowerConfig(feature_set=ml_100k_feature_set(), embedding_size=4, hidden_units=(16, 16))


@pytest.fixture(scope="module")
def batch(cfg):
    rng = np.random.default_rng(1)
    b = 32
    offs = cfg.feature_set.offsets
    sizes = cfg.feature_set.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=b) for f in range(cfg.num_fields)], axis=1
    ).astype(np.int32)
    return {
        "cat_ids": jnp.asarray(ids),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((rng.random(b) < 0.3).astype(np.float32)),
    }


def _np_mlp(layers, x):
    for layer in layers[:-1]:
        x = np.maximum(x @ np.asarray(layer["kernel"]) + np.asarray(layer["bias"]), 0)
    return x @ np.asarray(layers[-1]["kernel"]) + np.asarray(layers[-1]["bias"])


def test_linear_numpy_parity(cfg, batch):
    model = LinearModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # non-zero weights for a meaningful check
    params["linear"]["w"] = jnp.asarray(
        np.random.default_rng(2).normal(size=params["linear"]["w"].shape).astype(np.float32)
    )
    params["linear"]["b"] = jnp.asarray(0.7, jnp.float32)
    got = model.apply(params, batch)
    w = np.asarray(params["linear"]["w"])
    expect = w[np.asarray(batch["cat_ids"])].sum(axis=1) + 0.7
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_dnn_numpy_parity(cfg, batch):
    model = DNNModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    got = model.apply(params, batch, train=False)
    emb = np.asarray(params["emb"])[np.asarray(batch["cat_ids"])]  # [B, F, K]
    flat = emb.reshape(emb.shape[0], -1)
    expect = _np_mlp(params["mlp"], flat)[:, 0]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_wide_deep_is_sum(cfg, batch):
    model = WideDeepModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    params["linear"]["w"] = jnp.ones_like(params["linear"]["w"]) * 0.01
    wide = np.asarray(jnp.take(params["linear"]["w"], batch["cat_ids"], axis=0).sum(1))
    deep = np.asarray(DNNModel(cfg).apply(params, batch))
    got = np.asarray(model.apply(params, batch))
    np.testing.assert_allclose(got, wide + deep, rtol=1e-5)


def test_deep_fm_numpy_parity(cfg, batch):
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(3))
    params["linear"]["w"] = jnp.asarray(
        np.random.default_rng(5).normal(scale=0.1, size=params["linear"]["w"].shape).astype(np.float32)
    )
    got = np.asarray(model.apply(params, batch, train=False))

    ids = np.asarray(batch["cat_ids"])
    w = np.asarray(params["linear"]["w"])
    linear = w[ids].sum(axis=1) + np.asarray(params["linear"]["b"])
    emb = np.asarray(params["emb"])[ids]  # [B, F, K]
    s = emb.sum(axis=1)
    fm = 0.5 * (np.square(s) - np.square(emb).sum(axis=1)).sum(axis=1)
    dnn = _np_mlp(params["mlp"], emb.reshape(emb.shape[0], -1))[:, 0]
    np.testing.assert_allclose(got, linear + fm + dnn, rtol=1e-4, atol=1e-4)


def test_deep_fm_component_toggles(cfg, batch):
    full = DeepFMModel(cfg)
    params = full.init(jax.random.PRNGKey(0))
    for kwargs, keys in [
        ({"use_dnn": False}, {"linear", "emb"}),
        ({"use_mf": False}, {"linear", "emb", "mlp"}),
        ({"use_linear": False}, {"emb", "mlp"}),
        ({"use_linear": False, "use_dnn": False}, {"emb"}),
    ]:
        m = DeepFMModel(cfg, **{"use_linear": True, "use_mf": True, "use_dnn": True, **kwargs})
        p = m.init(jax.random.PRNGKey(0))
        assert set(p.keys()) == keys
        out = m.apply(p, batch)
        assert out.shape == (batch["cat_ids"].shape[0],)
    with pytest.raises(ValueError):
        DeepFMModel(cfg, use_linear=False, use_mf=False, use_dnn=False)


def test_deep_fm_numeric_columns():
    fs = ml_100k_feature_set(numeric=("age",))
    cfg = TowerConfig(feature_set=fs, embedding_size=4)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert params["num_emb"].shape == (1, 1, 4)
    b = 8
    rng = np.random.default_rng(0)
    offs, sizes = fs.offsets, fs.field_sizes
    batch = {
        "cat_ids": jnp.asarray(
            np.stack([offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], 1)
        ),
        "num_vals": jnp.asarray(rng.normal(size=(b, 1)).astype(np.float32)),
    }
    out = model.apply(params, batch)
    assert out.shape == (b,)
    # numeric path must contribute: zeroing num_vals changes the logit
    out0 = model.apply(params, {**batch, "num_vals": jnp.zeros((b, 1))})
    assert not np.allclose(np.asarray(out), np.asarray(out0))


def test_dropout_only_in_train(cfg, batch):
    cfg_d = TowerConfig(feature_set=cfg.feature_set, embedding_size=4, hidden_units=(16, 16), dropout=0.5)
    model = DNNModel(cfg_d)
    params = model.init(jax.random.PRNGKey(0))
    e1 = model.apply(params, batch, train=False)
    e2 = model.apply(params, batch, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(params, batch, train=True, rng=jax.random.PRNGKey(1))
    t2 = model.apply(params, batch, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_models_jit_and_grad(cfg, batch):
    from rectpu.train.metrics import sigmoid_xent

    for cls in [LinearModel, DNNModel, WideDeepModel, DeepFMModel]:
        model = cls(cfg)
        params = model.init(jax.random.PRNGKey(0))

        @jax.jit
        def loss_fn(p):
            logits = model.apply(p, batch, train=False)
            return sigmoid_xent(logits, batch["labels"]).mean()

        g = jax.grad(loss_fn)(params)
        flat = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        assert any(np.any(np.asarray(x) != 0) for x in flat), cls.__name__


def test_fused_linear_lookup_parity(cfg, batch):
    """fuse_linear_lookup=True must reproduce the unfused logits exactly
    (fp32, take impl) for DeepFM and WideDeep."""
    import dataclasses

    for cls in [DeepFMModel, WideDeepModel]:
        cfg_fused = dataclasses.replace(cfg, fuse_linear_lookup=True)
        cfg_plain = dataclasses.replace(cfg, fuse_linear_lookup=False)
        m_fused, m_plain = cls(cfg_fused), cls(cfg_plain)
        params = m_fused.init(jax.random.PRNGKey(0))
        params["linear"]["w"] = jnp.asarray(
            np.random.default_rng(9).normal(scale=0.1, size=params["linear"]["w"].shape
                                            ).astype(np.float32)
        )
        out_f = np.asarray(m_fused.apply(params, batch))
        out_p = np.asarray(m_plain.apply(params, batch))
        np.testing.assert_allclose(out_f, out_p, rtol=1e-5, atol=1e-6)

        # gradients agree too
        def loss(m):
            return jax.grad(
                lambda p: jnp.sum(jnp.sin(m.apply(p, batch)))
            )(params)

        g_f, g_p = loss(m_fused), loss(m_plain)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            g_f, g_p,
        )


def test_packed_linear_parity(cfg, batch):
    """packed_linear stores [emb | w] as one table; logits, grads and the
    export round-trip must match the unpacked layout exactly."""
    import dataclasses

    cfg_packed = dataclasses.replace(cfg, packed_linear=True)
    m_packed = DeepFMModel(cfg_packed)
    m_plain = DeepFMModel(cfg)
    p_plain = m_plain.init(jax.random.PRNGKey(4))
    # build the packed params from the SAME values
    p_packed = {
        "table": jnp.concatenate([p_plain["emb"], p_plain["linear"]["w"][:, None]], 1),
        "linear": {"b": p_plain["linear"]["b"]},
        "mlp": p_plain["mlp"],
    }
    out_packed = np.asarray(m_packed.apply(p_packed, batch))
    out_plain = np.asarray(m_plain.apply(p_plain, batch))
    np.testing.assert_allclose(out_packed, out_plain, rtol=1e-5, atol=1e-6)

    # init produces the packed structure directly
    p_init = m_packed.init(jax.random.PRNGKey(0))
    assert set(p_init.keys()) == {"table", "linear", "mlp"}
    assert "w" not in p_init["linear"]
    assert p_init["table"].shape == (cfg.padded_buckets, cfg.embedding_size + 1)
    # linear column zero-init (TF linear_model semantics)
    np.testing.assert_array_equal(np.asarray(p_init["table"][:, -1]), 0.0)

    # gradient flows to the packed table
    g = jax.grad(lambda p: jnp.sum(m_packed.apply(p, batch)))(p_packed)
    assert np.any(np.asarray(g["table"]) != 0)

    # export/load round-trip preserves the packed layout
    import tempfile

    from rectpu.serve.export import export_model, load_model

    with tempfile.TemporaryDirectory() as td:
        export_dir = export_model(p_packed, m_packed, td, step=1)
        served = load_model(export_dir)
        assert served.model.packed
        req = {
            "user_id": np.array([1]), "item_id": np.array([2]), "age": np.array([30]),
            "gender": np.array(["F"]), "occupation": np.array(["o"]),
            "zipcode": np.array(["1"]), "release_year": np.array([1990]),
        }
        out = served.predict(req)
        assert out["probabilities"].shape == (1,)
