"""ops/cin: the custom-VJP CIN contraction (xDeepFM's hot op)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.ops.cin import _cin_dw_pallas, _cin_pallas, cin_core, cin_core_xla


def _ref(x, y, w):
    """Literal triple loop of out[b,o,k] = sum_{h,m} w[h,m,o] x[b,h,k] y[b,m,k]."""
    x, y, w = (np.asarray(t, np.float64) for t in (x, y, w))
    b, h, k = x.shape
    m = y.shape[1]
    o = w.shape[2]
    out = np.zeros((b, o, k))
    for oo in range(o):
        for hh in range(h):
            for mm in range(m):
                out[:, oo, :] += w[hh, mm, oo] * x[:, hh, :] * y[:, mm, :]
    return out


@pytest.fixture
def ops(rng):
    B, H, M, K, O = 37, 5, 7, 6, 4  # odd sizes exercise the batch padding
    x = jnp.asarray(rng.normal(size=(B, H, K)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, M, O)).astype(np.float32))
    return x, y, w


def test_xla_matches_literal(ops):
    x, y, w = ops
    np.testing.assert_allclose(np.asarray(cin_core_xla(x, y, w)), _ref(x, y, w),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("variant", ["flat", "mloop"])
def test_pallas_matches_literal(ops, variant):
    x, y, w = ops
    got = np.asarray(_cin_pallas(x, y, w, interpret=True, variant=variant))
    np.testing.assert_allclose(got, _ref(x, y, w), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_custom_vjp_matches_autodiff_oracle(ops, impl):
    """dx/dy via the renamed-axes forward contraction and the dw reduction
    must equal plain autodiff through the naive expansion."""
    x, y, w = ops

    def oracle(x_, y_, w_):
        z = x_[:, :, None, :] * y_[:, None, :, :]
        out = jax.lax.dot_general(
            z, w_, dimension_numbers=(((1, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).transpose(0, 2, 1)
        return jnp.sum(out ** 2)

    def ours(x_, y_, w_):
        return jnp.sum(cin_core(x_, y_, w_, impl=impl) ** 2)

    got = jax.grad(ours, argnums=(0, 1, 2))(x, y, w)
    want = jax.grad(oracle, argnums=(0, 1, 2))(x, y, w)
    for g, r, name in zip(got, want, ("dx", "dy", "dw")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_dw_kernel_matches_einsum(ops):
    x, y, w = ops
    g = jnp.asarray(np.random.default_rng(3).normal(
        size=(x.shape[0], w.shape[2], x.shape[2])).astype(np.float32))
    got = np.asarray(_cin_dw_pallas(x, y, g, interpret=True))
    want = np.einsum("bhk,bmk,bok->hmo", np.asarray(x, np.float64),
                     np.asarray(y, np.float64), np.asarray(g, np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_kmajor_matches_legacy():
    """cin_layout='kmajor' (no per-call relayouts) == the legacy layout:
    values and gradients, through the full xDeepFM CIN stack."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import TowerConfig
    from rectpu.models.xdeep_fm import XDeepFMModel

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=6, hidden_units=(8,),
                      table_padding=8)
    m_l = XDeepFMModel(cfg, cin_units=(5, 3))
    m_k = XDeepFMModel(cfg, cin_units=(5, 3), cin_layout="kmajor")
    params = m_l.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    ids = np.stack([fs.offsets[f] + rng.integers(0, fs.field_sizes[f], size=16)
                    for f in range(fs.num_fields)], 1).astype(np.int32)
    batch = {"cat_ids": jnp.asarray(ids),
             "num_vals": jnp.zeros((16, 0), jnp.float32),
             "labels": jnp.asarray((rng.random(16) < 0.3).astype(np.float32))}

    out_l = np.asarray(m_l.apply(params, batch))
    out_k = np.asarray(m_k.apply(params, batch))
    np.testing.assert_allclose(out_k, out_l, rtol=1e-5, atol=1e-6)

    from rectpu.train.metrics import sigmoid_xent

    def loss(model, p):
        return sigmoid_xent(model.apply(p, batch), batch["labels"]).mean()

    g_l = jax.grad(lambda p: loss(m_l, p))(params)
    g_k = jax.grad(lambda p: loss(m_k, p))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        g_l, g_k)
