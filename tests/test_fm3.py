"""Order-3 FM term (ops/fm.fm_cross3_*) — beyond-reference tensorFM lead.

The reference stops at second order (/root/reference/trainers/deep_fm.py:81-90);
`--fm-order 3` adds sum_k sum_{i<j<l} v_i[k] v_j[k] v_l[k] over the shared
embeddings via Newton's identities. Pins: the identity against an fp64
triple-loop oracle, the flat op against the 3D op, the closed-form VJP
against autodiff, the DeepFM wiring (flat == standard, order 3 != order 2),
and the export round-trip of the fm_order toggle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.ops.fm import fm_cross3_flat, fm_cross3_xla


def _naive3_fp64(v: np.ndarray) -> np.ndarray:
    """sum over all field triples i<j<l of the lane-wise product, in fp64."""
    v = v.astype(np.float64)
    b, f, _ = v.shape
    out = np.zeros(b)
    for i in range(f):
        for j in range(i + 1, f):
            for l in range(j + 1, f):
                out += np.sum(v[:, i] * v[:, j] * v[:, l], axis=-1)
    return out


def test_fm3_matches_fp64_oracle():
    rng = np.random.default_rng(31)
    b, f, k = 17, 7, 5
    v = rng.normal(size=(b, f, k)).astype(np.float32)
    got = np.asarray(fm_cross3_xla(jnp.asarray(v)))
    np.testing.assert_allclose(got, _naive3_fp64(v), rtol=1e-5, atol=1e-5)


def test_fm3_degenerate_fields():
    # F < 3 has no triples: the identity must return exactly 0.
    rng = np.random.default_rng(32)
    for f in (1, 2):
        v = jnp.asarray(rng.normal(size=(9, f, 4)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(fm_cross3_xla(v)), 0.0, atol=1e-5)


def test_fm3_flat_matches_xla_and_autodiff():
    rng = np.random.default_rng(33)
    b, f, k = 64, 26, 8
    v3 = jnp.asarray(rng.normal(size=(b, f, k)).astype(np.float32))
    v2 = v3.reshape(b, f * k)
    np.testing.assert_allclose(
        np.asarray(fm_cross3_flat(v2, f, k)), np.asarray(fm_cross3_xla(v3)),
        rtol=1e-4, atol=1e-4,
    )
    # closed-form VJP (e2 - v*p1 + v^2 broadcast) vs plain autodiff of the 3D op
    g_flat = jax.grad(lambda x: jnp.sum(fm_cross3_flat(x, f, k)))(v2)
    g_ref = jax.grad(lambda x: jnp.sum(fm_cross3_xla(x)))(v3).reshape(b, f * k)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_fm3_flat_bf16_input():
    rng = np.random.default_rng(34)
    b, f, k = 32, 26, 8
    v3 = jnp.asarray(rng.normal(size=(b, f, k)).astype(np.float32))
    v2_bf = v3.reshape(b, f * k).astype(jnp.bfloat16)
    ref = np.asarray(fm_cross3_xla(v3.astype(jnp.bfloat16)))
    got = np.asarray(fm_cross3_flat(v2_bf, f, k))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    dv = jax.grad(lambda x: jnp.sum(fm_cross3_flat(x, f, k)))(v2_bf)
    assert dv.dtype == jnp.bfloat16


def _batch(fs, b, seed):
    rng = np.random.default_rng(seed)
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)],
        axis=1,
    ).astype(np.int32)
    return {
        "cat_ids": jnp.asarray(ids),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
        "labels": jnp.asarray((rng.random(b) < 0.3).astype(np.float32)),
    }


def test_deepfm_order3_flat_matches_standard():
    fs = ml_100k_feature_set()
    kwargs = dict(feature_set=fs, embedding_size=8, hidden_units=(16, 16),
                  packed_linear=True, split_threshold=1500)
    m_std = DeepFMModel(TowerConfig(**kwargs), fm_order=3)
    m_flat = DeepFMModel(TowerConfig(flat_layout=True, **kwargs), fm_order=3)
    params = m_std.init(jax.random.PRNGKey(0))
    batch = _batch(fs, 64, seed=35)
    out_std = m_std.apply(params, batch)
    out_flat = m_flat.apply(params, batch)
    np.testing.assert_allclose(np.asarray(out_flat), np.asarray(out_std),
                               rtol=1e-4, atol=1e-5)
    # the order-3 term contributes: order-3 logits differ from order-2
    m2 = DeepFMModel(TowerConfig(**kwargs), fm_order=2)
    out2 = m2.apply(params, batch)
    assert np.abs(np.asarray(out_std) - np.asarray(out2)).max() > 1e-4
    # and the delta IS the oracle triple-sum over the shared embeddings
    from rectpu.ops.embedding import lookup_take
    emb = np.asarray(lookup_take(params["table"], batch["cat_ids"])[..., :8])
    np.testing.assert_allclose(np.asarray(out_std) - np.asarray(out2),
                               _naive3_fp64(emb), rtol=1e-4, atol=1e-4)


def test_deepfm_order3_trains():
    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=8, hidden_units=(16, 16),
                      packed_linear=True, flat_layout=True)
    model = DeepFMModel(cfg, fm_order=3)
    params = model.init(jax.random.PRNGKey(1))
    batch = _batch(fs, 64, seed=36)

    def loss_fn(p):
        logits = model.apply(p, batch, train=True, rng=jax.random.PRNGKey(2))
        labels = batch["labels"]
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(grads["table"]).max()) > 0


def test_fm_order_cli_and_export_kwargs():
    from rectpu.serve.export import model_toggle_kwargs
    from rectpu.trainers.deep_fm import build_parser

    args = build_parser().parse_args(["--fm-order", "3"])
    assert args.fm_order == 3
    assert build_parser().parse_args([]).fm_order == 2  # reference default

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(8,))
    kw = model_toggle_kwargs(DeepFMModel(cfg, fm_order=3))
    assert kw["fm_order"] == 3
    with pytest.raises(ValueError):
        DeepFMModel(cfg, fm_order=4)
