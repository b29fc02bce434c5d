"""Split (field-aware) embedding lookup: parity with plain gather, fwd+grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.ops.embedding import embedding_lookup, lookup_split, lookup_take


@pytest.fixture(scope="module")
def setup():
    fs = ml_100k_feature_set()
    rng = np.random.default_rng(4)
    v, k, b = fs.total_buckets, 8, 64
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], axis=1
    ).astype(np.int32)
    field_info = (tuple(int(o) for o in offs), tuple(sizes))
    return table, jnp.asarray(ids), field_info


@pytest.mark.parametrize("threshold", [0, 60, 1500, 10**6])
def test_split_matches_take(setup, threshold):
    """Every small/big partition (all-big .. all-small) must agree with take."""
    table, ids, field_info = setup
    got = lookup_split(table, ids, field_info, small_threshold=threshold, small_impl="onehot")
    ref = lookup_take(table, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_split_grad_matches_take(setup):
    table, ids, field_info = setup
    w = jnp.asarray(np.random.default_rng(5).normal(size=(ids.shape[0], ids.shape[1], table.shape[1])).astype(np.float32))

    def obj(fn):
        return jax.grad(lambda t: jnp.sum(w * fn(t)))(table)

    g_ref = obj(lambda t: lookup_take(t, ids))
    g_split = obj(lambda t: lookup_split(t, ids, field_info, small_threshold=1500, small_impl="onehot"))
    # matmul-reduction vs scatter-add differ in fp32 accumulation order
    np.testing.assert_allclose(np.asarray(g_split), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_dispatcher_split(setup):
    table, ids, field_info = setup
    got = embedding_lookup(table, ids, impl="split", field_info=field_info)
    np.testing.assert_allclose(np.asarray(got), np.asarray(lookup_take(table, ids)), rtol=1e-6)
    with pytest.raises(ValueError):
        embedding_lookup(table, ids, impl="split")


def test_model_with_split_impl(setup):
    """DeepFM logits identical under take vs split lookups."""
    from rectpu.models import DeepFMModel, TowerConfig

    fs = ml_100k_feature_set()
    rng = np.random.default_rng(0)
    b = 32
    offs, sizes = fs.offsets, fs.field_sizes
    batch = {
        "cat_ids": jnp.asarray(
            np.stack([offs[f] + rng.integers(0, sizes[f], size=b) for f in range(fs.num_fields)], 1)
        ),
        "num_vals": jnp.zeros((b, 0), jnp.float32),
    }
    outs = {}
    for impl in ("take", "split"):
        cfg = TowerConfig(feature_set=fs, embedding_size=4, embedding_impl=impl)
        model = DeepFMModel(cfg)
        params = model.init(jax.random.PRNGKey(0))
        outs[impl] = np.asarray(model.apply(params, batch))
    np.testing.assert_allclose(outs["split"], outs["take"], rtol=1e-5, atol=1e-6)


def test_split_pallas_small_impl_interpret(setup):
    """The pallas small-table path (TPU default) via interpret mode."""
    table, ids, field_info = setup
    got = lookup_split(table, ids, field_info, small_threshold=1500, small_impl="pallas")
    # note: on CPU lookup_pallas auto-selects interpret mode
    np.testing.assert_allclose(np.asarray(got), np.asarray(lookup_take(table, ids)), rtol=1e-6)


def test_split_gather_dtype_bf16(setup):
    """bf16 gather == fp32 gather then cast (elementwise), and the scatter
    gradient accumulates in fp32."""
    table, ids, field_info = setup
    got = lookup_split(table, ids, field_info, small_impl="onehot",
                       gather_dtype=jnp.bfloat16)
    assert got.dtype == jnp.bfloat16
    ref = lookup_take(table, ids).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # gradient returns fp32 (table dtype), accumulated in fp32
    g = jax.grad(
        lambda t: lookup_split(t, ids, field_info, small_impl="onehot",
                               gather_dtype=jnp.bfloat16).astype(jnp.float32).sum()
    )(table)
    assert g.dtype == table.dtype
    counts = np.bincount(np.asarray(ids).ravel(), minlength=table.shape[0])
    np.testing.assert_allclose(np.asarray(g[:, 0]), counts.astype(np.float32), rtol=1e-6)


def test_split_grad_dtype_bf16(setup):
    """grad_dtype=bf16 narrows the dense table cotangent: forward unchanged,
    gradient returns the table dtype, values within bf16 rounding of the
    fp32 path (small fields still reduce in fp32 on the matmul)."""
    table, ids, field_info = setup
    w = jnp.asarray(
        np.random.default_rng(6).normal(
            size=(ids.shape[0], ids.shape[1], table.shape[1])
        ).astype(np.float32)
    )

    def grad_of(grad_dtype):
        return jax.grad(
            lambda t: jnp.sum(w * lookup_split(
                t, ids, field_info, 1500, "onehot", None, grad_dtype))
        )(table)

    g_ref = grad_of(None)
    g_bf16 = grad_of(jnp.bfloat16)
    assert g_bf16.dtype == table.dtype
    np.testing.assert_allclose(
        np.asarray(g_bf16), np.asarray(g_ref), rtol=2e-2, atol=5e-2
    )
    # forward identical regardless of grad_dtype
    np.testing.assert_array_equal(
        np.asarray(lookup_split(table, ids, field_info, 1500, "onehot", None, jnp.bfloat16)),
        np.asarray(lookup_split(table, ids, field_info, 1500, "onehot")),
    )
