"""Embedding-lookup and FM-cross op tests (all impls agree, grads correct)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.ops.embedding import lookup_onehot, lookup_pallas, lookup_take
from rectpu.ops.fm import fm_cross_pallas, fm_cross_xla


@pytest.fixture
def table_ids(rng):
    v, k = 300, 8
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(64, 26)).astype(np.int32))
    return table, ids


def test_lookup_impls_agree(table_ids):
    table, ids = table_ids
    ref = lookup_take(table, ids)
    np.testing.assert_allclose(lookup_onehot(table, ids), ref, rtol=1e-6)
    np.testing.assert_allclose(lookup_pallas(table, ids, interpret=True), ref, rtol=1e-6)


def test_lookup_grads_agree(table_ids):
    table, ids = table_ids

    def loss(fn):
        def f(t):
            out = fn(t, ids)
            return jnp.sum(jnp.sin(out) * out)

        return jax.grad(f)(table)

    g_ref = loss(lookup_take)
    g_onehot = loss(lookup_onehot)
    g_pallas = loss(lambda t, i: lookup_pallas(t, i, interpret=True))
    np.testing.assert_allclose(g_onehot, g_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(g_pallas, g_ref, rtol=1e-5, atol=1e-6)


def test_lookup_scatter_grad_is_count(table_ids):
    """d/dtable sum(lookup) = number of times each row was looked up."""
    table, ids = table_ids
    g = jax.grad(lambda t: jnp.sum(lookup_pallas(t, ids, interpret=True)))(table)
    counts = np.bincount(np.asarray(ids).ravel(), minlength=table.shape[0])
    np.testing.assert_allclose(g[:, 0], counts.astype(np.float32), rtol=1e-6)


def test_fm_cross_identity_vs_naive(rng):
    """FM identity equals the O(F^2) naive pairwise sum (fp64 oracle,
    reference math at trainers/deep_fm.py:81-90)."""
    b, f, k = 32, 26, 4
    v = rng.normal(size=(b, f, k))
    naive = np.zeros(b)
    for i in range(f):
        for j in range(i + 1, f):
            naive += (v[:, i, :] * v[:, j, :]).sum(axis=1)
    got = fm_cross_xla(jnp.asarray(v.astype(np.float32)))
    np.testing.assert_allclose(got, naive, rtol=1e-4)


def test_fm_pallas_matches_xla(rng):
    b, f, k = 100, 26, 4  # deliberately not a tile multiple
    v = jnp.asarray(rng.normal(size=(b, f, k)).astype(np.float32))
    np.testing.assert_allclose(
        fm_cross_pallas(v, tile_b=32, interpret=True), fm_cross_xla(v), rtol=1e-4, atol=1e-5
    )


def test_fm_pallas_grad_matches(rng):
    b, f, k = 48, 10, 6
    v = jnp.asarray(rng.normal(size=(b, f, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))

    def obj(fn):
        return jax.grad(lambda x: jnp.sum(w * fn(x)))(v)

    g_ref = obj(fm_cross_xla)
    g_pal = obj(lambda x: fm_cross_pallas(x, tile_b=16, interpret=True))
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-5)


def test_fm_matmul_matches_xla(rng):
    from rectpu.ops.fm import fm_cross_matmul

    for b, f, k in [(64, 26, 4), (33, 7, 16)]:
        v = jnp.asarray(rng.normal(size=(b, f, k)).astype(np.float32))
        np.testing.assert_allclose(
            fm_cross_matmul(v), fm_cross_xla(v), rtol=1e-4, atol=1e-5
        )
        w = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))
        g_ref = jax.grad(lambda x: jnp.sum(w * fm_cross_xla(x)))(v)
        g_mm = jax.grad(lambda x: jnp.sum(w * fm_cross_matmul(x)))(v)
        np.testing.assert_allclose(g_mm, g_ref, rtol=1e-4, atol=1e-5)


def test_fm_flat_pallas_matches_xla(rng):
    """Lane-packed Pallas FM == flat XLA identity, fwd + weighted grad
    (interpret mode; F*K = 4*128 = 512 lanes so the kernel path is taken)."""
    from rectpu.ops.fm import fm_cross_flat, fm_cross_flat_pallas

    b, f, k = 48, 4, 128
    v2 = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    np.testing.assert_allclose(
        fm_cross_flat_pallas(v2, f, k, True),
        fm_cross_flat(v2, f, k),
        rtol=1e-4, atol=1e-5,
    )
    w = jnp.asarray(rng.normal(size=(b,)).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.sum(w * fm_cross_flat(x, f, k)))(v2)
    g_pal = jax.grad(lambda x: jnp.sum(w * fm_cross_flat_pallas(x, f, k, True)))(v2)
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-4, atol=1e-5)


def test_fm_flat_pallas_ragged_batch_and_naive(rng):
    """Non-tile batch sizes pad correctly; fp64 naive oracle agreement."""
    from rectpu.ops.fm import fm_cross_flat_pallas

    b, f, k = 37, 2, 128
    v = rng.normal(size=(b, f, k)).astype(np.float32)
    naive = 0.5 * (
        (v.astype(np.float64).sum(1) ** 2).sum(-1)
        - (v.astype(np.float64) ** 2).sum(1).sum(-1)
    )
    got = fm_cross_flat_pallas(jnp.asarray(v.reshape(b, f * k)), f, k, True)
    np.testing.assert_allclose(got, naive, rtol=1e-4, atol=1e-4)


def test_fm_flat_dispatch_fallback(rng):
    """F*K not a lane multiple -> dispatcher falls back to the XLA impl."""
    from rectpu.ops.fm import fm_cross_flat, fm_cross_flat_dispatch

    b, f, k = 16, 26, 4  # F*K = 104, not a multiple of 128
    v2 = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    np.testing.assert_allclose(
        fm_cross_flat_dispatch(v2, f, k, impl="pallas"),
        fm_cross_flat(v2, f, k),
        rtol=1e-5, atol=1e-6,
    )
