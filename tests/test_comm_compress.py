"""Lossy EP-comm compression (PAPERS.md lead, arXiv:2407.04272): the row
all_to_all / activation reduce_scatter can ride the wire as bf16 or per-row
int8. These tests bound the compression error on the virtual 8-device mesh
and pin the exactness cases (bf16-representable tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.parallel import make_mesh
from rectpu.parallel.embedding_ep import (
    make_ep_lookup_2d,
    make_ep_lookup_2d_flat,
    make_ep_lookup_dedup,
    make_ep_lookup_dedup_flat,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _bf16_table(rng, v, k):
    """fp32 table whose values are exactly bf16-representable."""
    t = rng.normal(size=(v, k)).astype(np.float32)
    return jnp.asarray(np.asarray(t.astype(jnp.bfloat16)).astype(np.float32))


def test_dedup_bf16_exact_on_bf16_values(rng):
    """bf16 wire format is EXACT when the table values are bf16-representable
    (the compression only rounds once, on send)."""
    mesh = make_mesh(2, 4)
    v, k = 512, 8
    table = _bf16_table(rng, v, k)
    ids = jnp.asarray(rng.integers(0, v, size=(16, 26)).astype(np.int32))
    got = make_ep_lookup_dedup(mesh, comm_compress="bf16")(table, ids)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_2d_bf16_exact_on_bf16_values(rng):
    """reduce_scatter partials are one-hot across model shards, so the bf16
    sum is exact — compressed == uncompressed for bf16-representable tables."""
    mesh = make_mesh(2, 4)
    v, k = 512, 8
    table = _bf16_table(rng, v, k)
    ids = jnp.asarray(rng.integers(0, v, size=(16, 26)).astype(np.int32))
    got = make_ep_lookup_2d(mesh, comm_compress="bf16")(table, ids)
    ref = jnp.take(table, ids, axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("mode", ["bf16", "int8"])
def test_dedup_compressed_error_bound(rng, mode):
    mesh = make_mesh(2, 4)
    v, k = 512, 8
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(16, 26)).astype(np.int32))
    got = np.asarray(make_ep_lookup_dedup(mesh, comm_compress=mode)(table, ids))
    ref = np.asarray(jnp.take(table, ids, axis=0))
    # bf16: 8 mantissa bits -> rel err <= 2^-8; int8 per-row: abs err <= amax/254
    if mode == "bf16":
        np.testing.assert_allclose(got, ref, rtol=2 ** -8, atol=1e-6)
    else:
        amax = np.abs(ref).max(axis=-1, keepdims=True)
        assert np.all(np.abs(got - ref) <= amax / 254 + 1e-6)


def test_dedup_int8_grad_close(rng):
    """int8 forward + bf16 backward (dual-level): table grads stay within
    bf16 rounding of the exact grads (the cotangent wire format dominates)."""
    mesh = make_mesh(4, 2)
    v, k = 256, 4
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, size=(8, 26)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(8, 26, k)).astype(np.float32))

    def obj(fn):
        return jax.grad(lambda t: jnp.sum(w * fn(t, ids)))(table)

    g = np.asarray(obj(make_ep_lookup_dedup(mesh, comm_compress="int8")))
    g_ref = np.asarray(obj(lambda t, i: jnp.take(t, i, axis=0)))
    # colliding cotangents can CANCEL, so relative error is unbounded on
    # near-zero sums — the meaningful bound is absolute, at bf16 rounding
    # scale of the O(1) per-lookup cotangents
    np.testing.assert_allclose(g, g_ref, rtol=2 ** -7, atol=0.02)


def test_flat_variants_compressed_match_uncompressed_shapes(rng):
    """Compressed flat exchanges return the same (emb_flat, lin) structure and
    values within the wire-format tolerance."""
    from rectpu.features.schema import ml_100k_feature_set

    fs = ml_100k_feature_set()
    v, k = -(-fs.total_buckets // 8) * 8, 4
    table = jnp.asarray(rng.normal(size=(v, k + 1)).astype(np.float32))
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=16) for f in range(fs.num_fields)], 1
    ).astype(np.int32)
    ids = jnp.asarray(ids)

    mesh = make_mesh(2, 4)
    ref_emb, ref_lin = make_ep_lookup_2d_flat(mesh)(table, ids)
    for make, mode in [
        (make_ep_lookup_2d_flat, "bf16"),
        (make_ep_lookup_dedup_flat, "bf16"),
        (make_ep_lookup_dedup_flat, "int8"),
    ]:
        emb, lin = make(mesh, comm_compress=mode)(table, ids)
        rtol = 2 ** -8 if mode == "bf16" else 2 ** -5
        np.testing.assert_allclose(
            np.asarray(emb), np.asarray(ref_emb), rtol=rtol, atol=2e-2
        )
        # lin rides exact in the 2d flat path; dedup folds it from compressed rows
        np.testing.assert_allclose(
            np.asarray(lin), np.asarray(ref_lin), rtol=2 ** -5, atol=2e-2
        )


def test_plan_rejects_bad_compress_combos():
    from rectpu.parallel.plan import ParallelPlan

    with pytest.raises(ValueError):
        ParallelPlan.create(2, 4, table_rows=64, ep_mode="2d", ep_comm_compress="int8")
    with pytest.raises(ValueError):
        ParallelPlan.create(2, 4, table_rows=64, ep_mode="1d", ep_comm_compress="bf16")


def test_compressed_train_step_learns(rng):
    """A sharded DeepFM train step with int8 dedup compression still moves the
    loss the same direction and lands near the exact step's params."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.parallel import ParallelPlan
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=16)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    opt_state = opt.init(params)
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=32) for f in range(fs.num_fields)], 1
    ).astype(np.int32)
    batch = {
        "cat_ids": ids,
        "num_vals": np.zeros((32, 0), np.float32),
        "labels": (rng.random(32) < 0.3).astype(np.float32),
    }
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

    plan = ParallelPlan.create(2, 4, table_rows=cfg.padded_buckets,
                               ep_mode="dedup", ep_comm_compress="int8")
    p_sh = plan.shard_params(params)
    s_sh = plan.shard_params(opt_state)
    b_sh = plan.shard_batch(batch)
    p_out, _, loss_sh = jax.jit(lambda p, s, b: step(p, s, b, plan.lookup_fn))(
        p_sh, s_sh, b_sh
    )
    assert np.isclose(float(loss_ref), float(loss_sh), rtol=5e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0.05, atol=5e-3
        ),
        jax.device_get(p_ref), jax.device_get(p_out),
    )
