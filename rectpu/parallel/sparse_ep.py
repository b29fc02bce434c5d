"""Sparse (lazy-Adam) updates of EP row-sharded embedding tables.

This closes the flagship-scale composition gap: EP row-sharding
(parallel/embedding_ep.py) replaces the reference's parameter-server-hosted
embedding variables (/root/reference/distributed.md:43-82), and the sparse
fast step (train/fast_step.py) replaces TF's ``_apply_sparse`` lazy-Adam
kernels — but a multi-GB sharded table needs BOTH at once: past ~2B
elements per shard (the honestly re-measured crossover, RESULTS.md round 3)
the dense per-shard optimizer sweep becomes unaffordable and only the
touched rows may move.

Row routing runs in one shard_map over the ('data','model') mesh. Per
device:

  1. dedup the local [B_loc, F] (id, cotangent-row) pairs — sort +
     segment-sum, static shapes (train/sparse.dedupe_rows); a batch slice's
     unique ids are ~8x fewer than its lookups for this schema;
  2. [2D batch only] bucket the unique rows by owning table shard and
     all_to_all them (ids + summed fp32 grads) to their owners over 'model' —
     the same deduped exchange the forward runs, in reverse;
  3. all_gather the received (id, grad) lists over 'data' so every replica of
     a table shard sees every data shard's contributions (the table is
     replicated along 'data'; identical inputs keep the replicas bitwise in
     sync);
  4. dedup-sum again (cross-source collisions), GATHER the current
     p/m/v rows of the touched ids, and compute their TF-style lazy-Adam
     updates (untouched rows keep stale m/v and receive no step, matching
     ``tf.train.AdamOptimizer._apply_sparse``).

The shard_map emits only SMALL per-row tensors (global ids + updated
p/m/v rows); the scatters into the big [V, W] state run OUTSIDE it, in the
caller's jit, where XLA's buffer donation aliases them in place. Profiled
motivation (v5e, 6M-row table): updating the state INSIDE the shard_map
forced six full-table copies (~43 ms of a 97 ms step) plus copy-through
scatters — shard_map sub-computations do not inherit the outer donation.

Wire volume is unique-rows * W per hop — never a dense [V, W] gradient, and
never a dense optimizer sweep. The all_to_all capacity uses the provably
lossless bound min(n_local, V/m) by default: unlike the forward activation
exchange (where capacity overflow drops to zero embeddings, the MoE
contract), silently dropping OPTIMIZER updates is never acceptable, so a
caller-set ``peer_capacity`` is honored but defaults stay exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rectpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from rectpu.train.sparse import dedupe_rows


def make_sparse_rows_ep(
    mesh: Mesh,
    batch_2d: bool,
    peer_capacity: int | None = None,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    field_sizes=None,
):
    """Build ``update(table, mv, ids, dlooked, lr_t) -> (table, mv)``.

    ``table``: [V, W] leaf row-sharded P('model', None); ``mv``: the PACKED
    [V, 2W] m|v slot slab, sharded alike (four per-row state passes instead
    of six — train/sparse.sparse_adam_rows_packed rationale); ``ids``:
    [B, F] int32 global row ids, sharded on the batch dim over
    ('data','model') when ``batch_2d`` (the 2d/dedup EP batch layout) else
    over 'data' alone (1d EP: replicated over 'model'); ``dlooked``:
    [B, F, W] cotangents of the gathered rows, sharded like ``ids``;
    ``lr_t``: the bias-corrected scalar rate (train/sparse.adam_lr_t).

    ``field_sizes``: the per-field vocab sizes. When given, the deduped row
    lists are sliced to the exact ``unique_capacity`` bound (uniques pack
    into the first slots) at both dedupe points, so the wire payloads and
    the per-row gathers/scatters touch ~the unique count instead of the full
    R = B_loc*F sentinel-padded vector — the same slice the non-EP fast step
    applies. Requires in-range ids (see unique_capacity's precondition).
    """
    from rectpu.train.sparse import unique_capacity

    n_model = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    batch_axes = (DATA_AXIS, MODEL_AXIS) if batch_2d else DATA_AXIS

    def local_rows(table, mv, ids, dl, lr_t):
        """Per-device: route cotangent rows to this shard, compute the
        updated p/mv ROW VALUES. Returns (global_rows, p_rows, mv_rows) —
        small [L(, W)] tensors; non-owned/sentinel entries carry
        the out-of-range id V (dropped by the caller's scatters)."""
        v_shard, w = table.shape
        v_total = v_shard * n_model
        flat_ids = ids.reshape(-1).astype(jnp.int32)
        # fp32 row sums regardless of tower dtype (bf16 collision sums would
        # drop increments below the running sum's ulp/2)
        flat_g = dl.reshape(-1, w).astype(jnp.float32)
        # exact capacity: uniques occupy the first sum_f min(size_f, B_loc)
        # slots (sentinels sort last) — built directly at that size
        cap1 = (unique_capacity(field_sizes, ids.shape[0], flat_ids.shape[0])
                if field_sizes is not None else None)
        rows, grads = dedupe_rows(flat_ids, flat_g, v_total, num_out=cap1)
        n = rows.shape[0]

        if batch_2d and n_model > 1:
            # deduped rows ride to their owners: ids + grads all_to_all over
            # 'model' (the reverse of the forward dedup exchange)
            cap = peer_capacity if peer_capacity is not None else min(n, v_shard)
            peer = jnp.where(rows < v_total, rows // v_shard, n_model)
            onehot_p = peer[:, None] == jnp.arange(n_model)[None, :]  # [n, M]
            pos = jnp.sum(
                jnp.where(
                    onehot_p, jnp.cumsum(onehot_p.astype(jnp.int32), axis=0) - 1, 0
                ),
                axis=1,
            )
            ok = (peer < n_model) & (pos < cap)
            addr = jnp.where(ok, peer * cap + pos, n_model * cap)
            send_ids = (
                jnp.full((n_model * cap,), v_total, jnp.int32)
                .at[addr]
                .set(rows, mode="drop")
            )
            send_g = (
                jnp.zeros((n_model * cap, w), jnp.float32)
                .at[addr]
                .set(grads, mode="drop")
            )
            rows = jax.lax.all_to_all(
                send_ids.reshape(n_model, cap), MODEL_AXIS, 0, 0, tiled=False
            ).reshape(-1)
            grads = jax.lax.all_to_all(
                send_g.reshape(n_model, cap, w), MODEL_AXIS, 0, 0, tiled=False
            ).reshape(-1, w)

        # every 'data' replica of this table shard must apply the SAME update
        rows = jax.lax.all_gather(rows, DATA_AXIS, axis=0, tiled=True)
        grads = jax.lax.all_gather(grads, DATA_AXIS, axis=0, tiled=True)
        # global bound: contributions come from the whole global batch
        b_total = ids.shape[0] * n_data * (n_model if batch_2d else 1)
        cap2 = (unique_capacity(field_sizes, b_total, rows.shape[0])
                if field_sizes is not None else None)
        rows, grads = dedupe_rows(rows, grads, v_total, num_out=cap2)

        mi = jax.lax.axis_index(MODEL_AXIS)
        local = rows - mi * v_shard
        owned = (rows < v_total) & (local >= 0) & (local < v_shard)
        # gather-safe indices: clip (never jnp's negative-wrap); non-owned
        # rows read garbage whose updates are dropped by the caller
        safe = jnp.clip(local, 0, v_shard - 1)

        g = grads.astype(table.dtype)
        # the slab may be LANE-PADDED [V, 2*wp] (m in [0, w), v in
        # [wp, wp+w)) — round-5 scatter law: the caller's per-shard mv
        # scatter is per-row only at 128-multiple widths (wp == w is the
        # tight legacy layout)
        wp = mv.shape[1] // 2
        mv_rows = jnp.take(mv, safe, axis=0)  # ONE gather covers m and v
        m_rows = mv_rows[:, :w] * beta1 + g * (1 - beta1)
        v_rows = mv_rows[:, wp:wp + w] * beta2 + jnp.square(g) * (1 - beta2)
        p_rows = (
            jnp.take(table, safe, axis=0)
            - lr_t * m_rows / (jnp.sqrt(v_rows) + epsilon)
        )
        rows_g = jnp.where(owned, rows, v_total)  # V = drop sentinel
        if wp == w:
            mv_out = jnp.concatenate([m_rows, v_rows], axis=1)
        else:
            mv_out = (
                jnp.zeros((m_rows.shape[0], 2 * wp), mv.dtype)
                .at[:, :w].set(m_rows).at[:, wp:wp + w].set(v_rows)
            )
        return rows_g, p_rows, mv_out

    def update(table, mv, ids, dlooked, lr_t):
        # check_vma=False: the checker cannot infer that the all_gather over
        # 'data' makes the row streams identical on every 'data' replica —
        # true by construction (step 3 above) and pinned by the
        # sharded==single-device equality tests.
        rows_g, p_rows, mv_rows = shard_map(
            local_rows,
            mesh=mesh,
            check_vma=False,
            in_specs=(
                P(MODEL_AXIS, None),
                P(MODEL_AXIS, None),
                P(batch_axes, None),
                P(batch_axes, None, None),
                P(),
            ),
            out_specs=(
                P(MODEL_AXIS),
                P(MODEL_AXIS, None),
                P(MODEL_AXIS, None),
            ),
        )(table, mv, ids, dlooked, lr_t)
        # the scatters run here — OUTSIDE the shard_map — so the outer jit's
        # buffer donation aliases the [V, W] state in place (each global row
        # id appears at most once across shards; sentinels drop)
        table = table.at[rows_g].set(p_rows, mode="drop")
        mv = mv.at[rows_g].set(mv_rows, mode="drop")
        return table, mv

    return update
