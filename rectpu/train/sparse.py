"""Sparse (lazy) row updates for embedding tables.

TF's sparse optimizer kernels (`_apply_sparse`, used by every canned estimator
for embedding variables — SURVEY.md §2b optimizer row) update only the rows a
batch touched. Our dense path instead materializes a full [V, K] gradient
(zeros + scatter-add) and runs Adam over every row — measured ~2 ms of a
7.5 ms DeepFM step at the scaled config, for a table where a batch touches
<8% of rows. This module provides the sparse path:

  - ``dedupe_rows``: sort + segment-sum duplicate ids into per-unique-row
    gradients, static shapes throughout (padding rows get an out-of-range id
    and are dropped by the scatters).
  - ``sparse_adam_rows``: TF-style lazy Adam on exactly those rows (untouched
    rows keep stale m/v and receive no step — identical to
    ``tf.train.AdamOptimizer._apply_sparse`` semantics).

The fast DeepFM training step (rectpu/train/fast_step.py) wires these in by
differentiating w.r.t. the GATHERED rows instead of the table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unique_capacity(field_sizes, batch: int, total: int, align: int = 512) -> int:
    """Static upper bound on the number of distinct ids a [batch, F] id
    matrix can contain: per field at most min(size_f, batch) values occur,
    and fields occupy disjoint ranges of the unified id space, so the
    distinct-id count is at most the sum. ``dedupe_rows`` packs the uniques
    into the FIRST slots of its output (sorted segment ids), so slicing its
    [R]-shaped result to this capacity is exact — it only drops sentinel
    padding. At the big-table config this is 25k of R=213k rows (8.7x fewer
    rows for the latency-bound lazy-Adam gathers/scatters to touch).

    ``total`` is R (the unsliced length); the result is align-rounded and
    clamped to it.

    PRECONDITION: every id in column f of the [batch, F] matrix must lie in
    its field's [offset_f, offset_f + size_f) range — the per-field
    min(size_f, batch) counting argument is only valid then. The feature
    pipeline guarantees this by construction (FeatureSet.encode clamps /
    buckets / hashes into the field range; tests/test_fast_step.py pins it),
    but an id from OUTSIDE the pipeline (corrupt input, hand-built batch)
    can push the true unique count past this bound, and rows beyond the
    slice — real rows carrying gradient — would then be silently dropped.
    ``check_ids_in_field_ranges`` is the debug-mode guard for that contract.
    """
    c = sum(min(int(s), batch) for s in field_sizes)
    return min(int(total), -(-c // align) * align)


def check_ids_in_field_ranges(ids, offsets, field_sizes):
    """Debug guard for the ``unique_capacity`` precondition: raise if any id
    in column f of the [batch, F] matrix falls outside [offset_f,
    offset_f + size_f). Host-side (numpy) — call it on concrete batches in
    tests or validation paths, not inside jit."""
    import numpy as np

    ids = np.asarray(ids)
    for f, (off, size) in enumerate(zip(offsets, field_sizes)):
        col = ids[..., f]
        bad = (col < off) | (col >= off + size)
        if bad.any():
            i = np.argwhere(bad)[0]
            raise ValueError(
                f"field {f}: id {col[tuple(i)]} outside [{off}, {off + size}) "
                f"at batch index {tuple(i)} — violates the unique_capacity "
                "slice contract (rows past the bound would be silently dropped)"
            )


def dedupe_rows(ids: jax.Array, grads: jax.Array, num_rows: int,
                num_out: int | None = None):
    """Sum gradients of duplicate ids.

    Args:
        ids: [R] int32 row ids (duplicates allowed).
        grads: [R, K] per-lookup gradients.
        num_rows: table row count V (used for the drop sentinel).
        num_out: output length (default R). When a static bound on the
            unique count is known (``unique_capacity``), passing it here
            builds the [num_out, K] result DIRECTLY instead of a full
            [R, K] (mostly-zero) slab that a later slice throws away —
            at the big config that skips ~190 MB of segment-sum output
            traffic per step. EXACT under the same in-range-ids
            precondition as the slice (uniques occupy the first slots).

    Returns:
        (rows [num_out], row_grads [num_out, K]): rows[i] is the i-th
        unique id in sorted order for i < U (number of uniques), and
        ``num_rows`` (out of range, dropped by `.at[].set(mode='drop')`)
        for i >= U; row_grads[i] is the summed gradient of that unique id.
    """
    r = ids.shape[0]
    n_out = r if num_out is None else min(int(num_out), r)
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_ids[1:] != sorted_ids[:-1]]
    )
    seg = jnp.cumsum(new_run) - 1  # [R] in [0, U), nondecreasing
    row_grads = jax.ops.segment_sum(
        grads[order], seg, num_segments=n_out, indices_are_sorted=True
    )
    rows = (
        jnp.full((n_out,), num_rows, dtype=ids.dtype)
        .at[seg].set(sorted_ids, indices_are_sorted=True, mode="drop")
    )
    return rows, row_grads


def sparse_adam_rows(
    params: jax.Array,
    m: jax.Array,
    v: jax.Array,
    rows: jax.Array,
    row_grads: jax.Array,
    lr_t: jax.Array,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    sorted_rows: bool = True,
):
    """Lazy-Adam update of ``params[rows]`` (out-of-range rows dropped).

    ``rows`` must be non-negative, unique apart from a shared out-of-range
    sentinel, and — when ``sorted_rows`` (the default; ``dedupe_rows``'s
    output satisfies it) — NONDECREASING, which lets XLA skip its scatter
    conflict handling. Pass ``sorted_rows=False`` when a caller's id
    remapping breaks the order (the 1d-EP shard mask). ``lr_t`` is the
    bias-corrected rate lr*sqrt(1-b2^t)/(1-b1^t) computed by the caller from
    the shared step counter.
    """
    grads_dtype = params.dtype
    row_grads = row_grads.astype(grads_dtype)
    m_rows = m[rows] * beta1 + row_grads * (1 - beta1)
    v_rows = v[rows] * beta2 + jnp.square(row_grads) * (1 - beta2)
    p_rows = params[rows] - lr_t * m_rows / (jnp.sqrt(v_rows) + epsilon)
    # duplicate sentinel rows all carry identical content; 'drop' discards OOB
    m = m.at[rows].set(m_rows, mode="drop", indices_are_sorted=sorted_rows)
    v = v.at[rows].set(v_rows, mode="drop", indices_are_sorted=sorted_rows)
    params = params.at[rows].set(p_rows, mode="drop",
                                 indices_are_sorted=sorted_rows)
    return params, m, v


def sparse_adam_rows_packed(
    params: jax.Array,
    mv: jax.Array,
    rows: jax.Array,
    row_grads: jax.Array,
    lr_t: jax.Array,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    sorted_rows: bool = True,
    scatter_backend: str = "xla",
    v_valid: int | None = None,
    sr_seed=None,
):
    """``sparse_adam_rows`` with the m/v slots PACKED as one [V, 2W] slab.

    Random-row state traffic is LATENCY-bound at big-table scale
    (~0.3 us/row regardless of width, RESULTS.md round-3 re-measurement);
    the unpacked form pays SIX per-row passes (gather p/m/v + scatter
    p/m/v), this one pays FOUR (p and the combined mv). Bitwise-identical
    arithmetic: the packed columns are [m | v].

    ``params`` may be [V, W] or [V] (a fused linear weight) — mv is then
    [V, 2W] or [V, 2].

    ``scatter_backend``: "xla" (`.at[].set` — a full-table pass, ~8 ns x
    table-byte) or "dma" (ops/scatter_dma window-RMW kernel —
    table-size-independent, ~110 ns/row; requires SORTED UNIQUE rows,
    fp32 2D state, and >= 8 pad rows past ``v_valid``). Same SET
    semantics, bitwise-equal results (tests/test_scatter_dma.py).
    """
    vec = params.ndim == 1
    p2 = params[:, None] if vec else params
    w = p2.shape[1]
    g = (row_grads[:, None] if vec else row_grads).astype(p2.dtype)
    # the slab may be LANE-PADDED: [V, 2*wp] with m in cols [0, w) and v in
    # [wp, wp+w) — the round-5 finding is that XLA's scatter is per-row
    # fast ONLY at 128-multiple widths (an odd-width slab pays a full-table
    # pass, ~8 ns x table-byte); wp == w is the legacy tight layout
    wp = mv.shape[1] // 2
    # bf16 slabs (the capacity layout: halves optimizer-state HBM) do the
    # row math in fp32 and store back m as plain bf16 (AUC-neutral) and v
    # via STOCHASTIC ROUNDING (plain bf16 v underflows its increments —
    # optimizers.stochastic_round_bf16 rationale); ``sr_seed`` = step t.
    bf16_slots = mv.dtype == jnp.bfloat16
    mv_rows = mv[rows]
    if bf16_slots:
        mv_rows = mv_rows.astype(jnp.float32)
        if sr_seed is None:
            raise ValueError("bf16 m|v slab needs sr_seed (the step counter)")
    m_rows = mv_rows[:, :w] * beta1 + g.astype(mv_rows.dtype) * (1 - beta1)
    v_rows = (mv_rows[:, wp:wp + w] * beta2
              + jnp.square(g.astype(mv_rows.dtype)) * (1 - beta2))
    p_rows = p2[rows] - lr_t * m_rows / (jnp.sqrt(v_rows) + epsilon)
    if bf16_slots:
        from rectpu.train.optimizers import stochastic_round_bf16

        m_store = m_rows.astype(jnp.bfloat16)
        v_store = stochastic_round_bf16(v_rows, jnp.asarray(sr_seed))
    else:
        m_store, v_store = m_rows, v_rows
    if wp == w:
        mv_new = jnp.concatenate([m_store, v_store], axis=1)
    else:
        mv_new = (
            jnp.zeros((m_store.shape[0], 2 * wp), mv.dtype)
            .at[:, :w].set(m_store).at[:, wp:wp + w].set(v_store)
        )
    if scatter_backend == "dma" and not vec and sorted_rows:
        from rectpu.ops.embedding import _on_tpu
        from rectpu.ops.scatter_dma import scatter_rows_dma

        if _on_tpu() and (p2.shape[1] % 128 or mv.shape[1] % 128):
            raise ValueError(
                f"scatter_backend='dma' needs 128-multiple slab widths on "
                f"TPU (Mosaic lane tiling; got p {p2.shape[1]}, mv "
                f"{mv.shape[1]}) — set packed_col_pad=128 / state_pad")
        vv = v_valid if v_valid is not None else p2.shape[0] - 256
        mv = scatter_rows_dma(mv, rows, mv_new, v_valid=vv)
        p2 = scatter_rows_dma(p2, rows, p_rows.astype(p2.dtype), v_valid=vv)
    else:
        mv = mv.at[rows].set(mv_new, mode="drop",
                             indices_are_sorted=sorted_rows)
        p2 = p2.at[rows].set(p_rows, mode="drop",
                             indices_are_sorted=sorted_rows)
    return (p2[:, 0] if vec else p2), mv


def adam_lr_t(learning_rate: float, t: jax.Array, beta1: float = 0.9, beta2: float = 0.999):
    tf_ = t.astype(jnp.float32)
    return learning_rate * jnp.sqrt(1.0 - beta2**tf_) / (1.0 - beta1**tf_)
