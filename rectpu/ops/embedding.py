"""Embedding lookup ops: the replacement for TF's sparse embedding kernels.

The reference's ``embedding_column`` / ``input_layer`` / ``linear_model``
sparse lookups (/root/reference/trainers/ml_100k.py:38,
/root/reference/trainers/deep_fm.py:39,52-54) resolve to TF C++ sparse
gather/scatter kernels. Here every categorical field is a dense global row id
(see rectpu.features.schema), so lookup is a single dense gather and the
gradient a scatter-add — both with static shapes.

Three interchangeable implementations:
  - "take":   jnp.take — XLA's native dynamic-gather; scatter-add gradient.
  - "onehot": one-hot * table matmul — runs on the MXU; gradient is
              one-hot^T * g, also a matmul. Wins when the table is small
              enough that V-wide matmuls beat gather latency.
  - "pallas": fused Pallas kernel of the one-hot matmul (fwd + bwd via
              custom_vjp), tiled over lookup rows, table resident in VMEM.

``embedding_lookup(..., impl="auto")`` picks "take" off-TPU and the
benchmarked default on TPU (see rectpu.ops.autotune / bench.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# --- take ---------------------------------------------------------------


def lookup_take(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather: table [V, K], ids [...,] int32 -> [..., K]."""
    return jnp.take(table, ids, axis=0)


# --- one-hot matmul -------------------------------------------------------


def lookup_onehot(table: jax.Array, ids: jax.Array) -> jax.Array:
    """One-hot matmul lookup: MXU-friendly for small vocabularies.

    out[r] = onehot(ids[r], V) @ table. XLA differentiates this to
    onehot^T @ g, i.e. the scatter-add is also a matmul.
    """
    v = table.shape[0]
    flat = ids.reshape(-1)
    onehot = jax.nn.one_hot(flat, v, dtype=table.dtype)
    out = jnp.dot(onehot, table, preferred_element_type=jnp.float32)
    return out.astype(table.dtype).reshape(*ids.shape, table.shape[1])


# --- pallas fused one-hot matmul ------------------------------------------


def _fwd_kernel(ids_ref, table_ref, out_ref):
    """One grid step: out tile [TR, K] = onehot(ids tile) @ table [V, K]."""
    v = table_ref.shape[0]
    tr = ids_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, v), dimension=1)
    onehot = (cols == ids_ref[:]).astype(table_ref.dtype)
    out_ref[:] = jnp.dot(
        onehot, table_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(ids_ref, g_ref, dtable_ref):
    """Accumulate dtable += onehot(ids tile)^T @ g tile across grid steps."""
    v = dtable_ref.shape[0]
    tr = ids_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtable_ref[:] = jnp.zeros_like(dtable_ref)

    cols = jax.lax.broadcasted_iota(jnp.int32, (tr, v), dimension=1)
    onehot = (cols == ids_ref[:]).astype(g_ref.dtype)
    contrib = jax.lax.dot_general(
        onehot,
        g_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dtable_ref[:] += contrib.astype(dtable_ref.dtype)


def _pallas_fwd(table: jax.Array, flat_ids: jax.Array, tile_r: int, interpret: bool):
    v, k = table.shape
    r = flat_ids.shape[0]
    vp = _round_up(v, 128)
    rp = _round_up(max(r, tile_r), tile_r)
    table_p = jnp.pad(table, ((0, vp - v), (0, 0)))
    # padded ids point at row 0; their output rows are sliced off below
    ids_p = jnp.pad(flat_ids, (0, rp - r)).reshape(rp, 1).astype(jnp.int32)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(rp // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((vp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, k), table.dtype),
        interpret=interpret,
    )(ids_p, table_p)
    return out[:r]


def _pallas_bwd(v: int, flat_ids: jax.Array, g: jax.Array, tile_r: int, interpret: bool,
                out_dtype=None):
    """One-hot^T matmul scatter: dtable [v, K] accumulated in VMEM across
    batch tiles. ``out_dtype`` sets the ACCUMULATION dtype (fp32 keeps
    collision sums exact even for bf16 cotangents — each tile's contribution
    is an MXU matmul with fp32 preferred type)."""
    r, k = g.shape
    vp = _round_up(v, 128)
    rp = _round_up(max(r, tile_r), tile_r)
    # padded rows carry zero cotangent, so their scatter contribution is zero
    g_p = jnp.pad(g, ((0, rp - r), (0, 0)))
    ids_p = jnp.pad(flat_ids, (0, rp - r)).reshape(rp, 1).astype(jnp.int32)
    dtable = pl.pallas_call(
        _bwd_kernel,
        grid=(rp // tile_r,),
        in_specs=[
            pl.BlockSpec((tile_r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((vp, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((vp, k), out_dtype or g.dtype),
        interpret=interpret,
    )(ids_p, g_p)
    return dtable[:v]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_pallas(table, flat_ids, tile_r, interpret):
    return _pallas_fwd(table, flat_ids, tile_r, interpret)


def _lookup_pallas_fwd(table, flat_ids, tile_r, interpret):
    return _pallas_fwd(table, flat_ids, tile_r, interpret), (table.shape[0], flat_ids)


def _lookup_pallas_bwd(tile_r, interpret, res, g):
    v, flat_ids = res
    # accumulate cross-tile collision sums in fp32 even for bf16 cotangents
    # (the += in VMEM would otherwise drop increments below the running
    # sum's bf16 ulp/2), then round once to the cotangent dtype
    dtable = _pallas_bwd(v, flat_ids, g, tile_r, interpret, out_dtype=jnp.float32)
    return dtable.astype(g.dtype), None


_lookup_pallas.defvjp(_lookup_pallas_fwd, _lookup_pallas_bwd)


def lookup_pallas(
    table: jax.Array, ids: jax.Array, tile_r: int = 256, interpret: bool | None = None
) -> jax.Array:
    """Fused Pallas one-hot-matmul lookup with custom fwd/bwd kernels."""
    if interpret is None:
        interpret = not _on_tpu()
    flat = ids.reshape(-1)
    out = _lookup_pallas(table, flat, tile_r, interpret)
    return out.reshape(*ids.shape, table.shape[1])


# --- split lookup: MXU for small fields, gather for huge ones ---------------


def _lookup_split_raw(
    table: jax.Array,
    ids: jax.Array,
    field_info: tuple,
    small_threshold: int = 4096,
    small_impl: str = "pallas",
) -> jax.Array:
    """Field-aware lookup for [B, F] ids over a unified table.

    TPU gathers cost ~constant time PER ROW regardless of row reuse, so
    looking up 26 fields x B rows is 26x the price of one field — even though
    24 of the fields have tiny vocabularies (age buckets, genders, genre
    flags...). This routes fields with vocab <= small_threshold through a
    one-hot matmul over the CONCATENATED small sub-table (a few hundred rows,
    VMEM-resident — MXU work instead of serialized gathers) and keeps the
    dense gather only for the huge hashed fields (user/item/zipcode).
    Measured on v5e at the BASELINE scaled config this turns a 4.0 ms gather
    into ~0.4 ms. Gradients flow through both paths natively (one-hot^T matmul
    scatter for small fields, scatter-add for big ones).

    Args:
        field_info: (offsets, sizes) tuples of per-field table ranges, static.
    """
    offsets, sizes = field_info
    f_total = ids.shape[-1]
    assert len(sizes) == f_total, (len(sizes), f_total)
    small = [f for f in range(f_total) if sizes[f] <= small_threshold]
    big = [f for f in range(f_total) if sizes[f] > small_threshold]
    outs: list = [None] * f_total

    if small:
        small_sizes = [sizes[f] for f in small]
        sub_offs = [0]
        for s in small_sizes[:-1]:
            sub_offs.append(sub_offs[-1] + s)
        total_small = sub_offs[-1] + small_sizes[-1]
        small_table = jnp.concatenate(
            [jax.lax.slice_in_dim(table, offsets[f], offsets[f] + sizes[f]) for f in small],
            axis=0,
        )
        ids_small = jnp.stack(
            [ids[..., f] - offsets[f] + sub_offs[i] for i, f in enumerate(small)], axis=-1
        )
        if small_impl == "pallas" and _on_tpu():
            emb_small = lookup_pallas(small_table, ids_small)
        else:
            emb_small = lookup_onehot(small_table, ids_small)
        for i, f in enumerate(small):
            outs[f] = emb_small[..., i, :]

    for f in big:
        outs[f] = jnp.take(table, ids[..., f], axis=0)

    return jnp.stack(outs, axis=-2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def lookup_split(table, ids, field_info, small_threshold=4096, small_impl="pallas",
                 gather_dtype=None, grad_dtype=None):
    """Split lookup with a custom backward.

    The naive autodiff of the split forward routes each small field's table
    cotangent through a pad-transpose (one full-table materialization per
    slice) — measured slower than the forward it saves. Since the split
    forward is mathematically a plain gather, its true transpose is the plain
    single scatter-add over ALL fields, which is what this VJP emits. The
    scatter ACCUMULATES IN FP32 regardless of gather dtype — thousands of
    colliding small-field ids summed in bf16 would lose ~1% of gradient.

    ``gather_dtype`` (e.g. jnp.bfloat16) casts the table BEFORE gathering:
    elementwise identical to casting the gathered rows after (what the bf16
    towers do anyway) but halves the gather's memory traffic — measured
    7.5 -> 5.7 ms/step on v5e at the scaled config.

    ``grad_dtype`` (e.g. jnp.bfloat16) materializes the dense table cotangent
    in that dtype, halving the scatter/pad/optimizer-read traffic of the
    table-grad path. Collision sums CHANGE precision only for the big hashed
    fields (their scatter accumulates in grad_dtype; collisions are rare by
    construction since vocab > small_threshold); small-field sums still
    reduce in fp32 on the MXU and only the final per-row values round. The
    returned cotangent is cast back to the table dtype lazily (XLA fuses the
    upconvert into the optimizer sweep). Default None keeps the fp32 path.
    """
    t = table.astype(gather_dtype) if gather_dtype is not None else table
    return _lookup_split_raw(t, ids, field_info, small_threshold, small_impl)


def _lookup_split_fwd(table, ids, field_info, small_threshold, small_impl, gather_dtype,
                      grad_dtype):
    out = lookup_split(table, ids, field_info, small_threshold, small_impl, gather_dtype,
                       grad_dtype)
    # empty slice = dtype token (residual leaves must be arrays, not dtypes)
    return out, (table.shape[0], table[:0, :0], ids)


def _small_field_runs(field_info, small_threshold):
    """Contiguous global-id ranges covering the small fields, with each
    field's (field_idx, run_idx, offset_within_run). Static, host-side."""
    offsets, sizes = field_info
    runs = []  # list of [start, end)
    members = []  # (field, run_index, local_offset)
    for f in range(len(sizes)):
        if sizes[f] > small_threshold:
            continue
        start, end = offsets[f], offsets[f] + sizes[f]
        if runs and runs[-1][1] == start:
            members.append((f, len(runs) - 1, runs[-1][1] - runs[-1][0]))
            runs[-1][1] = end
        else:
            members.append((f, len(runs), 0))
            runs.append([start, end])
    return runs, members


def _lookup_split_bwd(field_info, small_threshold, small_impl, gather_dtype, grad_dtype,
                      res, g):
    """Split transpose: per-row scatter only for the huge hashed fields.

    A single scatter-add over all B*F rows costs ~16 ns/ROW on TPU — 3.4 ms
    of a 5.7 ms step at the scaled config. Small fields' cotangents instead
    reduce on the MXU (one-hot^T matmul -> [rows_in_run, K]) and land as
    contiguous-range adds; the scatter handles only the big fields
    (3 x B rows instead of F x B). Collision sums accumulate in fp32 (MXU
    reductions always; the big-field scatter too unless ``grad_dtype``
    narrows the dtable — see lookup_split docstring).
    """
    v, dtype_token, ids = res
    table_dtype = dtype_token.dtype
    offsets, sizes = field_info
    f_total = len(sizes)
    k = g.shape[-1]
    big = [f for f in range(f_total) if sizes[f] > small_threshold]
    runs, members = _small_field_runs(field_info, small_threshold)

    acc_dtype = grad_dtype if grad_dtype is not None else jnp.float32
    dtable = jnp.zeros((v, k), acc_dtype)

    def field_runs(fields):
        """Group consecutive field indices into [flo, fhi) runs (static).
        Consecutive fields occupy a CONTIGUOUS table-id range (offsets are
        cumulative), so a run's global ids already live in
        [offsets[flo], offsets[fhi-1] + sizes[fhi-1])."""
        out = []
        for f in fields:
            if out and out[-1][1] == f:
                out[-1][1] = f + 1
            else:
                out.append([f, f + 1])
        return out

    fdim_ids = ids.ndim - 1
    fdim_g = g.ndim - 2

    # small fields: per-run one-hot^T matmul reduction + contiguous range
    # write. MEASURED (v5e, scaled config): the XLA one-hot dot wins — a
    # Pallas VMEM-resident variant of this reduction regressed the step
    # 3.6 -> 7.5 ms (sequential grid + small matmuls underuse the MXU), and
    # raising the threshold so the 10k zipcode field takes this path instead
    # of the scatter lost 3x more (11.2 ms). Keep the jnp form.
    for flo, fhi in field_runs([m[0] for m in members]):
        start = offsets[flo]
        end = offsets[fhi - 1] + sizes[fhi - 1]
        ids_r = jax.lax.slice_in_dim(ids, flo, fhi, axis=fdim_ids).reshape(-1) - start
        g_r = jax.lax.slice_in_dim(g, flo, fhi, axis=fdim_g).reshape(-1, k)
        onehot = jax.nn.one_hot(ids_r, end - start, dtype=g_r.dtype)
        d_run = jax.lax.dot_general(
            onehot, g_r,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [end-start, k]
        dtable = jax.lax.dynamic_update_slice(dtable, d_run.astype(acc_dtype), (start, 0))

    # big fields: per-run scatter-add (orders of magnitude fewer rows than F*B)
    for flo, fhi in field_runs(big):
        ids_r = jax.lax.slice_in_dim(ids, flo, fhi, axis=fdim_ids).reshape(-1)
        g_r = (
            jax.lax.slice_in_dim(g, flo, fhi, axis=fdim_g)
            .reshape(-1, k)
            .astype(acc_dtype)
        )
        dtable = dtable.at[ids_r].add(g_r)

    return dtable.astype(table_dtype), None


lookup_split.defvjp(_lookup_split_fwd, _lookup_split_bwd)


# --- flat (lane-packed) lookup ---------------------------------------------


def _flat_partition(field_info, small_threshold):
    """Static split of fields into small/big with sub-table offsets."""
    offsets, sizes = field_info
    f_total = len(sizes)
    small = [f for f in range(f_total) if sizes[f] <= small_threshold]
    big = [f for f in range(f_total) if sizes[f] > small_threshold]
    sub_offs = []
    total = 0
    for f in small:
        sub_offs.append(total)
        total += sizes[f]
    return small, big, sub_offs, total


def _flat_multihot(ids, field_info, small, sub_offs, total_small, dtype):
    """[B, S] multi-hot over the concatenated small sub-table id space.

    Row b has one 1 per small field (ranges are disjoint), so a single
    multihot @ blockdiag matmul yields every small field's embedding at once.
    """
    offsets, _ = field_info
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, total_small), 1)
    mh = jnp.zeros((ids.shape[0], total_small), dtype)
    for i, f in enumerate(small):
        local = ids[:, f] - offsets[f] + sub_offs[i]
        mh = mh + (local[:, None] == iota).astype(dtype)
    return mh


def _flat_blockdiag(table, field_info, small, sub_offs, total_small, k, has_lin):
    """[S, F*K (+1)] block-diagonal expansion of the small sub-tables.

    Field f's rows occupy columns [f*K, (f+1)*K); the packed linear weight of
    EVERY small field lands in the shared last column, so the multi-hot matmul
    emits sum_f w[id_f] there for free. A few hundred KB, rebuilt per step
    (it is just the parameter content rearranged)."""
    offsets, sizes = field_info
    f_total = len(sizes)
    width = f_total * k + (1 if has_lin else 0)
    t = jnp.zeros((total_small, width), table.dtype)
    for i, f in enumerate(small):
        blk = jax.lax.slice_in_dim(table, offsets[f], offsets[f] + sizes[f])
        t = jax.lax.dynamic_update_slice(t, blk[:, :k], (sub_offs[i], f * k))
        if has_lin:
            t = jax.lax.dynamic_update_slice(t, blk[:, k:k + 1], (sub_offs[i], f_total * k))
    return t


def _lookup_flat_raw(table, ids, field_info, k, small_threshold):
    """Forward: packed table [V, K(+1)], ids [B, F] ->
    (emb_flat [B, F*K], lin [B] | None, multihot [B, S] | None)."""
    offsets, sizes = field_info
    f_total = len(sizes)
    b = ids.shape[0]
    has_lin = table.shape[1] >= k + 1  # >=: packed_col_pad appends zero cols
    small, big, sub_offs, total_small = _flat_partition(field_info, small_threshold)

    mh = None
    if small:
        mh = _flat_multihot(ids, field_info, small, sub_offs, total_small, table.dtype)
        bd = _flat_blockdiag(table, field_info, small, sub_offs, total_small, k, has_lin)
        out = jnp.dot(mh, bd, preferred_element_type=jnp.float32).astype(table.dtype)
    else:
        out = jnp.zeros((b, f_total * k + (1 if has_lin else 0)), table.dtype)

    lin = out[:, f_total * k].astype(jnp.float32) if has_lin else None
    emb_flat = out[:, : f_total * k]
    for f in big:
        piece = jnp.take(table, ids[:, f], axis=0)  # [B, K(+1)]
        emb_flat = jax.lax.dynamic_update_slice(emb_flat, piece[:, :k], (0, f * k))
        if has_lin:
            lin = lin + piece[:, k].astype(jnp.float32)
    return emb_flat, lin, mh


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def lookup_flat(table, ids, field_info, k, small_threshold=4096, gather_dtype=None,
                grad_dtype=None, scatter_impl="xla", dense_threshold=16384):
    """Lane-packed field lookup: [B, F] ids over a packed [V, K+1] table ->
    (emb_flat [B, F*K], lin_logit [B]).

    The [B, F, K+1] form the split lookup materializes is tile-padded by the
    TPU layout (26 -> 32 sublanes, 65 -> 128 lanes: ~2.4x physical bytes), and
    every consumer — FM, the DNN flatten-reshape, the dlooked cotangent —
    pays it. This op keeps the looked activations FLAT: F*K = 26*64 = 1664 =
    13 exact lane tiles, no padding anywhere.

      - small fields (vocab <= small_threshold): ONE multihot [B, S] @
        block-diagonal sub-table [S, F*K+1] MXU matmul produces all their
        embeddings in their final flat positions AND the summed linear logit
        (shared last column) in the same pass.
      - big hashed fields: per-field gather, written into the field's 64-wide
        column slot.

    Backward mirrors it: dtable for small fields is multihot^T @ [d_emb|d_lin]
    (fp32 MXU accumulation) + block extraction; big fields scatter-add B rows
    each, accumulating in ``grad_dtype`` (the lookup_split precision contract).

    ``gather_dtype`` casts the table before use (bf16 halves traffic);
    ``grad_dtype`` narrows the dense cotangent. Replaces the reference's
    sparse input_layer/linear_model kernels (/root/reference/trainers/
    deep_fm.py:37-73) for the flat-layout DeepFM path.

    ``scatter_impl``: how the backward builds the dense table cotangent.
    "xla" = zeros + dynamic_update_slice blocks + serial scatter-add;
    "mxu" = MXU rebuild, with big fields further split by ``dense_threshold``:
      - dense-medium fields (small_threshold < size <= dense_threshold): their
        B gradient rows concentrate in a handful of table tiles (e.g. 8192
        rows into zipcode's 10k-row range ~ 1.6k rows/tile), which overflows
        the scatter_rows per-tile capacity — instead each field's table slice
        is rebuilt directly as a fused one-hot [B, size]^T @ grads MXU matmul
        and written in with dynamic_update_slice (disjoint row ranges).
      - huge fields (size > dense_threshold): gradient rows merge with the
        small-field block rows into ONE sorted update stream rebuilt by
        ops/scatter_rows.scatter_rows_dense per-tile one-hot matmuls (XLA's
        serial scatter costs ~45 ns/row, the dominant op of the flat step);
        uniform hashing over >> capacity tiles keeps every tile under the
        Pallas capacity so the fast path actually executes.
    """
    if table.shape[1] > k + 1:
        raise NotImplementedError(
            f"lookup_flat does not support a lane-padded packed table "
            f"(width {table.shape[1]} > K+1={k + 1}): packed_col_pad is a "
            f"fast-step/non-flat layout. Measured moot anyway: the flagship "
            f"flat path's MXU grad rebuild beats per-row XLA scatters at "
            f"this scale (RESULTS.md round 5).")
    t = table.astype(gather_dtype) if gather_dtype is not None else table
    emb_flat, lin, _ = _lookup_flat_raw(t, ids, field_info, k, small_threshold)
    return emb_flat, lin


def _lookup_flat_fwd(table, ids, field_info, k, small_threshold, gather_dtype, grad_dtype,
                     scatter_impl, dense_threshold):
    t = table.astype(gather_dtype) if gather_dtype is not None else table
    emb_flat, lin, mh = _lookup_flat_raw(t, ids, field_info, k, small_threshold)
    # [0, width] slice = dtype AND table-width token (residual leaves must be arrays)
    return (emb_flat, lin), (table.shape[0], table[:0], ids, mh)


# scatter_impl="auto" resolution for the flat backward (pinned by the
# autotuner; "xla" default = the parity-exact serial scatter)
_FLAT_SCATTER_AUTO = {"tpu": "xla", "other": "xla"}


def set_flat_scatter_auto_impl(name: str, on_tpu: bool = True) -> None:
    assert name in ("xla", "mxu"), name
    _FLAT_SCATTER_AUTO["tpu" if on_tpu else "other"] = name


def _lookup_flat_bwd(field_info, k, small_threshold, gather_dtype, grad_dtype,
                     scatter_impl, dense_threshold, res, cts):
    if scatter_impl == "auto":
        scatter_impl = _FLAT_SCATTER_AUTO["tpu" if _on_tpu() else "other"]
    if scatter_impl == "mxu":
        return _lookup_flat_bwd_mxu(field_info, k, small_threshold, grad_dtype,
                                    dense_threshold, res, cts)
    v, dtype_token, ids, mh = res
    d_emb, d_lin = cts
    offsets, sizes = field_info
    f_total = len(sizes)
    width = dtype_token.shape[1]
    has_lin = width >= k + 1  # >=: packed_col_pad appends zero cols
    small, big, sub_offs, total_small = _flat_partition(field_info, small_threshold)

    acc_dtype = grad_dtype if grad_dtype is not None else jnp.float32
    dtable = jnp.zeros((v, width), acc_dtype)

    if small:
        if has_lin:
            d_aug = jnp.concatenate(
                [d_emb, d_lin[:, None].astype(d_emb.dtype)], axis=1
            )  # [B, F*K+1]
        else:
            d_aug = d_emb
        d_bd = jax.lax.dot_general(
            mh, d_aug,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, F*K(+1)] — fp32 MXU collision sums (small fields collide often)
        for i, f in enumerate(small):
            rows = jax.lax.dynamic_slice(
                d_bd, (sub_offs[i], f * k), (sizes[f], k)
            )
            if has_lin:
                lin_rows = jax.lax.dynamic_slice(
                    d_bd, (sub_offs[i], f_total * k), (sizes[f], 1)
                )
                rows = jnp.concatenate([rows, lin_rows], axis=1)
            dtable = jax.lax.dynamic_update_slice(
                dtable, rows.astype(acc_dtype), (offsets[f], 0)
            )

    if big:
        # ONE scatter over the concatenated (ids, grads) of all big fields.
        # Measured vs per-field sequential scatters at the scaled config:
        # 3.323 vs 3.336 ms/step — XLA already chains the per-field scatter
        # fusions without re-sweeping the table, so this is parity, kept for
        # the single-HLO form (one scatter regardless of field count).
        g_parts, id_parts = [], []
        for f in big:
            g_f = jax.lax.dynamic_slice(d_emb, (0, f * k), (d_emb.shape[0], k))
            if has_lin:
                g_f = jnp.concatenate([g_f, d_lin[:, None].astype(g_f.dtype)], axis=1)
            g_parts.append(g_f.astype(acc_dtype))
            id_parts.append(ids[:, f])
        dtable = dtable.at[jnp.concatenate(id_parts)].add(jnp.concatenate(g_parts))

    return dtable.astype(dtype_token.dtype), None


def _lookup_flat_bwd_mxu(field_info, k, small_threshold, grad_dtype, dense_threshold,
                         res, cts):
    """Flat-lookup backward via MXU rebuilds (no serial scatter anywhere).

    Same math as the XLA path, different dense-grad construction, split
    three ways by field size:
      - small fields: block rows from the shared multihot^T matmul (as the
        XLA path), written in with dynamic_update_slice;
      - dense-medium fields (size <= dense_threshold): the B gradient rows
        would overflow a scatter_rows tile (e.g. 8192 rows into a 10k-row
        field = ~1.6k rows per 2048-row tile vs capacity 512), so the field's
        whole [size, W] slice is rebuilt as ONE fused one-hot
        [B, size]^T @ grads matmul and written in (row ranges are disjoint);
      - huge fields: per-example rows merge into one sorted stream for
        scatter_rows_dense's per-tile one-hot rebuild — uniform hashing over
        size >> dense_threshold keeps every tile under capacity, so the
        Pallas path (not its lax.cond fallback) actually executes.
    Collisions accumulate in fp32 on the MXU for ALL field classes (the XLA
    path's big-field scatter accumulates in grad_dtype)."""
    from rectpu.ops.scatter_rows import scatter_rows_dense

    v, dtype_token, ids, mh = res
    d_emb, d_lin = cts
    offsets, sizes = field_info
    f_total = len(sizes)
    width = dtype_token.shape[1]
    has_lin = width >= k + 1  # >=: packed_col_pad appends zero cols
    small, big, sub_offs, total_small = _flat_partition(field_info, small_threshold)
    medium = [f for f in big if sizes[f] <= dense_threshold]
    huge = [f for f in big if sizes[f] > dense_threshold]

    acc_dtype = grad_dtype if grad_dtype is not None else jnp.float32
    b = d_emb.shape[0]

    def field_grad(f):
        g_f = jax.lax.dynamic_slice(d_emb, (0, f * k), (b, k))
        if has_lin:
            g_f = jnp.concatenate([g_f, d_lin[:, None].astype(g_f.dtype)], axis=1)
        return g_f  # [B, W]

    # -- huge fields + small block rows: one sorted stream -------------------
    id_parts, g_parts = [], []
    d_bd = None
    if small:
        if has_lin:
            d_aug = jnp.concatenate(
                [d_emb, d_lin[:, None].astype(d_emb.dtype)], axis=1
            )  # [B, F*K+1]
        else:
            d_aug = d_emb
        d_bd = jax.lax.dot_general(
            mh, d_aug,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [S, F*K(+1)] fp32
        for i, f in enumerate(small):
            rows = jax.lax.dynamic_slice(d_bd, (sub_offs[i], f * k), (sizes[f], k))
            if has_lin:
                lin_rows = jax.lax.dynamic_slice(
                    d_bd, (sub_offs[i], f_total * k), (sizes[f], 1)
                )
                rows = jnp.concatenate([rows, lin_rows], axis=1)
            id_parts.append(
                jnp.arange(offsets[f], offsets[f] + sizes[f], dtype=jnp.int32)
            )
            g_parts.append(rows)
    for f in huge:
        id_parts.append(ids[:, f])
        g_parts.append(field_grad(f))

    if id_parts:
        all_ids = jnp.concatenate(id_parts)
        all_g = jnp.concatenate([p.astype(acc_dtype) for p in g_parts])
        dtable = scatter_rows_dense(
            all_ids, all_g, v, out_dtype=acc_dtype, interpret=not _on_tpu()
        )
    else:
        dtable = jnp.zeros((v, width), acc_dtype)

    # -- dense-medium fields: direct one-hot rebuild of each table slice -----
    for f in medium:
        g_f = field_grad(f)
        local = ids[:, f] - offsets[f]  # [B] in [0, size)
        onehot = (
            local[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (b, sizes[f]), 1)
        ).astype(g_f.dtype)  # fused into the matmul operand by XLA
        d_block = jax.lax.dot_general(
            onehot, g_f,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [size, W] fp32 collision sums
        dtable = jax.lax.dynamic_update_slice(
            dtable, d_block.astype(acc_dtype), (offsets[f], 0)
        )

    return dtable.astype(dtype_token.dtype), None


lookup_flat.defvjp(_lookup_flat_fwd, _lookup_flat_bwd)


# --- dispatcher -----------------------------------------------------------

_IMPLS = {"take": lookup_take, "onehot": lookup_onehot, "pallas": lookup_pallas}
_AUTO_DEFAULT = {"tpu": "split", "other": "take"}


def set_auto_impl(name: str, on_tpu: bool = True) -> None:
    """Set the implementation 'auto' resolves to (called by the autotuner)."""
    assert name in _IMPLS or name == "split", name
    _AUTO_DEFAULT["tpu" if on_tpu else "other"] = name


def embedding_lookup(
    table: jax.Array,
    ids: jax.Array,
    impl: str = "auto",
    field_info: tuple | None = None,
    gather_dtype=None,
    grad_dtype=None,
    small_threshold: int = 4096,
) -> jax.Array:
    """Lookup rows of ``table`` [V, K] at ``ids`` [...] -> [..., K].

    ``impl='split'`` requires ``field_info`` (per-field offsets/sizes) and ids
    of shape [..., F]; other impls accept any id shape. ``gather_dtype``
    (split impl only) casts the table before gathering — halves gather
    traffic for bf16 towers while keeping fp32 scatter accumulation.
    ``grad_dtype`` (split impl only) narrows the dense table-cotangent
    materialization (see lookup_split).
    """
    if impl == "auto":
        impl = _AUTO_DEFAULT["tpu" if _on_tpu() else "other"]
        if impl == "split" and field_info is None:
            impl = "take"
    if impl == "split":
        if field_info is None:
            raise ValueError("impl='split' requires field_info")
        return lookup_split(table, ids, field_info, small_threshold=small_threshold,
                            gather_dtype=gather_dtype, grad_dtype=grad_dtype)
    out = _IMPLS[impl](table, ids)
    return out.astype(gather_dtype) if gather_dtype is not None else out
