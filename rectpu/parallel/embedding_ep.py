"""EP (embedding-parallel) lookup: row-sharded tables on the 'model' axis.

This is the TPU-native replacement for the reference's parameter-server role
(embedding variables hosted on PS, SURVEY.md §2c): the unified embedding table
[V, K] is row-sharded across the 'model' mesh axis; ids arrive sharded across
the 'data' axis. Each device masks ids to its local row range, gathers
locally, and a single psum over 'model' (riding ICI) assembles the full
[B/d, F, K] activations per data shard. Autodiff through shard_map yields the
reverse path for free: the table cotangent is the local scatter-add psum'd
over 'data' — exactly the DLRM-style sparse gradient exchange.

Three exchange strategies, cheapest-first for this model family:
  - ``make_ep_lookup``      1D masked-gather + psum (towers replicated on 'model')
  - ``make_ep_lookup_2d``   2D DLRM: id all_gather + activation reduce_scatter
  - ``make_ep_lookup_dedup`` 2D with id DEDUP + row all_to_all: exchanges only
    the unique rows each peer owns — for this schema a batch slice's unique
    ids are ~8x fewer than its B*F lookups (19 genre fields share 2 rows
    each), so for wide K this moves ~8x fewer activation bytes over ICI than
    the reduce_scatter variant (SURVEY.md §2c / §7 step 5).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from rectpu.ops.embedding import _on_tpu
from rectpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

COMM_COMPRESS_MODES = (None, "bf16", "int8")


def _quantize_rows_int8(x):
    """Per-row symmetric int8 quantization: [..., K] -> (int8 q, f32 scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(xf / scale).astype(jnp.int8)
    return q, scale


def _make_row_all_to_all(comm_compress):
    """all_to_all(x, 'model', 0, 0) for [M, C, K] row payloads, optionally
    compressed on the wire (the DLRM comm-compression pattern: fp rows are
    the dominant ICI bytes, ids stay exact int32).

      - None:   plain all_to_all in the payload dtype.
      - "bf16": rows ride as bf16 (2x fewer bytes vs f32); the backward
        cotangent exchange rides bf16 too.
      - "int8": rows ride as int8 + one f32 scale per row (~3.8x fewer
        bytes); DUAL-LEVEL: the backward cotangent exchange uses the
        tighter bf16 path (gradients tolerate less error than activations
        — arXiv:2407.04272's asymmetric-error-bound finding).

    Compression changes values (tests bound the error); exact modes keep
    the sharded==unsharded equality guarantees.
    """
    if comm_compress is None:
        return lambda x: jax.lax.all_to_all(x, MODEL_AXIS, 0, 0, tiled=False)
    if comm_compress not in COMM_COMPRESS_MODES:
        raise ValueError(f"comm_compress must be one of {COMM_COMPRESS_MODES}")

    def _fwd_impl(x):
        if comm_compress == "bf16":
            y = jax.lax.all_to_all(
                x.astype(jnp.bfloat16), MODEL_AXIS, 0, 0, tiled=False
            )
            return y.astype(x.dtype)
        q, scale = _quantize_rows_int8(x)
        qb = jax.lax.all_to_all(q, MODEL_AXIS, 0, 0, tiled=False)
        sb = jax.lax.all_to_all(scale, MODEL_AXIS, 0, 0, tiled=False)
        return (qb.astype(jnp.float32) * sb).astype(x.dtype)

    @jax.custom_vjp
    def xchg(x):
        return _fwd_impl(x)

    def fwd(x):
        return _fwd_impl(x), None

    def bwd(_, g):
        # all_to_all(split=concat=0) is its own transpose (device i's block j
        # lands on device j's block i); cotangents always ride bf16. fwd
        # preserves dtype, so g.dtype == x.dtype — no residual needed.
        gb = jax.lax.all_to_all(
            g.astype(jnp.bfloat16), MODEL_AXIS, 0, 0, tiled=False
        )
        return (gb.astype(g.dtype),)

    xchg.defvjp(fwd, bwd)
    return xchg


def _check_rs_compress(comm_compress):
    if comm_compress not in (None, "bf16"):
        raise ValueError(
            "reduce_scatter exchanges support comm_compress in (None, 'bf16'); "
            "int8 rows cannot be summed across shards with per-shard scales — "
            "use ep_mode='dedup' for int8"
        )


def _compressed_psum_scatter(x, comm_compress):
    """psum_scatter over 'model', optionally riding bf16. Each element is
    nonzero on exactly ONE model shard (the id's owner; peers contribute
    masked zeros), so the bf16 sum itself is EXACT — the only error is the
    initial round of the gathered rows to bf16 (zero if the table is bf16)."""
    if comm_compress == "bf16" and x.dtype != jnp.bfloat16:
        y = jax.lax.psum_scatter(
            x.astype(jnp.bfloat16), MODEL_AXIS, scatter_dimension=0, tiled=True
        )
        return y.astype(x.dtype)
    return jax.lax.psum_scatter(x, MODEL_AXIS, scatter_dimension=0, tiled=True)


def make_ep_lookup_2d(mesh: Mesh, comm_compress: str | None = None):
    """2D sparse-parallel lookup (the DLRM pattern, SURVEY.md §2c).

    The batch is sharded over ALL devices — P(('data','model')) on the batch
    dim — so the dense towers run data-parallel across the whole mesh (the
    1D variant duplicates tower compute across the 'model' axis). The table
    stays row-sharded over 'model'. Exchange per shard_map instance:

        all_gather ids over 'model'      [B/dm, F] -> [B/d, F]   (cheap ints)
        mask + local gather              -> partial [B/d, F, K]
        reduce_scatter over 'model'      -> exact   [B/dm, F, K]

    reduce_scatter moves half the bytes of the psum in the 1D variant and
    returns activations already in the 2D batch layout. Autodiff reverses it
    (all_gather of cotangents, local scatter-add, psum of table grads over
    'data') for free.

    ``comm_compress="bf16"`` rides the reduce_scatter (and its backward
    all_gather) in bf16 — see _compressed_psum_scatter for why the sum stays
    exact.
    """
    _check_rs_compress(comm_compress)

    def local_lookup(table_shard, ids_local):
        # table_shard: [V/m, K]; ids_local: [B/(d*m), F] of GLOBAL row ids
        ids_full = jax.lax.all_gather(
            ids_local.astype(jnp.int32), MODEL_AXIS, axis=0, tiled=True
        )  # [B/d, F]
        m = jax.lax.axis_index(MODEL_AXIS)
        v_shard = table_shard.shape[0]
        local = ids_full - m * v_shard
        in_range = (local >= 0) & (local < v_shard)
        safe = jnp.where(in_range, local, 0)
        emb = jnp.take(table_shard, safe, axis=0)  # [B/d, F, K]
        emb = jnp.where(in_range[..., None], emb, jnp.zeros_like(emb))
        # sum partials across table shards AND return this device's batch slice
        return _compressed_psum_scatter(emb, comm_compress)

    def lookup(table, ids):
        return shard_map(
            local_lookup,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
            out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
        )(table, ids)

    return lookup


def make_ep_lookup_dedup(
    mesh: Mesh,
    peer_capacity: int | None = None,
    comm_compress: str | None = None,
    scatter_impl: str = "xla",
):
    """2D EP lookup exchanging DEDUPLICATED rows via all_to_all.

    The reduce_scatter variant (make_ep_lookup_2d) moves a dense
    [B/d, F, K] activation block over ICI no matter how redundant the ids
    are. Here each device instead:

        1. dedups its local [B/dm, F] ids (sort + unique-slot compaction,
           static shapes);
        2. buckets unique ids by owning table shard (id // v_shard) into a
           [M, C] request buffer (C = peer capacity, static);
        3. all_to_all the requests (cheap ints), local gather on the owner,
           all_to_all the [M, C, K] rows back;
        4. expands unique rows to all [B/dm, F] positions with a local gather.

    Exchange volume is unique-rows * K instead of B/dm * F * K — for the
    ml-100k schema ~8x less (19 genre fields share 2 rows each; the small
    vocabs collapse to ~150 unique rows per slice). Autodiff reverses the
    pipeline for free: cotangents dedup-accumulate locally (transpose of the
    expansion gather), ride the same all_to_all back, and scatter-add into
    the owning shard — the gradient exchange is deduped too.

    ``peer_capacity``: static per-peer request slots. The default
    min(N, V/m) (N = B/dm*F local lookups) is PROVABLY lossless — a peer can
    be asked for at most that many unique rows — so results are exact but
    the exchange only wins over the dense variant through occupancy, not
    buffer size. Production deployments should tune it down (e.g. N/8 for
    this schema); ids beyond a peer's capacity are then DROPPED (zero
    embedding, zero gradient) — the MoE expert-capacity contract. Tests pin
    exactness at the default and the zero-fill behavior when starved.

    ``comm_compress``: None | "bf16" | "int8" — lossy wire format for the
    row all_to_all (ids stay exact int32); see _make_row_all_to_all.
    """
    if comm_compress not in COMM_COMPRESS_MODES:
        raise ValueError(f"comm_compress must be one of {COMM_COMPRESS_MODES}")

    n_model = mesh.shape[MODEL_AXIS]

    def local_lookup(table_shard, ids_local):
        # table_shard: [V/m, K]; ids_local: [B/(d*m), F] of GLOBAL row ids
        b_loc, f = ids_local.shape
        flat_ids = ids_local.reshape(-1).astype(jnp.int32)
        emb = _dedup_exchange(
            table_shard, flat_ids, n_model, peer_capacity, comm_compress,
            scatter_impl,
        )
        return emb.reshape(b_loc, f, -1)

    def lookup(table, ids):
        return shard_map(
            local_lookup,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
            out_specs=P((DATA_AXIS, MODEL_AXIS), None, None),
            # mxu: the backward's pallas_call cannot annotate vma
            check_vma=scatter_impl != "mxu",
        )(table, ids)

    return lookup


def _owner_gather_mxu(table_shard):
    """Owner-side masked gather of the dedup exchange with its transpose
    routed through the MXU scatter machinery: autodiff's backward would
    serial-scatter the [M, C, W] returned-row cotangents into the shard
    (~45 ns/row); this custom VJP dedups the (already per-sender-unique)
    stream across senders and rebuilds the shard gradient with
    ops/scatter_rows. The rest of the dedup pipeline's autodiff (expansion-
    gather transpose, all_to_all transpose) is untouched."""
    from rectpu.ops.scatter_rows import DROP_SENTINEL, scatter_rows_dense
    from rectpu.train.sparse import dedupe_rows

    v_shard, width = table_shard.shape
    dtype = table_shard.dtype

    @jax.custom_vjp
    def g2(tbl, local, ok):
        resp = jnp.take(tbl, jnp.where(ok, local, 0), axis=0)
        return jnp.where(ok[..., None], resp, jnp.zeros_like(resp))

    def fwd2(tbl, local, ok):
        return g2(tbl, local, ok), (local, ok)

    def bwd2(res, g):
        local, ok = res
        ids = jnp.where(ok, local, DROP_SENTINEL).reshape(-1)
        gm = (jnp.where(ok[..., None], g, 0)
              .reshape(-1, width).astype(jnp.float32))
        rows, rg = dedupe_rows(ids, gm, DROP_SENTINEL)
        dtable = scatter_rows_dense(
            rows, rg, v_shard, out_dtype=jnp.float32,
            interpret=not _on_tpu(),
        )
        return dtable.astype(dtype), None, None

    g2.defvjp(fwd2, bwd2)
    return lambda local, ok: g2(table_shard, local, ok)


def _dedup_exchange(table_shard, flat_ids, n_model, peer_capacity,
                    comm_compress=None, scatter_impl="xla"):
    """Shared dedup all_to_all core: [n] GLOBAL ids -> [n, W] rows, in the
    caller's ordering (see make_ep_lookup_dedup for the algorithm and the
    capacity contract; comm_compress per _make_row_all_to_all;
    scatter_impl="mxu" routes the owner-side gather's transpose through
    _owner_gather_mxu)."""
    row_all_to_all = _make_row_all_to_all(comm_compress)
    v_shard = table_shard.shape[0]
    n = flat_ids.shape[0]
    m_count = n_model
    cap = peer_capacity if peer_capacity is not None else min(n, v_shard)

    flat = flat_ids
    order = jnp.argsort(flat)
    sorted_ids = flat[order]
    is_first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_ids[1:] != sorted_ids[:-1]]
    )
    uslot = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # sorted pos -> unique slot
    n_unique = uslot[-1] + 1
    unique_ids = jnp.zeros((n,), jnp.int32).at[uslot].set(sorted_ids)
    slot_valid = jnp.arange(n) < n_unique
    inv = jnp.zeros((n,), jnp.int32).at[order].set(uslot)  # orig pos -> slot

    peer = jnp.where(slot_valid, unique_ids // v_shard, m_count)
    onehot_p = peer[:, None] == jnp.arange(m_count)[None, :]  # [n, M]
    pos_in_peer = jnp.sum(
        jnp.where(onehot_p, jnp.cumsum(onehot_p.astype(jnp.int32), axis=0) - 1, 0),
        axis=1,
    )
    valid_send = slot_valid & (peer < m_count) & (pos_in_peer < cap)
    addr = peer * cap + pos_in_peer  # [n], into the [M*C] request buffer
    addr_safe = jnp.where(valid_send, addr, m_count * cap)
    requests = (
        jnp.full((m_count * cap,), -1, jnp.int32)
        .at[addr_safe]
        .set(unique_ids, mode="drop")
    )

    req_recv = jax.lax.all_to_all(
        requests.reshape(m_count, cap), MODEL_AXIS, 0, 0, tiled=False
    ).reshape(m_count, cap)
    m = jax.lax.axis_index(MODEL_AXIS)
    local = req_recv - m * v_shard
    ok = (local >= 0) & (local < v_shard)
    if scatter_impl == "mxu":
        resp = _owner_gather_mxu(table_shard)(local, ok)  # [M, C, K]
    else:
        resp = jnp.take(table_shard, jnp.where(ok, local, 0), axis=0)
        resp = jnp.where(ok[..., None], resp, jnp.zeros_like(resp))
    resp_back = row_all_to_all(resp).reshape(m_count * cap, -1)

    my_addr = addr[inv]  # [n] buffer slot of each original lookup
    valid_lk = valid_send[inv]
    my_addr_safe = jnp.where(valid_lk, my_addr, 0)

    # expansion with a sort-reusing transpose: autodiff of the gather would
    # serial-scatter all n cotangent rows into the [M*C] buffer (~45 ns/row
    # — the dominant backward op for n = B_loc*F lookups). The forward's
    # dedup structure already orders everything: g[order] groups duplicate
    # ids contiguously (segment_sum with the sorted hint), and the per-slot
    # buffer address is STRICTLY INCREASING over valid slots when the
    # capacity is lossless (peer nondecreasing in sorted-id order,
    # pos_in_peer increasing within a peer) — so the remaining scatter is a
    # sorted unique-index write. A tightened capacity interleaves dropped
    # slots and breaks monotonicity; the hint is gated off then.
    sorted_ok = peer_capacity is None
    mc = m_count * cap
    rb_dtype = resp_back.dtype

    @jax.custom_vjp
    def expand(rb, aux):
        ma, vl, _, _, _ = aux
        return jnp.where(
            vl[:, None], jnp.take(rb, ma, axis=0), 0.0
        )

    def expand_fwd(rb, aux):
        return expand(rb, aux), aux

    def expand_bwd(aux, g):
        _, vl, order_, uslot_, addr_s = aux
        d_unique = jax.ops.segment_sum(
            jnp.take(g, order_, axis=0), uslot_, num_segments=g.shape[0],
            indices_are_sorted=True,
        )  # [n, W] per-unique-slot sums, fwd sort structure reused
        d_rb = (
            jnp.zeros((mc, g.shape[1]), rb_dtype)
            .at[addr_s]
            .add(d_unique.astype(rb_dtype), mode="drop",
                 indices_are_sorted=sorted_ok, unique_indices=sorted_ok)
        )
        return d_rb, None

    expand.defvjp(expand_fwd, expand_bwd)
    emb = expand(resp_back, (my_addr_safe, valid_lk, order, uslot, addr_safe))
    return emb


def _mxu_shard_cotangent(ids_full, d_emb_full, d_lin_full, mi, v_shard, k,
                         table_dtype, tile_rows, capacity, interpret):
    """Per-shard flat-lookup table cotangent via the MXU scatter machinery.

    The autodiff backward of the flat EP exchanges builds each shard's
    [V/m, W] cotangent with XLA's serial scatter (~45 ns/row — the exact op
    ops/scatter_rows was built to beat single-chip). This helper is its
    replacement: mask every (field, example) cotangent row to the shard's
    owned range, DEDUP the stream (sort + segment-sum, fp32 — collapses the
    massively-colliding small fields so no table tile overflows the Pallas
    per-tile capacity), and rebuild the dense shard gradient with
    ops/scatter_rows.scatter_rows_dense's sorted one-hot MXU matmuls.

    ``ids_full``: [B_loc, F] GLOBAL ids; ``d_emb_full``: [B_loc, F*K];
    ``d_lin_full``: [B_loc] or None (the packed linear column's cotangent);
    ``mi``: this shard's 'model' index (traced).
    """
    from rectpu.ops.scatter_rows import DROP_SENTINEL, scatter_rows_dense
    from rectpu.train.sparse import dedupe_rows

    b_loc, f_total = ids_full.shape
    has_lin = d_lin_full is not None
    w = k + (1 if has_lin else 0)
    sent = DROP_SENTINEL  # matches no scatter tile
    id_parts, g_parts = [], []
    for f in range(f_total):
        local = ids_full[:, f].astype(jnp.int32) - mi * v_shard
        owned = (local >= 0) & (local < v_shard)
        g_f = jax.lax.dynamic_slice(d_emb_full, (0, f * k), (b_loc, k))
        if has_lin:
            g_f = jnp.concatenate(
                [g_f, d_lin_full[:, None].astype(g_f.dtype)], axis=1
            )
        g_f = jnp.where(owned[:, None], g_f, 0).astype(jnp.float32)
        id_parts.append(jnp.where(owned, local, sent))
        g_parts.append(g_f)
    rows, row_g = dedupe_rows(
        jnp.concatenate(id_parts), jnp.concatenate(g_parts), sent
    )
    dtable = scatter_rows_dense(
        rows, row_g, v_shard,
        tile_rows=tile_rows,  # None defers to the autotuned pin (set_auto_tile)
        capacity=capacity,
        out_dtype=jnp.float32,
        interpret=interpret,
    )
    return dtable.astype(table_dtype)


def make_ep_lookup_dedup_flat(
    mesh: Mesh,
    peer_capacity: int | None = None,
    comm_compress: str | None = None,
    scatter_impl: str = "xla",
):
    """Dedup all_to_all exchange emitting the LANE-PACKED flat layout.

    Same wire traffic as ``make_ep_lookup_dedup`` (the exchange moves
    deduplicated rows either way); the difference is purely local: the ids
    flatten FIELD-major, so each field's expanded rows are contiguous and
    write straight into their [B, F*K] column slots (plus the folded linear
    partial when ``has_lin``) — no [B, F, K+1] tile-padded tensor is ever
    materialized, and the towers consume flat activations directly
    (models/*._apply_flat / the flat DNN input).
    """
    if comm_compress not in COMM_COMPRESS_MODES:
        raise ValueError(f"comm_compress must be one of {COMM_COMPRESS_MODES}")

    n_model = mesh.shape[MODEL_AXIS]

    def make_local(has_lin):
        def local_lookup(table_shard, ids_local):
            b_loc, f_total = ids_local.shape
            k = table_shard.shape[1] - (1 if has_lin else 0)
            # field-major flatten: rows of field f land at [f*B, (f+1)*B)
            flat_ids = ids_local.T.reshape(-1).astype(jnp.int32)
            rows = _dedup_exchange(
                table_shard, flat_ids, n_model, peer_capacity, comm_compress,
                scatter_impl,
            )
            emb_flat = jnp.zeros((b_loc, f_total * k), table_shard.dtype)
            lin = jnp.zeros((b_loc,), jnp.float32)
            for f in range(f_total):
                piece = rows[f * b_loc:(f + 1) * b_loc]  # [B, K(+1)]
                emb_flat = jax.lax.dynamic_update_slice(
                    emb_flat, piece[:, :k].astype(emb_flat.dtype), (0, f * k)
                )
                if has_lin:
                    lin = lin + piece[:, k].astype(jnp.float32)
            return emb_flat, lin

        return local_lookup

    def lookup(table, ids, has_lin=True):
        emb_flat, lin = shard_map(
            make_local(has_lin),
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
            out_specs=(P((DATA_AXIS, MODEL_AXIS), None), P((DATA_AXIS, MODEL_AXIS))),
            # mxu: the backward's pallas_call cannot annotate vma
            check_vma=scatter_impl != "mxu",
        )(table, ids)
        return emb_flat, (lin if has_lin else None)

    return lookup


def make_ep_lookup(mesh: Mesh):
    """Return lookup_fn(table, ids) for a 'model'-row-sharded table and
    'data'-sharded ids; output is 'data'-sharded [B, F, K] activations."""

    def local_lookup(table_shard, ids_local):
        # table_shard: [V/m, K]; ids_local: [B/d, F] of GLOBAL row ids
        m = jax.lax.axis_index(MODEL_AXIS)
        v_shard = table_shard.shape[0]
        local = ids_local.astype(jnp.int32) - m * v_shard
        in_range = (local >= 0) & (local < v_shard)
        safe = jnp.where(in_range, local, 0)
        emb = jnp.take(table_shard, safe, axis=0)  # [B/d, F, K]
        emb = jnp.where(in_range[..., None], emb, jnp.zeros_like(emb))
        # assemble full activations across table shards (ICI collective)
        return jax.lax.psum(emb, MODEL_AXIS)

    def lookup(table, ids):
        return shard_map(
            local_lookup,
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
            out_specs=P(DATA_AXIS, None, None),
        )(table, ids)

    return lookup


def make_ep_lookup_flat(mesh: Mesh, scatter_impl: str = "xla",
                        scatter_tile_rows: int | None = None,
                        scatter_capacity: int | None = None):
    """1D EP lookup emitting the LANE-PACKED flat layout.

    Same exchange as ``make_ep_lookup`` (masked local gather, psum over
    'model'; batch sharded on 'data' only, towers replicated over 'model'),
    but each shard writes its rows straight into the flat [B/d, F*K] layout
    and folds the packed linear column BEFORE the psum — F*K exact lanes
    cross ICI instead of the tile-padded [B/d, F, K+1], matching the flat
    upgrade the 2d/dedup modes already have.

    ``scatter_impl="mxu"`` replaces the autodiff backward's serial per-shard
    scatter with the sorted one-hot MXU rebuild (_mxu_shard_cotangent); the
    1D transpose needs NO extra collective (the cotangent arrives replicated
    over 'model' — psum's reverse).
    """

    def make_local(has_lin, shard_shape):
        def local_lookup(table_shard, ids_local):
            # table_shard: [V/m, K(+1)]; ids_local: [B/d, F] of GLOBAL ids
            m = jax.lax.axis_index(MODEL_AXIS)
            v_shard = table_shard.shape[0]
            k = table_shard.shape[1] - (1 if has_lin else 0)
            b, f_total = ids_local.shape
            local = ids_local.astype(jnp.int32) - m * v_shard
            in_range = (local >= 0) & (local < v_shard)
            safe = jnp.where(in_range, local, 0)

            emb_flat = jnp.zeros((b, f_total * k), table_shard.dtype)
            lin = jnp.zeros((b,), jnp.float32)
            for f in range(f_total):
                piece = jnp.take(table_shard, safe[:, f], axis=0)  # [B/d, K(+1)]
                piece = jnp.where(in_range[:, f, None], piece, jnp.zeros_like(piece))
                emb_flat = jax.lax.dynamic_update_slice(
                    emb_flat, piece[:, :k], (0, f * k)
                )
                if has_lin:
                    lin = lin + piece[:, k].astype(jnp.float32)
            emb_flat = jax.lax.psum(emb_flat, MODEL_AXIS)
            if has_lin:  # no collective for the discarded all-zeros lin
                lin = jax.lax.psum(lin, MODEL_AXIS)
            return emb_flat, lin

        if scatter_impl != "mxu":
            return local_lookup

        # v_shard/width/dtype are closed-over statics (make_local is rebuilt
        # per lookup call); only ids ride as a residual — shipping zero-size
        # table-derived tokens through the VJP confused GSPMD's sharding
        # propagation
        v_shard_s, width_s, dtype_s = shard_shape

        @jax.custom_vjp
        def local_lookup_mxu(table_shard, ids_local):
            return local_lookup(table_shard, ids_local)

        def fwd(table_shard, ids_local):
            return local_lookup(table_shard, ids_local), ids_local

        def bwd(ids_local, cts):
            d_emb, d_lin = cts
            k = width_s - (1 if has_lin else 0)
            # the fwd output is REPLICATED over 'model' (post-psum); shard_map
            # reverse delivers each peer a PARTIAL SHARE of its cotangent
            # (sum over peers = the true cotangent) — reassemble with a psum
            # before consuming it locally
            d_emb = jax.lax.psum(d_emb, MODEL_AXIS)
            if has_lin:
                d_lin = jax.lax.psum(d_lin, MODEL_AXIS)
            mi = jax.lax.axis_index(MODEL_AXIS)
            dtable = _mxu_shard_cotangent(
                ids_local, d_emb, d_lin if has_lin else None, mi, v_shard_s, k,
                dtype_s, scatter_tile_rows, scatter_capacity, not _on_tpu(),
            )
            return dtable, None

        local_lookup_mxu.defvjp(fwd, bwd)
        return local_lookup_mxu

    n_model = mesh.shape[MODEL_AXIS]

    def lookup(table, ids, has_lin=True):
        emb_flat, lin = shard_map(
            make_local(has_lin,
                       (table.shape[0] // n_model, table.shape[1], table.dtype)),
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P(DATA_AXIS, None)),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
            # the MXU backward's pallas_call cannot annotate vma; the
            # equality tests pin what the checker would have
            check_vma=scatter_impl != "mxu",
        )(table, ids)
        return emb_flat, (lin if has_lin else None)

    return lookup


def make_ep_lookup_2d_flat(mesh: Mesh, comm_compress: str | None = None,
                           scatter_impl: str = "xla",
                           scatter_tile_rows: int | None = None,
                           scatter_capacity: int | None = None):
    """2D EP lookup emitting the LANE-PACKED flat layout directly.

    Same exchange as ``make_ep_lookup_2d`` (id all_gather over 'model',
    masked local gather, activation reduce_scatter), but each shard writes
    its rows straight into the flat [B/d, F*K] layout and folds the packed
    linear column into a [B/d] partial sum BEFORE the collective. The
    reduce_scatter then moves F*K = 26*64 = 1664 exact lanes instead of the
    tile-padded [B/d, F, K+1] (26 fields x 128-padded lanes = 3328) — HALF
    the ICI bytes — and the towers get flat activations with no relayout
    (ops/fm.fm_cross_flat + the no-reshape DNN input; see
    models/deep_fm._apply_flat).

    Requires the packed [V, K+1] table (cfg.packed_linear). Returns
    ``(emb_flat [B, F*K], lin [B])``; autodiff reverses the pipeline
    (all_gather of flat cotangents, per-field local scatter-add, psum over
    'data') for free. ``comm_compress="bf16"`` rides the flat reduce_scatter
    in bf16 (exact sum — see _compressed_psum_scatter).

    ``scatter_impl="mxu"`` swaps autodiff's per-shard serial scatter for the
    sorted one-hot MXU rebuild (_mxu_shard_cotangent) behind a custom VJP:
    the cotangent all_gathers back over 'model' (the exact transpose of the
    tiled reduce_scatter, riding bf16 when ``comm_compress`` does) and the
    shard gradient is rebuilt with ops/scatter_rows — the same machinery the
    single-chip flat backward uses (ops/embedding._lookup_flat_bwd_mxu).
    """
    _check_rs_compress(comm_compress)
    n_model = mesh.shape[MODEL_AXIS]

    def make_local(has_lin, shard_shape):
        def local_lookup(table_shard, ids_local):
            # table_shard: [V/m, K(+1)]; ids_local: [B/(d*m), F] of GLOBAL ids
            ids_full = jax.lax.all_gather(
                ids_local.astype(jnp.int32), MODEL_AXIS, axis=0, tiled=True
            )  # [B/d, F]
            m = jax.lax.axis_index(MODEL_AXIS)
            v_shard = table_shard.shape[0]
            k = table_shard.shape[1] - (1 if has_lin else 0)
            b, f_total = ids_full.shape
            local = ids_full - m * v_shard
            in_range = (local >= 0) & (local < v_shard)
            safe = jnp.where(in_range, local, 0)

            emb_flat = jnp.zeros((b, f_total * k), table_shard.dtype)
            lin = jnp.zeros((b,), jnp.float32)
            for f in range(f_total):
                piece = jnp.take(table_shard, safe[:, f], axis=0)  # [B/d, K(+1)]
                piece = jnp.where(in_range[:, f, None], piece, jnp.zeros_like(piece))
                emb_flat = jax.lax.dynamic_update_slice(
                    emb_flat, piece[:, :k], (0, f * k)
                )
                if has_lin:
                    lin = lin + piece[:, k].astype(jnp.float32)
            emb_flat = _compressed_psum_scatter(emb_flat, comm_compress)
            if has_lin:
                # lin is [B] — negligible bytes, keep exact
                lin = jax.lax.psum_scatter(
                    lin, MODEL_AXIS, scatter_dimension=0, tiled=True
                )
            else:  # no collective; just match the scattered [B/(d*m)] shape
                lin = jnp.zeros((b // n_model,), jnp.float32)
            return emb_flat, lin

        if scatter_impl != "mxu":
            return local_lookup

        # statics via closure; only ids ride as a residual (see the 1d twin)
        v_shard_s, width_s, dtype_s = shard_shape

        @jax.custom_vjp
        def local_lookup_mxu(table_shard, ids_local):
            return local_lookup(table_shard, ids_local)

        def fwd(table_shard, ids_local):
            return local_lookup(table_shard, ids_local), ids_local

        def bwd(ids_local, cts):
            d_emb, d_lin = cts
            k = width_s - (1 if has_lin else 0)
            # transpose of the tiled psum_scatter = tiled all_gather (riding
            # bf16 when the forward wire did)
            if comm_compress == "bf16" and d_emb.dtype != jnp.bfloat16:
                d_emb_full = jax.lax.all_gather(
                    d_emb.astype(jnp.bfloat16), MODEL_AXIS, axis=0, tiled=True
                ).astype(d_emb.dtype)
            else:
                d_emb_full = jax.lax.all_gather(
                    d_emb, MODEL_AXIS, axis=0, tiled=True
                )
            ids_full = jax.lax.all_gather(
                ids_local.astype(jnp.int32), MODEL_AXIS, axis=0, tiled=True
            )
            d_lin_full = None
            if has_lin:
                d_lin_full = jax.lax.all_gather(
                    d_lin, MODEL_AXIS, axis=0, tiled=True
                )
            mi = jax.lax.axis_index(MODEL_AXIS)
            dtable = _mxu_shard_cotangent(
                ids_full, d_emb_full, d_lin_full, mi, v_shard_s, k,
                dtype_s, scatter_tile_rows, scatter_capacity, not _on_tpu(),
            )
            return dtable, None

        local_lookup_mxu.defvjp(fwd, bwd)
        return local_lookup_mxu

    def lookup(table, ids, has_lin=True):
        """``has_lin``: the table's last column is the folded linear weight
        (packed DeepFM / fused Wide&Deep); False for plain [V, K] tables
        (DNN), where the returned lin is zeros."""
        emb_flat, lin = shard_map(
            make_local(has_lin,
                       (table.shape[0] // n_model, table.shape[1], table.dtype)),
            mesh=mesh,
            in_specs=(P(MODEL_AXIS, None), P((DATA_AXIS, MODEL_AXIS), None)),
            out_specs=(P((DATA_AXIS, MODEL_AXIS), None), P((DATA_AXIS, MODEL_AXIS))),
            # the MXU backward's pallas_call cannot annotate vma; the
            # equality tests pin what the checker would have
            check_vma=scatter_impl != "mxu",
        )(table, ids)
        return emb_flat, (lin if has_lin else None)

    return lookup
