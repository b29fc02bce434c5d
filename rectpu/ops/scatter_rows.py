"""MXU row-scatter: dense [V, W] = zeros.at[ids].add(updates), built for TPU.

XLA's TPU scatter emitter serializes random row updates at ~45 ns/row
(profiled: 1.11 ms for 24576x65 bf16 rows into a [310144, 65] table — the
single hottest op of the flat DeepFM train step). This op rebuilds the same
dense gradient at near-roofline by turning the scatter into per-tile MXU
matmuls:

  1. sort the updates by destination row (one bitonic key/payload sort),
  2. split the sorted stream into per-TR-row-tile segments (histogram +
     cumsum); small streams stay RESIDENT in VMEM (each tile dynamic-slices
     its window), large ones are repacked into STATIC [C]-row blocks with
     one unrolled dynamic_slice per tile (contiguous copies, ~R rows total —
     NOT a per-row gather; ~1-2 us/tile of op overhead),
  3. each grid step builds a local one-hot [C, TR] of its segment's rows and
     writes out_tile = updates_segment^T @ onehot — collisions sum in fp32
     on the MXU (strictly better than the bf16 serial scatter it replaces).

The resident/repack split exists because the resident form's VMEM scales
with the stream (the [R, 1] ids lane-pad 128x: scoped-VMEM OOM from ~25k
rows), while the repack pays ~0.3 ms of slice-op overhead at 152 tiles —
each is the winner in its regime (measured: batch 8192 resident 1.92 ms vs
repacked 2.29; batch 32768 repacked works, resident cannot compile).
Manual HBM->VMEM DMA windows were tried and hit Mosaic's 128-lane
slice-alignment rule.

Capacity contract: a tile holding more than ``capacity`` updates cannot be
expressed in the static [C, TR] one-hot, so the wrapper computes the max
segment length and falls back to XLA's (sorted) scatter via ``lax.cond`` —
bit-correct always, fast on the overwhelmingly common uniform-hash path.
Replaces the big-field gradient scatter of the reference's sparse
``input_layer``/``linear_model`` backward (/root/reference/trainers/
deep_fm.py:37-73); see ops/embedding._lookup_flat_bwd for the call site.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Out-of-range id that matches no scatter tile (callers mask dropped rows to
# this; int32max//2 stays far above any padded table while `id // tile_rows`
# cannot overflow). Shared with the EP backward helpers in
# parallel/embedding_ep.py.
DROP_SENTINEL = 2**31 // 2 - 1


# Autotuned tile geometry: the hand-measured production pins (tr=2048,
# cap=512 — RESULTS.md: smaller AND larger tiles measured worse) are the
# defaults; ops/autotune sweeps the grid at the working shapes and re-pins.
# tiles_per_step: output tiles emitted per Pallas grid step (the ~1.3 us
# per-step overhead was ~0.2 ms of the 152-tile flat backward). 4 measured
# a consistent ~8-10% win over 1 at the default geometry in two round-4
# sessions (benchmarks/_bench_scatter_tps.py medians: 0.419/0.465 ms vs
# 0.457/0.504); the autotuner re-sweeps per hardware.
_AUTO_TILE = {"tile_rows": 2048, "capacity": 512, "tiles_per_step": 4}


def set_auto_tile(tile_rows: int, capacity: int,
                  tiles_per_step: int | None = None) -> None:
    """Pin the tile geometry `scatter_rows_dense` uses when the caller passes
    tile_rows/capacity/tiles_per_step as None (called by the autotuner)."""
    _AUTO_TILE["tile_rows"] = int(tile_rows)
    _AUTO_TILE["capacity"] = int(capacity)
    if tiles_per_step is not None:
        _AUTO_TILE["tiles_per_step"] = int(tiles_per_step)


def _scatter_tile_kernel(starts_ref, ids_ref, upd_ref, out_ref,
                         *, tr: int, c: int, ss: int, tps: int):
    """out tiles [W, tps*TR] = per-tile segment updates^T @ onehot(rows).

    Super-segment variant: ids/upd blocks hold the padded stream slice of an
    ``ss``-tile GROUP (repacked outside with one dynamic_slice per group —
    g/ss slice ops instead of g); each tile windows its own segment at
    offset starts[t] - starts[group_start]. ``tps`` tiles are emitted per
    grid step (unrolled loop) — the per-step grid overhead (~1.3 us) was
    ~0.2 ms of the flat backward at 152 single-tile steps (roofline round
    3), so fewer, fatter steps buy it back. tps must divide ss or vice
    versa; grid = g/tps. The output is TRANSPOSED ([W, v_pad] row-major ==
    [v_pad, W] with the {0,1} layout XLA picks for narrow tables): the
    caller bitcast-transposes it back. Writing [TR, W] would lane-pad W
    (65 -> 128, ~2x bytes) AND force a relayout copy before the optimizer
    sweep that consumes it."""
    i = pl.program_id(0)
    for u in range(tps):
        t_idx = i * tps + u
        group_first = (t_idx // ss) * ss
        offset = starts_ref[t_idx] - starts_ref[group_first]
        count = starts_ref[t_idx + 1] - starts_ref[t_idx]
        # dynamic sublane slices want 8-aligned starts: widen the window by
        # 8 and shift the validity mask instead
        a_off = (offset // 8) * 8
        sh = offset - a_off
        # when tps > 1 the in-block may span several groups (tps > ss is
        # rejected outside unless ss % tps == 0 ... tps <= ss holds by
        # construction: tps divides ss): window within this tile's group
        grp_in_blk = (t_idx // ss) - (i * tps // ss)
        base = grp_in_blk * (ss * c + 8)
        ids_blk = ids_ref[pl.ds(base + a_off, c + 8), :]  # [C+8, 1] int32
        upd_blk = upd_ref[pl.ds(base + a_off, c + 8), :]  # [C+8, W]
        local = ids_blk - t_idx * tr
        rows = jax.lax.broadcasted_iota(jnp.int32, (c + 8, tr), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (c + 8, tr), 0)
        valid = (j >= sh) & (j < sh + count)
        onehot = jnp.where((rows == local) & valid, 1, 0).astype(upd_blk.dtype)
        out_ref[:, u * tr:(u + 1) * tr] = jax.lax.dot_general(
            upd_blk, onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def _scatter_tile_kernel_resident(starts_ref, ids_ref, upd_ref, out_ref,
                                  *, tr: int, c: int, tps: int):
    """Variant with the WHOLE sorted stream resident in VMEM: each tile
    dynamic-slices its window (8-aligned start, validity-masked). Cheaper
    than the repacked variant (no per-tile slice ops in XLA) but VMEM scales
    with the stream: the [R, 1] ids lane-pad 128x, so this path is gated to
    streams that fit (see scatter_rows_dense). ``tps`` output tiles per
    grid step (see _scatter_tile_kernel)."""
    i = pl.program_id(0)
    for u in range(tps):
        t_idx = i * tps + u
        start = starts_ref[t_idx]
        count = starts_ref[t_idx + 1] - start
        # dynamic sublane slices want 8-aligned starts: widen the window by
        # 8 and shift the validity mask instead
        a_start = (start // 8) * 8
        off = start - a_start
        ids_blk = ids_ref[pl.ds(a_start, c + 8), :]  # [C+8, 1] int32
        upd_blk = upd_ref[pl.ds(a_start, c + 8), :]  # [C+8, W]
        local = ids_blk - t_idx * tr
        rows = jax.lax.broadcasted_iota(jnp.int32, (c + 8, tr), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (c + 8, tr), 0)
        valid = (j >= off) & (j < off + count)
        onehot = jnp.where((rows == local) & valid, 1, 0).astype(upd_blk.dtype)
        out_ref[:, u * tr:(u + 1) * tr] = jax.lax.dot_general(
            upd_blk, onehot,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def scatter_rows_dense(
    ids: jax.Array,
    updates: jax.Array,
    v_rows: int,
    *,
    tile_rows: int | None = None,
    capacity: int | None = None,
    out_dtype=None,
    interpret: bool | None = None,
    stream_placement: str = "auto",
    tiles_per_step: int | None = None,
) -> jax.Array:
    """Return ``zeros([v_rows, W], out_dtype).at[ids].add(updates)``.

    ids [R] int32 in [0, v_rows); updates [R, W]. Rows collide freely.
    ``tile_rows`` should divide v_rows (a padded output is sliced otherwise —
    one extra copy; size embedding tables with table_padding=tile_rows to
    stay on the fast path); None for any tile arg reads the autotuned
    pin (set_auto_tile). fp32 collision accumulation regardless of dtype.
    ``tiles_per_step``: output tiles per grid step (1, 2, 4 or 8 — must
    divide the repack super-segment size 8).
    ``interpret`` None resolves to "not on TPU" — a compiled pallas_call off
    TPU is a hard error, so every dispatch path (incl. the autotuner's tile
    sweep on a CPU fallback) must degrade to interpret mode automatically.
    """
    if interpret is None:
        from rectpu.ops.embedding import _on_tpu

        interpret = not _on_tpu()
    tps = (tiles_per_step if tiles_per_step is not None
           else _AUTO_TILE["tiles_per_step"])
    if tps not in (1, 2, 4, 8):
        raise ValueError(f"tiles_per_step must be 1/2/4/8, got {tps}")
    return _scatter_rows_dense(
        ids, updates, v_rows,
        tile_rows=tile_rows if tile_rows is not None else _AUTO_TILE["tile_rows"],
        capacity=capacity if capacity is not None else _AUTO_TILE["capacity"],
        out_dtype=out_dtype, interpret=interpret,
        stream_placement=stream_placement, tiles_per_step=tps,
    )


@functools.partial(
    jax.jit,
    static_argnames=("v_rows", "tile_rows", "capacity", "out_dtype", "interpret",
                     "stream_placement", "tiles_per_step"),
)
def _scatter_rows_dense(
    ids: jax.Array,
    updates: jax.Array,
    v_rows: int,
    *,
    tile_rows: int,
    capacity: int,
    out_dtype=None,
    interpret: bool = False,
    stream_placement: str = "auto",
    tiles_per_step: int = 1,
) -> jax.Array:
    r, w = updates.shape
    out_dtype = jnp.dtype(out_dtype) if out_dtype is not None else updates.dtype
    tr, c, tps = tile_rows, capacity, tiles_per_step
    # pad the tile grid to a tps multiple: phantom tiles read start == R
    # (zero count) and write zeros into rows sliced off at the end
    v_pad = _round_up(v_rows, tr * tps)
    g = v_pad // tr

    ids_s, order = jax.lax.sort_key_val(ids, jnp.arange(r, dtype=jnp.int32))
    upd_s = jnp.take(updates, order, axis=0)
    # per-tile segment starts: histogram + exclusive cumsum (a vectorized
    # searchsorted — XLA lowers jnp.searchsorted to a 15-iteration while
    # loop costing ~2x the sort itself at this size)
    tile_of = ids_s // tr  # sorted
    counts = jnp.sum(
        tile_of[None, :] == jnp.arange(g, dtype=jnp.int32)[:, None], axis=1
    ).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)]
    )
    max_count = jnp.max(counts)

    # resident path VMEM: ids [R,1] lane-pad to 128 int32 + upd lane-pad W
    # to 128 bf16-ish; gate on the empirical compile boundary (16k-batch
    # streams, ~26 MB nominal, still fit — the reported scoped limit
    # under-counts)
    resident_bytes = (r + c + 8) * (
        128 * 4 + _round_up(w, 128) * upd_s.dtype.itemsize
    )
    if stream_placement == "auto":
        use_resident = resident_bytes <= 26 << 20
    else:  # explicit override, mainly for tests of the non-default regime
        use_resident = stream_placement == "resident"

    # slice windows read [start, start + C + 8) (resident) or a full
    # super-segment [start, start + 8C + 8) (repack): pad so any start <= R
    # is safe for whichever path compiles
    pad_rows = (c + 8) if use_resident else (8 * c + 8)
    sentinel = DROP_SENTINEL  # matches no tile
    ids_p = jnp.pad(ids_s, (0, pad_rows), constant_values=sentinel)
    upd_p = jnp.pad(upd_s, ((0, pad_rows), (0, 0)))

    def pallas_path(args):
        # starts spans the FULL padded grid (g includes the tps-padding
        # phantom tiles; their counts are 0 so they emit zero tiles)
        ids_p, upd_p, starts_g = args
        if use_resident:
            return pl.pallas_call(
                functools.partial(_scatter_tile_kernel_resident, tr=tr, c=c,
                                  tps=tps),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(g // tps,),
                    in_specs=[
                        pl.BlockSpec((ids_p.shape[0], 1), lambda i, s: (0, 0)),
                        pl.BlockSpec(upd_p.shape, lambda i, s: (0, 0)),
                    ],
                    out_specs=pl.BlockSpec((w, tps * tr), lambda i, s: (0, i)),
                ),
                out_shape=jax.ShapeDtypeStruct((w, v_pad), out_dtype),
                interpret=interpret,
            )(starts_g, ids_p.reshape(-1, 1), upd_p)
        # large streams: repack SUPER-SEGMENTS (ss-tile groups) into static
        # [ss*C + 8]-row blocks — one contiguous dynamic_slice per GROUP
        # (g/ss unrolled ops, ~1-2 us each), NOT a per-row gather and not a
        # slice per tile. VMEM per grid step is the group block, independent
        # of the stream length; tiles window their segment inside the block.
        # tps <= ss and tps | ss, so a grid step's tiles stay in one group.
        ss = 8
        ssc = ss * c + 8
        n_groups = -(-g // ss)
        seg_ids = jnp.stack(
            [jax.lax.dynamic_slice(ids_p, (starts_g[j * ss],), (ssc,))
             for j in range(n_groups)]
        ).reshape(n_groups * ssc, 1)
        seg_upd = jnp.concatenate(
            [jax.lax.dynamic_slice(upd_p, (starts_g[j * ss], 0), (ssc, w))
             for j in range(n_groups)]
        )
        # group-relative starts so the kernel's offset math stays in-block
        return pl.pallas_call(
            functools.partial(_scatter_tile_kernel, tr=tr, c=c, ss=ss,
                              tps=tps),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(g // tps,),
                in_specs=[
                    pl.BlockSpec((ssc, 1), lambda i, s: ((i * tps) // ss, 0)),
                    pl.BlockSpec((ssc, w), lambda i, s: ((i * tps) // ss, 0)),
                ],
                out_specs=pl.BlockSpec((w, tps * tr), lambda i, s: (0, i)),
            ),
            out_shape=jax.ShapeDtypeStruct((w, v_pad), out_dtype),
            interpret=interpret,
        )(starts_g, seg_ids, seg_upd)

    def fallback_path(args):
        ids_p, upd_p, _ = args
        # accumulate in out_dtype (the XLA-scatter contract this op replaces)
        # rather than fp32, so the cond branch adds no extra peak memory
        dense = jnp.zeros((v_pad, w), out_dtype)
        dense = dense.at[ids_p[:r]].add(
            upd_p[:r].astype(out_dtype), indices_are_sorted=True
        )
        return dense.T  # real copy, but only on the rare over-capacity branch

    # both branches emit [W, v_pad]; the transpose back to [v_pad, W] is a
    # layout relabel ({1,0} -> {0,1}), not a copy, on the Pallas branch
    out = jax.lax.cond(
        max_count <= c, pallas_path, fallback_path, (ids_p, upd_p, starts)
    ).T
    return out if v_pad == v_rows else out[:v_rows]
