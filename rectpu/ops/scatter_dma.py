"""Window-RMW DMA scatter: sub-table-pass row updates for huge tables.

THE PROBLEM (RESULTS.md round-4 addendum, `_ablate_scatter_big`): an XLA
`.at[].set` scatter into a [V, W] slab is a full-table pass (~8 ns x
table-BYTE, ~65 GB/s one-way) regardless of how few rows update — 24-47 ms
at V=6M while the real traffic is ~25k rows x ~0.5-1 KB = 13-25 MB. The
round-4 per-row DMA attempt hit three Mosaic walls on jax 0.9.0 (1-row
slices of (8,128)-tiled 2D HBM refs; 1024-element tiling of 1D refs) —
this kernel is the round-5 RMW-window design those walls force:

  * the slab stays 2D [Vp, C] (C a multiple of 128) — its natural
    (8, 128) HBM tiling;
  * the update unit is an 8-ROW-ALIGNED WINDOW [8, C]: the one slice shape
    the tiling accepts (start = w*8, computed in-kernel so alignment is
    visible to the compiler);
  * XLA-side prep groups the sorted unique update rows by window
    (collisions — multiple updates in one window — become slots of the
    same window) and hands the kernel, per window: the window index, the
    8-row-aligned base of the val rows covering it, and an [8]-vector of
    per-slot sources (sorted rows make each window's val rows consecutive,
    so a 16-row val DMA from an 8-aligned base always covers them);
  * the kernel pipelines read-window -> select -> write-window over a ring
    of DMA slots; distinct windows never alias, sentinel windows land in a
    per-slot pad region so their racing writes touch disjoint garbage rows.

Semantics: out[rows[i]] = vals[i] (SET, like `.at[rows].set(vals)` with
unique in-range rows); rows >= V (sentinels) are dropped. fp32 slabs.

Traffic: W windows x (2 KB read + 2 KB write + 4 KB val read at C=128)
~= 0.2 GB at W=25k — table-size INDEPENDENT, vs the XLA scatter's full
[V, C] pass. The contest is DMA issue rate (3 DMAs/window), measured in
`benchmarks/_ablate_scatter_dma.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WROWS = 8  # window = 8 slab rows: the (8,128)-tiling-aligned slice unit
VSPAN = 16  # val rows DMA'd per window (8-aligned base covers any 8 rows)


def _rmw_kernel(scal_ref, vals_ref, slab_ref, out_ref,
                slabwin, valwin, outwin, rd_a, rd_b, wr, *, w_count: int,
                ring: int, c: int):
    """scal_ref (SMEM): [w_count * 10] int32, per window w:
    [10w] = window index (slab row base / 8), [10w+1] = val base / 8,
    [10w+2 .. 10w+9] = per-slot val-row offset within the 16-row val tile
    (>= VSPAN means keep the old slab row)."""

    def win_base(i):
        return scal_ref[10 * i] * WROWS

    def val_base(i):
        return scal_ref[10 * i + 1] * WROWS

    def rd_slab(i, slot):
        return pltpu.make_async_copy(
            slab_ref.at[pl.ds(win_base(i), WROWS), :],
            slabwin.at[slot], rd_a.at[slot])

    def rd_vals(i, slot):
        return pltpu.make_async_copy(
            vals_ref.at[pl.ds(val_base(i), VSPAN), :],
            valwin.at[slot], rd_b.at[slot])

    def wr_win(i, slot):
        return pltpu.make_async_copy(
            outwin.at[slot], out_ref.at[pl.ds(win_base(i), WROWS), :],
            wr.at[slot])

    n_pro = min(ring, w_count)
    for i in range(n_pro):  # static prologue: fill the read pipeline
        rd_slab(i, i % ring).start()
        rd_vals(i, i % ring).start()

    iota16 = jax.lax.broadcasted_iota(jnp.int32, (VSPAN, 1), 0)

    def body(i, carry):
        slot = jax.lax.rem(i, ring)
        rd_slab(i, slot).wait()
        rd_vals(i, slot).wait()

        @pl.when(i >= ring)
        def _():  # outwin[slot] still rides the write from window i-ring
            wr_win(i - ring, slot).wait()

        old = slabwin[slot]  # [8, C]
        vt = valwin[slot]    # [16, C]
        # per-slot select, all static slicing + scalar compares: row s of
        # the window becomes val row off_s if off_s < VSPAN, else stays
        for s in range(WROWS):
            off_s = scal_ref[10 * i + 2 + s]
            mask = (iota16 == off_s).astype(vt.dtype)       # [16, 1]
            sel = jnp.sum(vt * mask, axis=0, keepdims=True)  # [1, C]
            keep = old[s:s + 1, :]
            outwin[slot, s:s + 1, :] = jnp.where(off_s < VSPAN, sel, keep)

        wr_win(i, slot).start()

        @pl.when(i + ring < w_count)
        def _():  # slabwin/valwin[slot] free: prefetch window i+ring
            rd_slab(i + ring, slot).start()
            rd_vals(i + ring, slot).start()

        return carry

    jax.lax.fori_loop(0, w_count, body, 0)

    def drain(i, carry):
        wr_win(i, jax.lax.rem(i, ring)).wait()
        return carry

    jax.lax.fori_loop(max(w_count - ring, 0), w_count, drain, 0)


@functools.partial(jax.jit, static_argnames=("w_count", "ring", "interpret"))
def _rmw_call(scal, vals, slab, *, w_count: int, ring: int, interpret: bool):
    c = slab.shape[1]
    out = pl.pallas_call(
        functools.partial(_rmw_kernel, w_count=w_count, ring=ring, c=c),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[
                pltpu.VMEM((ring, WROWS, c), slab.dtype),
                pltpu.VMEM((ring, VSPAN, c), slab.dtype),
                pltpu.VMEM((ring, WROWS, c), slab.dtype),
                pltpu.SemaphoreType.DMA((ring,)),
                pltpu.SemaphoreType.DMA((ring,)),
                pltpu.SemaphoreType.DMA((ring,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(slab.shape, slab.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(scal, vals, slab)
    return out


def plan_windows(rows, n_rows_valid, w_cap: int, v_rows: int,
                 n_pad_windows: int = 32):
    """XLA-side grouping (inside jit): sorted unique ``rows`` [N] (sentinels
    = v_rows sort last) -> the kernel's per-window scalar table.

    Returns scal [w_cap * 10] int32. Real windows get their slab window
    index and slot sources; unused capacity becomes sentinel windows spread
    over the pad region (w_pad + j mod 8*ring rows) with all slots invalid.

    ``n_rows_valid``: rows[i] for i >= n_rows_valid are sentinels (static
    capacity bound; the dynamic valid count is handled by the row values
    themselves — sentinel rows map to pad windows).
    """
    n = rows.shape[0]
    valid = rows < v_rows
    win = jnp.where(valid, rows // WROWS, jnp.int32(2**30))
    newwin = jnp.concatenate(
        [jnp.ones((1,), bool), win[1:] != win[:-1]]) & valid
    widx = jnp.cumsum(newwin.astype(jnp.int32)) - 1  # window ordinal per row
    widx = jnp.where(valid, widx, w_cap)  # sentinels out of range

    # per-window scalars, scattered by window ordinal (mode=drop for pads)
    pad_win = (v_rows + WROWS - 1) // WROWS  # first pad window index
    slot_iota = jnp.arange(w_cap, dtype=jnp.int32)
    win_index = jnp.full((w_cap,), 0, jnp.int32).at[widx].set(
        win.astype(jnp.int32), mode="drop")
    # sentinel windows spread across distinct pad windows (racing DMA
    # writes land on disjoint rows)
    is_real = jnp.zeros((w_cap,), bool).at[widx].set(valid, mode="drop")
    win_index = jnp.where(is_real, win_index,
                          pad_win + (slot_iota % n_pad_windows))

    # first row ordinal of each window -> val base (8-aligned)
    first_row = jnp.full((w_cap,), 0, jnp.int32).at[widx].set(
        jnp.where(newwin, jnp.arange(n, dtype=jnp.int32), 0), mode="drop")
    # (only the newwin entry of each window writes a nonzero: duplicates in
    # the same window write 0 — fix by max-combining: scatter-max)
    first_row = jnp.zeros((w_cap,), jnp.int32).at[widx].max(
        jnp.where(newwin, jnp.arange(n, dtype=jnp.int32), 0), mode="drop")
    val_base = first_row // WROWS

    # per-slot sources: slot = row % 8; source = row ordinal - val_base*8
    slot = (rows % WROWS).astype(jnp.int32)
    src = jnp.arange(n, dtype=jnp.int32) - jnp.take(
        val_base * WROWS, jnp.clip(widx, 0, w_cap - 1), axis=0)
    slot_tbl = jnp.full((w_cap, WROWS), VSPAN, jnp.int32).at[
        jnp.where(valid, widx, w_cap), slot].set(
        jnp.where(valid, src, VSPAN), mode="drop")

    scal = jnp.concatenate(
        [win_index[:, None], val_base[:, None], slot_tbl], axis=1)
    return scal.reshape(-1)


def scatter_rows_dma(slab, rows, vals, *, v_valid: int | None = None,
                     w_cap: int | None = None, ring: int = 16,
                     interpret: bool | None = None):
    """out = slab.at[rows].set(vals) for SORTED UNIQUE in-range ``rows``
    (sentinel rows >= v_valid dropped), via window-RMW DMAs — table-size-
    independent cost.

    slab: [Vp, C] fp32 — the windows are FULL-WIDTH 8-row slices, so any C
    works (the (8,128) HBM tiling only constrains partial-lane slices).
    Vp % 8 == 0 and Vp - v_valid >= 8: sentinel windows land in the pad
    rows past v_valid (callers using ``table_padding`` already have this).
    rows: [N] int32 ascending, duplicates not allowed among valid rows.
    vals: [N, C] fp32, same order.
    v_valid: first droppable row id (default Vp - 256).
    w_cap: static window capacity (default N).
    """
    if interpret is None:
        from rectpu.ops.embedding import _on_tpu

        interpret = not _on_tpu()
    n = rows.shape[0]
    if v_valid is None:
        v_valid = slab.shape[0] - 256
    pad_rows = slab.shape[0] - v_valid
    assert slab.shape[0] % WROWS == 0
    assert pad_rows >= WROWS, (
        f"need >= {WROWS} pad rows past v_valid={v_valid} for sentinel "
        f"windows, slab has {pad_rows}")
    assert vals.shape == (n, slab.shape[1])
    if w_cap is None:
        w_cap = n
    # the per-window scalar table rides scalar-prefetch SMEM (~1 MB = ~24k
    # windows of 10 int32) — bigger updates chunk into SEQUENTIAL kernel
    # calls. A window split across a chunk boundary is safe: the later
    # chunk READS the window after the earlier chunk's write (each call
    # consumes the previous call's slab), so both chunks' rows land.
    max_w = 24_000
    if w_cap > max_w:
        out = slab
        for s in range(0, n, max_w):
            e = min(s + max_w, n)
            out = scatter_rows_dma(
                out, rows[s:e], vals[s:e], v_valid=v_valid,
                w_cap=e - s, ring=ring, interpret=interpret)
        return out
    # sentinel windows spread over the pad region minus the last window
    # (ceil(v_valid/8) may itself contain the tail of the valid rows)
    n_pad_windows = max(1, min(32, (pad_rows - WROWS) // WROWS))
    # vals padded so any 16-row tile from an 8-aligned base is in bounds
    vals_p = jnp.pad(vals, ((0, VSPAN + WROWS), (0, 0)))
    scal = plan_windows(rows, n, w_cap, v_valid, n_pad_windows)
    return _rmw_call(scal, vals_p, slab, w_count=w_cap, ring=ring,
                     interpret=interpret)
