"""Why does a 32k-row scatter into a 6M-row table cost ~80 ms?

_profile_sparse found the sparse-step scatters are ~independent of the
update-row count (213k rows 73 ms, 32k rows ~79 ms within adam_full_cap),
which kills the per-row-latency model. Suspects: (a) XLA copies the donated
operand anyway, (b) the drop-mode + duplicate-sentinel scatter takes a slow
lowering, (c) missing unique_indices forces conflict-safe serialization,
(d) cost scales with TABLE bytes, not update bytes.

Matrix (each: one .at[].set into a donated [V, 130] f32 slab):
  r213k_sorted      213k sorted rows + sentinel tail (the round-4 shape)
  r32k_sorted       32k slice (sorted uniques + 8k sentinel dups)
  r32k_unique       32k, unique_indices=True as well
  r24k_nosent       24,576 real unique rows, no sentinels, unique too
  r24k_nosort       same rows shuffled, no flags
  add_r32k          32k .at[].add instead of .set (sorted, no unique flag)
  v600k / v600k_213k  the no-sentinel / full-R variants on a 600k-row table
                    (table-size scaling at fixed update bytes)

Run: python -m benchmarks._ablate_scatter_big
"""

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.utils.timing import chained_slope_s, fetch_sync

W2 = 130


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_scatter(v, rows_np, sorted_, unique, op="set", iters=(10, 30), repeats=3):
    rows = jax.device_put(jnp.asarray(rows_np))
    vals = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (rows_np.shape[0], W2)).astype(np.float32)))

    @partial(jax.jit, donate_argnums=(0,))
    def step(st):
        t, s = st
        val = vals + (s * 1e-30)
        ref = t.at[rows]
        kw = dict(mode="drop", indices_are_sorted=sorted_, unique_indices=unique)
        t = ref.set(val, **kw) if op == "set" else ref.add(val, **kw)
        return t, s + t[0, 0] * 1e-12

    state = (jax.device_put(jnp.zeros((v, W2), jnp.float32)), jnp.float32(0.0))
    x = step(state)
    fetch_sync(x)
    return chained_slope_s(step, x, iters, repeats=repeats)


def _dma_row_scatter(slab, rows, vals, ring=32):
    """Experimental: write vals[i] -> slab[rows[i]] via per-row async DMAs
    (HBM->HBM) issued from a single-step Pallas kernel, ring of ``ring``
    outstanding copies. The XLA scatter costs ~8 ns x V (a full-table
    pass); real traffic here is rows x row_bytes only. rows beyond V must
    point into a pad region (the sentinel convention); concurrent sentinel
    writes race benignly there.

    STATUS 2026-08-21: Mosaic REJECTS every per-row slicing this kernel
    needs on jax 0.9.0 — kept as the executable record of the attempt.
    The three walls, in the order hit:
      1. memory_space=ANY promotes a small operand to VMEM, whose (8,128)
         tiling rejects (1, W) DMA slices ("must be aligned to tiling (8)");
      2. pinning MemorySpace.HBM keeps 2D refs (8,128)-TILED in HBM — same
         rejection;
      3. flattening to 1D with 128-aligned offsets hits the 1D tiling of
         1024 elements ("Slice shape along dimension 0 must be aligned to
         tiling (1024), but is 256").
    So a true per-row DMA scatter needs either a 4 KB row stride (1024 f32
    — 24 GB at V=6M, capacity-prohibitive) or a read-modify-write of
    1024-element-aligned windows with XLA-side grouping of colliding
    updates (~1-2% of sorted uniques share a 4-row window at this
    density) — the concrete round-5 design."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = rows.shape[0]
    vp, c = slab.shape
    assert c % 128 == 0 and vals.shape[1] == c and vp * c < 2**31

    def kernel(rows_smem, vals_hbm, slab_in, slab_out, sems):
        def mk(i, slot):
            return pltpu.make_async_copy(
                vals_hbm.at[pl.ds(i * c, c)],
                slab_out.at[pl.ds(rows_smem[i] * c, c)],
                sems.at[slot],
            )

        def body(i, cc):
            slot = jax.lax.rem(i, ring)

            @pl.when(i >= ring)
            def _():
                mk(i - ring, slot).wait()

            mk(i, slot).start()
            return cc

        jax.lax.fori_loop(0, n, body, 0)

        def drain(i, cc):
            mk(i, jax.lax.rem(i, ring)).wait()
            return cc

        jax.lax.fori_loop(max(n - ring, 0), n, drain, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((ring,))],
        ),
        out_shape=jax.ShapeDtypeStruct((vp * c,), slab.dtype),
        input_output_aliases={2: 0},
    )(rows, vals.reshape(-1), slab.reshape(-1))
    return out.reshape(vp, c)


DMA_C = 256  # 130 cols padded to the next 128 multiple


def time_dma_scatter(v, rows_np, ring=32, iters=(10, 30), repeats=3):
    rows = jax.device_put(jnp.asarray(rows_np))
    vals = jax.device_put(
        jnp.asarray(np.random.default_rng(0).standard_normal(
            (rows_np.shape[0], DMA_C)).astype(np.float32)))

    @partial(jax.jit, donate_argnums=(0,))
    def step(st):
        t, s = st
        t = _dma_row_scatter(t, rows, vals + (s * 1e-30), ring=ring)
        return t, s + t[0, 0] * 1e-12

    state = (jax.device_put(jnp.zeros((v + 4096, DMA_C), jnp.float32)),
             jnp.float32(0.0))
    x = step(state)
    fetch_sync(x)
    return chained_slope_s(step, x, iters, repeats=repeats)


def check_dma_scatter():
    """Correctness on device before timing: DMA result == .at[].set."""
    rng = np.random.default_rng(1)
    v = 100_000
    uniq = np.unique(rng.integers(0, v, size=3000).astype(np.int32))
    rows_np = np.concatenate(
        [uniq, v + (np.arange(4096 - uniq.shape[0]) % 4000)]).astype(np.int32)
    vals = rng.standard_normal((rows_np.shape[0], DMA_C)).astype(np.float32)
    slab = rng.standard_normal((v + 4096, DMA_C)).astype(np.float32)
    got = np.asarray(
        _dma_row_scatter(jnp.asarray(slab), jnp.asarray(rows_np),
                         jnp.asarray(vals)))
    want = slab.copy()
    want[rows_np[:uniq.shape[0]]] = vals[:uniq.shape[0]]
    ok = np.array_equal(got[:v], want[:v])
    log(f"dma scatter bitwise vs .at[].set (real rows): {ok}")
    return ok


def main():
    rng = np.random.default_rng(3)
    v = 6_000_106
    # ~24.6k unique rows spread over the table, as the big config produces
    uniq = np.unique(rng.integers(0, v, size=25_000).astype(np.int32))[:24_576]
    r32 = np.full((32_768,), v, np.int32)
    r32[:uniq.shape[0]] = uniq
    r213 = np.full((212_992,), v, np.int32)
    r213[:uniq.shape[0]] = uniq
    shuf = uniq.copy()
    rng.shuffle(shuf)

    cases = [
        ("r213k_sorted", v, r213, True, False, "set"),
        ("r32k_sorted", v, r32, True, False, "set"),
        ("r32k_unique", v, r32, True, True, "set"),
        ("r24k_nosent", v, uniq, True, True, "set"),
        ("r24k_nosort", v, shuf, False, False, "set"),
        ("add_r32k", v, r32, True, False, "add"),
        ("v600k_24k", 600_016, uniq % 600_000, False, False, "set"),
        ("v600k_213k", 600_016, r213 % 600_016, False, False, "set"),
    ]
    if "dma" in sys.argv[1:]:
        if not check_dma_scatter():
            return
        # spread sentinels across the pad region (racing DMAs to one pad
        # row would serialize an engine)
        r32s = r32.copy()
        r32s[uniq.shape[0]:] = v + (
            np.arange(r32s.shape[0] - uniq.shape[0]) % 4000)
        for ring in (8, 32):
            t = time_dma_scatter(v, r32s, ring)
            log(f"dma_r32k_ring{ring:<3d} V={v:>9,} rows={r32s.shape[0]:>7,} "
                f"{1e3 * t:8.3f} ms  ({t / r32s.shape[0] * 1e9:7.1f} ns/row)")
        return

    for name, vv, rr, so, un, op in cases:
        t = time_scatter(vv, rr, so, un, op)
        log(f"{name:12s} V={vv:>9,} rows={rr.shape[0]:>7,} "
            f"{1e3 * t:8.3f} ms  ({t / rr.shape[0] * 1e9:7.1f} ns/row)")


if __name__ == "__main__":
    main()
