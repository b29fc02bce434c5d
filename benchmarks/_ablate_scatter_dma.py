"""Window-RMW DMA scatter on hardware (round 5, VERDICT r4 #2).

Races ops/scatter_dma.scatter_rows_dma against the XLA `.at[].set` scatter
at the big-table shapes where the per-table-byte law makes XLA a full-table
pass (RESULTS.md round-4 addendum: [6M, 130] f32 = 47 ms for ANY update
count). The DMA kernel's cost model is windows x 3 DMAs — table-size
INDEPENDENT — so the interesting axes are V (should be flat) and n_unique
(should be linear).

Run: python -m benchmarks._ablate_scatter_dma [check|sweep|ring]
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.ops.scatter_dma import scatter_rows_dma
from rectpu.utils.timing import chained_slope_s, fetch_sync


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_case(v, c, n_unique, cap, seed=0):
    rng = np.random.default_rng(seed)
    uniq = np.unique(rng.integers(0, v, size=int(n_unique * 1.05)).astype(np.int32))[:n_unique]
    rows = np.full((cap,), v, np.int32)
    rows[:uniq.shape[0]] = uniq
    vals = rng.standard_normal((cap, c)).astype(np.float32)
    slab = np.zeros((v + 256, c), np.float32)
    return slab, rows, vals, uniq


def check_on_hw(v=500_000, c=128, n=3000, cap=4096):
    slab, rows, vals, uniq = make_case(v, c, n, cap, seed=1)
    got = np.asarray(scatter_rows_dma(
        jnp.asarray(slab), jnp.asarray(rows), jnp.asarray(vals)))
    want = slab.copy()
    want[uniq] = vals[:uniq.shape[0]]
    ok = np.array_equal(got[:v], want[:v])
    log(f"hw bitwise vs .at[].set (V={v:,}, n={uniq.shape[0]:,}): {ok}")
    return ok


def time_impl(fn, slab, rows, vals, iters=(8, 24), repeats=3):
    rows_d, vals_d = jax.device_put(jnp.asarray(rows)), jax.device_put(jnp.asarray(vals))

    @partial(jax.jit, donate_argnums=(0,))
    def step(st):
        t, s = st
        t2 = fn(t, rows_d, vals_d + (s * 1e-30))
        return t2, s + t2[0, 0] * 1e-12

    st = (jax.device_put(jnp.asarray(slab)), jnp.float32(0))
    st = step(st)
    fetch_sync(st)
    return chained_slope_s(step, st, iters, repeats=repeats)


def sweep(ring=16):
    cases = [
        (600_000, 128, 24_576, 24_576),
        (6_000_000, 128, 24_576, 24_576),
        (6_000_000, 256, 24_576, 24_576),
        # the production widths: 65 (packed [V, K+1] table) and 130 (mv
        # slab) — NOT lane multiples; round-4's per-table-byte XLA law was
        # measured at these widths, while C=128 XLA scatters per-row (the
        # round-5 finding). These two rows decide the fast-step layout.
        (6_000_000, 65, 24_576, 24_576),
        (6_000_000, 130, 24_576, 24_576),
        (6_000_000, 128, 6_000, 6_144),
        (6_000_000, 128, 98_000, 98_304),
        (12_000_000, 128, 24_576, 24_576),
    ]
    for v, c, n, cap in cases:
        slab, rows, vals, uniq = make_case(v, c, n, cap)
        t_dma = time_impl(
            lambda t, r, u, ring=ring: scatter_rows_dma(t, r, u, ring=ring),
            slab, rows, vals)
        t_xla = time_impl(
            lambda t, r, u: t.at[r].set(u, mode="drop"), slab, rows, vals)
        log(f"V={v:>10,} C={c:>3} n={n:>6,}: dma {1e3*t_dma:8.3f} ms "
            f"({t_dma/max(len(uniq),1)*1e9:6.0f} ns/row) vs xla "
            f"{1e3*t_xla:8.3f} ms -> {t_xla/t_dma:5.1f}x")


def ring_sweep():
    v, c, n, cap = 6_000_000, 128, 24_576, 24_576
    slab, rows, vals, _ = make_case(v, c, n, cap)
    for ring in (4, 8, 16, 32, 64):
        t = time_impl(
            lambda t_, r, u, ring=ring: scatter_rows_dma(t_, r, u, ring=ring),
            slab, rows, vals)
        log(f"ring={ring:>3}: {1e3*t:8.3f} ms ({t/n*1e9:6.0f} ns/row)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("check", "all"):
        if not check_on_hw():
            sys.exit(1)
    if mode in ("ring", "all"):
        ring_sweep()
    if mode in ("sweep", "all"):
        sweep()
