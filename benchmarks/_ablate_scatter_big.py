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
    for name, vv, rr, so, un, op in cases:
        t = time_scatter(vv, rr, so, un, op)
        log(f"{name:12s} V={vv:>9,} rows={rr.shape[0]:>7,} "
            f"{1e3 * t:8.3f} ms  ({t / rr.shape[0] * 1e9:7.1f} ns/row)")


if __name__ == "__main__":
    main()
