"""Micro-bench: strategies for the big-field dtable scatter (24576 rows -> [310144,65] bf16).

HONEST chaining: the FULL dtable is both input and output of the jitted step
(donated), so XLA cannot dead-code the scatter down to the consumed rows —
the first version of this bench returned only 2 rows and XLA rewrote the
whole scatter into a 2-row reduction (0.027 "ms").
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, W, R = 310144, 65, 24576


def variant_plain(dtable, ids, g):
    return dtable.at[ids].add(g)


def variant_sorted(dtable, ids, g):
    order = jnp.argsort(ids)
    return dtable.at[ids[order]].add(
        jnp.take(g, order, axis=0), indices_are_sorted=True
    )


def variant_unique(dtable, ids, g):
    order = jnp.argsort(ids)
    ids_s = ids[order]
    g_s = jnp.take(g, order, axis=0)
    new_seg = jnp.concatenate([jnp.ones((1,), jnp.int32),
                               (ids_s[1:] != ids_s[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(new_seg) - 1
    summed = jax.ops.segment_sum(g_s.astype(jnp.float32), seg, num_segments=R)
    slot_ids = jnp.full((R,), V, jnp.int32).at[seg].set(ids_s)
    padded = jnp.concatenate([dtable, jnp.zeros((1, W), dtable.dtype)])
    padded = padded.at[slot_ids].add(summed.astype(dtable.dtype),
                                     indices_are_sorted=True, unique_indices=True)
    return padded[:V]


def variant_unique_nosum(dtable, ids, g):
    order = jnp.argsort(ids)
    return dtable.at[ids[order]].add(
        jnp.take(g, order, axis=0), indices_are_sorted=True, unique_indices=True
    )


def variant_zeroinit(dtable, ids, g):
    """Scatter into a FRESH zeros buffer (the train-step pattern), then add
    the carried table so the output depends on it."""
    fresh = jnp.zeros((V, W), dtable.dtype).at[ids].add(g)
    return dtable * jnp.bfloat16(0.5) + fresh


VARIANTS = {
    "plain": variant_plain,
    "sorted": variant_sorted,
    "unique": variant_unique,
    "unique_nosum": variant_unique_nosum,
    "zeroinit": variant_zeroinit,
}


def run(name, steps=60):
    fn = VARIANTS[name]
    fj = jax.jit(fn, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    n_stage = 4
    idss = [jnp.asarray(rng.integers(0, V, R), jnp.int32) for _ in range(n_stage)]
    gs = [jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16) for _ in range(n_stage)]
    dtable = jnp.zeros((V, W), jnp.bfloat16)
    t0 = time.time()
    dtable = fj(dtable, idss[0], gs[0])
    jax.block_until_ready(dtable)
    print(f"{name}: compile {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    for i in range(steps):
        dtable = fj(dtable, idss[i % n_stage], gs[i % n_stage])
    jax.block_until_ready(dtable)
    ms = 1e3 * (time.time() - t0) / steps
    print(f"{name:14s} {ms:.3f} ms")


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run(n)
