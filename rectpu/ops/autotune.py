"""Kernel auto-selection: measure the interchangeable impls, pin the winners.

Run once per (hardware, shape regime) — typically at trainer start with
``--embedding-impl auto --fm-impl auto`` on TPU — and the dispatchers in
rectpu.ops resolve "auto" to the measured winners. Honest by construction:
the Pallas kernels only get used where they beat XLA on the actual shapes.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

import statistics

from rectpu.ops import embedding as emb_ops
from rectpu.ops import fm as fm_ops
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


def _time(fn, x0, *rest, iters=(20, 60), repeats=3):
    """Dependency-chained two-point timing (rectpu.utils.timing doctrine):
    iteration i+1's input is a function of iteration i's output so work
    cannot overlap/elide; synced by real data fetches (block_until_ready
    can return early through the tunnel); slope of two iteration counts
    cancels the fixed fetch/dispatch cost.

    ``x0`` must be a float array; the chain folds a scalar reduction of the
    output back into it at 1e-12 scale (numerically a no-op)."""
    from rectpu.utils.timing import chained_slope_s

    def step(x):
        out = fn(x, *rest)
        bump = sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(out)
        )
        return x + (bump * 1e-12).astype(x.dtype)

    # MEDIAN of independent slopes: a single two-point slope under sawtooth
    # ambient load can read arbitrarily small (observed 0.03 ms for a 54 MB
    # fwd+bwd, 2026-08-20 — the validator's sanity floor caught it) OR
    # arbitrarily large; min would keep the low-side garbage, so the
    # autotuner votes with the median instead
    jit_step = jax.jit(step)
    return statistics.median(
        chained_slope_s(jit_step, x0, iters) for _ in range(max(repeats, 1))
    )


def _autotune_flat(batch, num_fields, k, vocab_rows, field_info, results):
    """Tune the PRODUCTION flat path (round-3 VERDICT item 3): the flagship
    config runs lookup_flat + scatter_rows + fm_cross_flat_dispatch +
    interact_flat — a different entry point from the 3D lookups the original
    autotuner timed. Times each interchangeable impl at the working shapes
    and pins the winners through the set_*_auto hooks."""
    from rectpu.ops import interaction as int_ops
    from rectpu.ops.scatter_rows import scatter_rows_dense, set_auto_tile

    on_tpu = emb_ops._on_tpu()
    rng = np.random.default_rng(1)
    offsets, sizes = field_info
    table = jnp.asarray(
        rng.normal(size=(vocab_rows, k + 1)).astype(np.float32)
    )
    ids = jnp.asarray(np.stack(
        [offsets[f] + rng.integers(0, sizes[f], size=batch)
         for f in range(num_fields)], axis=1).astype(np.int32))

    # 1. lookup_flat table-grad path, xla serial scatter vs mxu one-hot
    #    rebuild. Plain jax.grad DCEs the custom-VJP forward's unused gather
    #    outputs — deliberately kept here: both impls share the identical
    #    forward, so the A/B isolates exactly the backward being chosen.
    def flat_grad(impl):
        def obj(t):
            emb, lin = emb_ops.lookup_flat(
                t, ids, field_info, k, scatter_impl=impl
            )
            return jnp.sum(emb.astype(jnp.float32)) + jnp.sum(lin)
        return jax.grad(obj)

    for impl in ("xla", "mxu"):
        results[f"lookup_flat/{impl}"] = _time(flat_grad(impl), table)
    best_scatter = min(("xla", "mxu"), key=lambda n: results[f"lookup_flat/{n}"])
    emb_ops.set_flat_scatter_auto_impl(best_scatter, on_tpu=on_tpu)

    # 2. scatter_rows tile geometry sweep at the flat backward's actual
    #    update-stream shape (huge-field rows + the small-field block rows)
    if best_scatter == "mxu":
        dense_threshold = 16384  # TowerConfig.mxu_dense_threshold default
        huge = [f for f in range(num_fields) if sizes[f] > dense_threshold]
        small_ids = [np.arange(offsets[f], offsets[f] + sizes[f], dtype=np.int32)
                     for f in range(num_fields) if sizes[f] <= 4096]
        parts = [offsets[f] + rng.integers(0, sizes[f], size=batch).astype(np.int32)
                 for f in huge] + small_ids
        if parts:
            sc_ids = jnp.asarray(np.concatenate(parts))
            upd = jnp.asarray(
                rng.normal(size=(sc_ids.shape[0], k + 1)).astype(np.float32))
            best_tile, best_t = None, float("inf")
            for tr in (1024, 2048, 4096):
                for cap in (256, 512, 1024):
                    if cap > tr:
                        continue
                    t = _time(
                        lambda u, tr=tr, cap=cap: scatter_rows_dense(
                            sc_ids, u, vocab_rows, tile_rows=tr, capacity=cap),
                        upd,
                    )
                    results[f"scatter_tile/tr{tr}_cap{cap}"] = t
                    if t < best_t:
                        best_tile, best_t = (tr, cap), t
            # second stage: tiles-per-grid-step at the winning (tr, cap) —
            # fatter steps amortize the ~1.3 us/step grid overhead
            best_tps = 1
            # tps=8 is the sweep ceiling BY CONSTRUCTION: tiles_per_step
            # must divide the repack super-segment size 8
            # (ops/scatter_rows.py) — a 16 entry (VERDICT r4 #8) is
            # structurally impossible, not merely untried
            for tps in (4, 8):
                t = _time(
                    lambda u, tps=tps: scatter_rows_dense(
                        sc_ids, u, vocab_rows, tile_rows=best_tile[0],
                        capacity=best_tile[1], tiles_per_step=tps),
                    upd,
                )
                results[f"scatter_tile/tps{tps}"] = t
                if t < best_t:
                    best_tps, best_t = tps, t
            set_auto_tile(*best_tile, tiles_per_step=best_tps)
            results["scatter_tile/pick"] = (*best_tile, best_tps)

    # 3. flat FM: XLA fusion vs the lane-packed Pallas kernel, at the
    #    production dtype (bf16)
    v2 = jnp.asarray(
        rng.normal(size=(batch, num_fields * k)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fm_flat_impls = {
        "xla": lambda x: fm_ops.fm_cross_flat(x, num_fields, k),
        "pallas": lambda x: fm_ops.fm_cross_flat_pallas(x, num_fields, k),
    }

    def fwd_bwd(fn):
        # value_and_grad, NOT grad: these are custom-VJP ops whose residual
        # is just the input — plain grad DCEs the forward kernel entirely
        # and every impl times the same shared backward
        return lambda x: jax.value_and_grad(
            lambda y: jnp.sum(fn(y).astype(jnp.float32)))(x)

    for name, fn in fm_flat_impls.items():
        results[f"fm_flat/{name}"] = _time(fwd_bwd(fn), v2)
    best_fm_flat = min(fm_flat_impls, key=lambda n: results[f"fm_flat/{n}"])
    fm_ops.set_flat_auto_impl(best_fm_flat, on_tpu=on_tpu)

    # 4. DLRM pairwise interaction from the flat activations
    int_impls = {
        "xla": lambda x: int_ops.interact_flat(x, num_fields, k, impl="xla"),
        "pallas": lambda x: int_ops.interact_flat(x, num_fields, k, impl="pallas"),
        "pallas-mxu": lambda x: int_ops.interact_flat(
            x, num_fields, k, impl="pallas-mxu"),
    }
    for name, fn in int_impls.items():
        results[f"interact_flat/{name}"] = _time(fwd_bwd(fn), v2)
    best_int = min(int_impls, key=lambda n: results[f"interact_flat/{n}"])
    int_ops.set_interact_auto_impl(best_int, on_tpu=on_tpu)

    return {"flat_scatter": best_scatter, "fm_flat": best_fm_flat,
            "interact": best_int}


def autotune(batch: int, num_fields: int, embedding_size: int, vocab_rows: int,
             include_grad: bool = True, field_info=None, flat: bool = True) -> dict:
    """Benchmark all impls at the working shapes; set the 'auto' defaults.

    ``field_info`` (offsets, sizes) additionally benchmarks the field-aware
    split lookup — the usual winner on TPU (RESULTS.md) — and (with
    ``flat``) the production flat path: lookup_flat's scatter impl +
    scatter_rows tile geometry + flat FM + DLRM interaction.
    """
    rng = np.random.default_rng(0)
    on_tpu = emb_ops._on_tpu()
    table = jnp.asarray(rng.normal(size=(vocab_rows, embedding_size)).astype(np.float32))
    if field_info is not None:
        offsets, sizes = field_info
        ids_np = np.stack(
            [offsets[f] + rng.integers(0, sizes[f], size=batch) for f in range(num_fields)],
            axis=1,
        ).astype(np.int32)
    else:
        ids_np = rng.integers(0, vocab_rows, size=(batch, num_fields)).astype(np.int32)
    ids = jnp.asarray(ids_np)
    v = jnp.asarray(rng.normal(size=(batch, num_fields, embedding_size)).astype(np.float32))

    results = {}

    # embedding lookup: one-hot variants only make sense for VMEM-sized vocabs
    lookup_candidates = {"take": emb_ops.lookup_take}
    if vocab_rows <= 16384:
        lookup_candidates["onehot"] = emb_ops.lookup_onehot
        lookup_candidates["pallas"] = emb_ops.lookup_pallas
    if field_info is not None:
        lookup_candidates["split"] = (
            lambda t, i: emb_ops.lookup_split(t, i, field_info)
        )
    for name, fn in lookup_candidates.items():
        t = _time(fn, table, ids)
        if include_grad:
            t += _time(jax.grad(lambda tb: jnp.sum(fn(tb, ids).astype(jnp.float32))), table)
        results[f"lookup/{name}"] = t
    best_lookup = min(lookup_candidates, key=lambda n: results[f"lookup/{n}"])
    emb_ops.set_auto_impl(best_lookup, on_tpu=on_tpu)

    for name, fn in {"xla": fm_ops.fm_cross_xla, "pallas": fm_ops.fm_cross_pallas}.items():
        t = _time(fn, v)
        if include_grad:
            t += _time(jax.grad(lambda x: jnp.sum(fn(x))), v)
        results[f"fm/{name}"] = t
    best_fm = min(("xla", "pallas"), key=lambda n: results[f"fm/{n}"])
    fm_ops.set_auto_impl(best_fm, on_tpu=on_tpu)

    picks = {"lookup": best_lookup, "fm": best_fm}
    if flat and field_info is not None:
        picks.update(_autotune_flat(
            batch, num_fields, embedding_size, vocab_rows, field_info, results
        ))

    logger.info(
        "autotune: %s (%s)",
        picks,
        {k: (f"{1e3 * t:.3f}ms" if isinstance(t, float) else t)
         for k, t in sorted(results.items())},
    )
    picks["timings_s"] = results
    return picks
