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

from rectpu.ops import embedding as emb_ops
from rectpu.ops import fm as fm_ops
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


def _time(fn, x0, *rest, iters=(20, 60)):
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

    return chained_slope_s(jax.jit(step), x0, iters)


def autotune(batch: int, num_fields: int, embedding_size: int, vocab_rows: int,
             include_grad: bool = True, field_info=None) -> dict:
    """Benchmark all impls at the working shapes; set the 'auto' defaults.

    ``field_info`` (offsets, sizes) additionally benchmarks the field-aware
    split lookup — the usual winner on TPU (RESULTS.md).
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

    logger.info(
        "autotune: lookup=%s fm=%s (%s)",
        best_lookup, best_fm,
        {k: f"{1e3 * t:.3f}ms" for k, t in sorted(results.items())},
    )
    return {"lookup": best_lookup, "fm": best_fm, "timings_s": results}
