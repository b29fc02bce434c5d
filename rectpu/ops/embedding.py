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


def _pallas_bwd(v: int, flat_ids: jax.Array, g: jax.Array, tile_r: int, interpret: bool):
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
        out_shape=jax.ShapeDtypeStruct((vp, k), g.dtype),
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
    return _pallas_bwd(v, flat_ids, g, tile_r, interpret), None


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


# --- dispatcher -----------------------------------------------------------

_IMPLS = {"take": lookup_take, "onehot": lookup_onehot, "pallas": lookup_pallas}
_AUTO_DEFAULT = {"tpu": "take", "other": "take"}


def set_auto_impl(name: str, on_tpu: bool = True) -> None:
    """Set the implementation 'auto' resolves to (called by the autotuner)."""
    assert name in _IMPLS, name
    _AUTO_DEFAULT["tpu" if on_tpu else "other"] = name


def embedding_lookup(table: jax.Array, ids: jax.Array, impl: str = "auto") -> jax.Array:
    """Lookup rows of ``table`` [V, K] at ``ids`` [...] -> [..., K]."""
    if impl == "auto":
        impl = _AUTO_DEFAULT["tpu" if _on_tpu() else "other"]
    return _IMPLS[impl](table, ids)
