"""Fused CIN (Compressed Interaction Network) core op, built for TPU.

The xDeepFM CIN layer (models/xdeep_fm.py; arXiv:1803.05170) computes

    out[b, o, k] = sum_{h, m} w[h, m, o] * x[b, h, k] * y[b, m, k]

MEASURED VERDICT (v5e, chained timing — RESULTS.md round 4): the REAL
cost of a naive CIN implementation is plain autodiff saving the B*H*M*K
expansion (1.7 GB bf16 at the scaled config) as a BACKWARD RESIDUAL and
materializing its cotangent — 16.2 ms/step in the first zoo row. The fix
is this op's custom VJP, which never forms dz: every activation gradient
is the SAME forward contraction with the weight axes renamed. With it,
XLA's forward itself is already near the FLOP bound (0.97 ms fwd,
~0.8 ms fwd+bwd isolated — XLA fuses the expansion into the dot
operand), so the default impl is "xla". The Pallas kernel below (grid
over (k, batch-tile), per-tile Khatri-Rao in VMEM) was built and
measured 4x SLOWER (4.2 ms fwd): Mosaic rejects both the fused
two-contracting-dim dot ("lhs contracting dims must be of size 1") and
the [TB, H, M] -> [TB, H*M] collapse ("unsupported shape cast" — the
"flat" variant even crashes the compiler subprocess), leaving only the
M-loop of 128-padded rank-2 dots, whose 5x MAC inflation loses to XLA's
fused expansion. Kept as the honest record and for shapes where the
tradeoff may flip (large M).

The same kernel computes every backward operand: with
out = cin(x, y, w),

    dx = cin(g, y, w.transpose(2, 1, 0))
    dy = cin(g, x, w.transpose(2, 0, 1))
    dw[h, m, o] = sum_{b, k} x[b,h,k] * y[b,m,k] * g[b,o,k]

(dx/dy are literally the same contraction with the weight axes renamed;
dw is a grid-accumulated kr^T @ g reduction — _cin_dw_kernel.)

Inputs arrive [B, *, K] (K on lanes — per-k slicing would be lane
slicing); the wrapper transposes to [K, B, *] so the grid walks k along
the leading dim. The two transposes cost two ~67 MB relayouts — noise
next to the multi-GB expansion they remove.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from rectpu.ops.embedding import _on_tpu


# --- XLA reference (and CPU fallback) ----------------------------------------


def cin_core_xla(x: jax.Array, y: jax.Array, w: jax.Array) -> jax.Array:
    """out[b,o,k] = sum_{h,m} w[h,m,o] x[b,h,k] y[b,m,k] via the
    materialized expansion (XLA picks the contraction; z is B*H*M*K)."""
    z = x[:, :, None, :] * y[:, None, :, :]  # [B, H, M, K]
    out = jax.lax.dot_general(
        z, w,
        dimension_numbers=(((1, 2), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, K, O]
    return out.transpose(0, 2, 1).astype(x.dtype)


# --- Pallas kernel -----------------------------------------------------------


def _cin_fwd_kernel(x_ref, y_ref, w_ref, out_ref, *, h: int, m: int):
    """One (k, batch-tile) step: kr = a ox c in VMEM -> ONE MXU dot.

    Mosaic's tpu.matmul is rank-2-only (multi-dim contractions rejected:
    "lhs contracting dims must be of size 1"), so the [TB, H, M] expansion
    collapses to [TB, H*M] in-kernel and w arrives pre-flattened
    [H*M, O]."""
    # Mosaic can only insert a minor size-1 dim on 32-bit types: run the
    # expansion in f32, cast the kr block back for the bf16 MXU dot
    a = x_ref[0].astype(jnp.float32)  # [TB, H]
    c = y_ref[0].astype(jnp.float32)  # [TB, M]
    # size-1-axis broadcasts (supported): [TB, H, 1] * [TB, 1, M]
    kr = (a[:, :, None] * c[:, None, :]).reshape(a.shape[0], h * m)
    out_ref[0] = jnp.dot(
        kr.astype(x_ref.dtype), w_ref[...], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _cin_fwd_kernel_mloop(x_ref, y_ref, w_ref, out_ref, *, h: int, m: int):
    """Fallback without the 3D collapse: M static rank-2 dots
    acc += (a * c[:, mm:mm+1]) @ w[mm]. Same math; MACs inflate by the
    contraction padding H->128 but nothing reshapes."""
    a = x_ref[0]  # [TB, H]
    c = y_ref[0]  # [TB, M]
    acc = jnp.zeros((a.shape[0], out_ref.shape[2]), jnp.float32)
    for mm in range(m):
        kr_m = a * c[:, mm:mm + 1]  # [TB, H], size-1 lane broadcast
        acc += jnp.dot(kr_m, w_ref[mm], preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _cin_dw_kernel(x_ref, y_ref, g_ref, dw_ref, *, h: int, m: int):
    """Grid-accumulated dw[hm,o] += kr_tile^T @ g_tile (all steps write the
    same output block; TPU's sequential grid makes the accumulation safe)."""
    step = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    a = x_ref[0].astype(jnp.float32)  # [TB, H] (f32: see _cin_fwd_kernel)
    c = y_ref[0].astype(jnp.float32)  # [TB, M]
    g = g_ref[0]  # [TB, O]
    kr = (a[:, :, None] * c[:, None, :]).reshape(a.shape[0], h * m)
    upd = jax.lax.dot_general(
        kr.astype(x_ref.dtype), g,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H*M, O]

    @pl.when(step == 0)
    def _init():
        dw_ref[...] = upd

    @pl.when(step != 0)
    def _acc():
        dw_ref[...] += upd


def _round_up(v, m):
    return (v + m - 1) // m * m


def _pad_batch(t, b_pad):
    b = t.shape[0]
    if b == b_pad:
        return t
    return jnp.pad(t, ((0, b_pad - b),) + ((0, 0),) * (t.ndim - 1))


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b", "variant"))
def _cin_pallas(x, y, w, *, interpret: bool, tile_b: int = 256,
                variant: str = "flat"):
    b, h, k = x.shape
    m = y.shape[1]
    o = w.shape[2]
    b_pad = _round_up(b, tile_b)
    xt = _pad_batch(x, b_pad).transpose(2, 0, 1)  # [K, Bp, H]
    yt = _pad_batch(y, b_pad).transpose(2, 0, 1)  # [K, Bp, M]
    if variant == "flat":
        kernel = functools.partial(_cin_fwd_kernel, h=h, m=m)
        w_in = w.astype(x.dtype).reshape(h * m, o)
        w_spec = pl.BlockSpec((h * m, o), lambda i, j: (0, 0))
    else:  # mloop
        kernel = functools.partial(_cin_fwd_kernel_mloop, h=h, m=m)
        # [M, H, O]: per-m weight slabs indexed on the leading dim
        w_in = w.astype(x.dtype).transpose(1, 0, 2)
        w_spec = pl.BlockSpec((m, h, o), lambda i, j: (0, 0, 0))
    out_t = pl.pallas_call(
        kernel,
        grid=(k, b_pad // tile_b),
        in_specs=[
            pl.BlockSpec((1, tile_b, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile_b, m), lambda i, j: (i, j, 0)),
            w_spec,
        ],
        out_specs=pl.BlockSpec((1, tile_b, o), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((k, b_pad, o), x.dtype),
        interpret=interpret,
    )(xt, yt, w_in)
    out = out_t.transpose(1, 2, 0)  # [Bp, O, K]
    return out if b == b_pad else out[:b]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def _cin_dw_pallas(x, y, g, *, interpret: bool, tile_b: int = 256):
    b, h, k = x.shape
    m = y.shape[1]
    o = g.shape[1]
    b_pad = _round_up(b, tile_b)
    xt = _pad_batch(x, b_pad).transpose(2, 0, 1)
    yt = _pad_batch(y, b_pad).transpose(2, 0, 1)
    gt = _pad_batch(g, b_pad).transpose(2, 0, 1)
    dw_flat = pl.pallas_call(
        functools.partial(_cin_dw_kernel, h=h, m=m),
        grid=(k, b_pad // tile_b),
        in_specs=[
            pl.BlockSpec((1, tile_b, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile_b, m), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tile_b, o), lambda i, j: (i, j, 0)),
        ],
        out_specs=pl.BlockSpec((h * m, o), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((h * m, o), jnp.float32),
        interpret=interpret,
    )(xt, yt, gt)
    return dw_flat.reshape(h, m, o)


# --- dispatch + custom VJP ---------------------------------------------------

# pinned by ops/autotune (or hand-set); "xla" off-TPU (interpret-mode pallas
# is only for tests). variant: "mloop" is the Mosaic-safe form (M rank-2
# dots; the "flat" single-dot form needs a (sublane, lane)->lane collapse
# Mosaic rejects: "unsupported shape cast" on [TB, H, M] -> [TB, H*M]).
_CIN_AUTO = {"tpu": "xla", "other": "xla"}
_CIN_VARIANT = {"variant": "mloop"}


def set_cin_auto_impl(name: str, on_tpu: bool = True) -> None:
    assert name in ("xla", "pallas"), name
    _CIN_AUTO["tpu" if on_tpu else "other"] = name


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _cin_core(x, y, w, impl):
    if impl == "pallas":
        return _cin_pallas(x, y, w, interpret=not _on_tpu(),
                           variant=_CIN_VARIANT["variant"])
    return cin_core_xla(x, y, w)


def _cin_fwd(x, y, w, impl):
    return _cin_core(x, y, w, impl), (x, y, w)


def _cin_bwd(impl, res, g):
    x, y, w = res
    g = g.astype(x.dtype)
    # the SAME contraction computes both activation grads (weight axes
    # renamed); dw is the grid-accumulated reduction kernel
    dx = _cin_core(g, y, w.transpose(2, 1, 0), impl)
    dy = _cin_core(g, x, w.transpose(2, 0, 1), impl)
    if impl == "pallas":
        dw = _cin_dw_pallas(x, y, g, interpret=not _on_tpu())
    else:
        z = x[:, :, None, :] * y[:, None, :, :]  # [B, H, M, K]
        dw = jax.lax.dot_general(
            z, g,
            dimension_numbers=(((0, 3), (0, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, M, O]
    return dx, dy, dw.astype(w.dtype)


_cin_core.defvjp(_cin_fwd, _cin_bwd)


def cin_core(x: jax.Array, y: jax.Array, w: jax.Array, impl: str = "auto"):
    """out[b,o,k] = sum_{h,m} w[h,m,o] x[b,h,k] y[b,m,k], differentiable.

    impl: "auto" (the pinned default: pallas on TPU, xla elsewhere),
    "pallas" (fused VMEM expansion), "xla" (materialized expansion — the
    oracle and CPU path)."""
    if impl == "auto":
        impl = _CIN_AUTO["tpu" if _on_tpu() else "other"]
    return _cin_core(x, y, w, impl)


# --- K-major layout (round 5) ------------------------------------------------
#
# The legacy path's API contract ([B, *, K] in, [B, O, K] out) forces a
# [B, K, O] -> [B, O, K] relayout per cin_core call — ~8 calls x 67 MB per
# xDeepFM train step once the custom VJP re-expresses every backward leg as
# a forward contraction. K-MAJOR keeps K as the leading non-batch axis
# everywhere ([B, K, H] operands, [B, K, O] results): the dot_general
# emits its natural layout and NOTHING transposes except one [B, M, K] ->
# [B, K, M] relayout of the base embeddings at stack entry.


def cin_core_xla_kmajor(x, y, w):
    """out[b,k,o] = sum_{h,m} w[h,m,o] x[b,k,h] y[b,k,m] — the same CIN
    contraction as cin_core_xla in K-major layout (no output relayout)."""
    z = x[:, :, :, None] * y[:, :, None, :]  # [B, K, H, M] (fused into the dot)
    out = jax.lax.dot_general(
        z, w,
        dimension_numbers=(((2, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, K, O]
    return out.astype(x.dtype)


@jax.custom_vjp
def cin_core_kmajor(x, y, w):
    """Differentiable K-major CIN core: x [B,K,H], y [B,K,M], w [H,M,O] ->
    [B,K,O]. Same custom-VJP structure as cin_core (every activation grad
    is the forward contraction with renamed weight axes; no [B,K,H,M]
    residual ever materializes)."""
    return cin_core_xla_kmajor(x, y, w)


def _cin_kmajor_fwd(x, y, w):
    return cin_core_xla_kmajor(x, y, w), (x, y, w)


def _cin_kmajor_bwd(res, g):
    x, y, w = res
    g = g.astype(x.dtype)
    dx = cin_core_xla_kmajor(g, y, w.transpose(2, 1, 0))
    dy = cin_core_xla_kmajor(g, x, w.transpose(2, 0, 1))
    z = x[:, :, :, None] * y[:, :, None, :]  # [B, K, H, M]
    dw = jax.lax.dot_general(
        z, g,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, M, O]
    return dx, dy, dw.astype(w.dtype)


cin_core_kmajor.defvjp(_cin_kmajor_fwd, _cin_kmajor_bwd)
