"""Factorization-Machine second-order interaction op.

The reference computes the FM cross term with composed TF ops
(/root/reference/trainers/deep_fm.py:79-90):
    mf_logit = 0.5 * sum_k((sum_f v)^2 - sum_f v^2)        # [B, 1]
using the O(B*F*K) sum-square-minus-square-sum identity.

Implementations:
  - "xla":    the identity in jnp — XLA fuses the elementwise+reduce chain.
  - "pallas": a fused kernel (fwd + bwd via custom_vjp) tiled over the batch.
              The backward uses the closed form
                  dv[b,f,k] = g[b] * (S[b,k] - v[b,f,k]),  S = sum_f v
              so no residual beyond v itself is needed.

Both return [B] logits from a [B, F, K] embedding tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rectpu.ops.embedding import _on_tpu, _round_up


def fm_cross_xla(v: jax.Array) -> jax.Array:
    """0.5 * sum_k((sum_f v)^2 - sum_f v^2), v: [B, F, K] -> [B]."""
    s = jnp.sum(v, axis=1)
    sum_square = jnp.square(s)
    square_sum = jnp.sum(jnp.square(v), axis=1)
    return 0.5 * jnp.sum(sum_square - square_sum, axis=-1)


def _field_sum_matrix(f: int, k: int, dtype) -> jax.Array:
    """[F*K, K] stacked identities: (v.reshape(B, F*K) @ A)[b, k] = sum_f v[b,f,k]."""
    return jnp.tile(jnp.eye(k, dtype=dtype), (f, 1))


@jax.custom_vjp
def fm_cross_matmul(v: jax.Array) -> jax.Array:
    """FM identity with the field reduction as an MXU matmul.

    XLA's reduction over the MIDDLE axis of [B, F, K] relayouts badly on TPU
    (lane dim K gets padded, sublane strides fight the reducer). Flattening to
    [B, F*K] keeps the natural lane-major layout, and sum_f becomes a matmul
    against a [F*K, K] stack of identity matrices — tiny MXU work, two clean
    passes over v. Backward uses the closed form dv = g * (S - v), with S
    re-broadcast by the transpose matmul.
    """
    b, f, k = v.shape
    v2 = v.reshape(b, f * k)
    s = jnp.dot(v2, _field_sum_matrix(f, k, v.dtype), preferred_element_type=jnp.float32)
    sum_square = jnp.sum(jnp.square(s), axis=-1)
    square_sum = jnp.sum(
        jnp.square(v2.astype(jnp.float32) if v2.dtype != jnp.float32 else v2), axis=-1
    )
    return (0.5 * (sum_square - square_sum)).astype(v.dtype)


def _fm_matmul_fwd(v):
    b, f, k = v.shape
    v2 = v.reshape(b, f * k)
    s = jnp.dot(v2, _field_sum_matrix(f, k, v.dtype), preferred_element_type=jnp.float32)
    sum_square = jnp.sum(jnp.square(s), axis=-1)
    square_sum = jnp.sum(
        jnp.square(v2.astype(jnp.float32) if v2.dtype != jnp.float32 else v2), axis=-1
    )
    out = (0.5 * (sum_square - square_sum)).astype(v.dtype)
    return out, (v, s.astype(v.dtype))


def _fm_matmul_bwd(res, g):
    v, s = res
    b, f, k = v.shape
    # dv[b,f,:] = g[b] * (S[b,:] - v[b,f,:]); broadcast S via the transpose tile
    s_tiled = jnp.dot(
        s, _field_sum_matrix(f, k, s.dtype).T, preferred_element_type=jnp.float32
    ).astype(v.dtype)  # [B, F*K]
    dv2 = g[:, None].astype(v.dtype) * (s_tiled - v.reshape(b, f * k))
    return (dv2.reshape(b, f, k),)


fm_cross_matmul.defvjp(_fm_matmul_fwd, _fm_matmul_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fm_cross_flat(v2: jax.Array, f: int, k: int) -> jax.Array:
    """FM identity on a LANE-PACKED input: v2 [B, F*K] -> [B] fp32.

    Same math as fm_cross_xla on v2.reshape(B, F, K), but the field reduction
    is an MXU matmul against the [F*K, K] stacked-identity matrix and no
    [B, F, K] tensor ever exists: F*K (= 26*64 = 1664 = 13 lane tiles) is
    exactly tiled, where the 3D form pads 26 -> 32 sublanes and K -> 128
    lanes (~2.4x physical traffic). Earlier flat-FM attempts fed a RESHAPE of
    the 3D lookup and lost to the relayout copy (RESULTS.md); this op is for
    producers that emit flat natively (ops/embedding.lookup_flat). Backward is
    the closed form dv = g * (S - v), with S re-broadcast by the transpose
    matmul. Reference math: /root/reference/trainers/deep_fm.py:79-90.
    """
    out, _ = _fm_flat_fwd_impl(v2, f, k)
    return out


def _fm_flat_fwd_impl(v2, f, k):
    a = _field_sum_matrix(f, k, v2.dtype)
    s = jnp.dot(v2, a, preferred_element_type=jnp.float32)  # [B, K] fp32
    sum_square = jnp.sum(jnp.square(s), axis=-1)
    v32 = v2.astype(jnp.float32) if v2.dtype != jnp.float32 else v2
    square_sum = jnp.sum(jnp.square(v32), axis=-1)
    return 0.5 * (sum_square - square_sum), s


def _fm_flat_fwd(v2, f, k):
    out, s = _fm_flat_fwd_impl(v2, f, k)
    return out, (v2, s.astype(v2.dtype))


def _fm_flat_bwd(f, k, res, g):
    v2, s = res
    s_tiled = jnp.dot(
        s, _field_sum_matrix(f, k, s.dtype).T, preferred_element_type=jnp.float32
    ).astype(v2.dtype)  # [B, F*K]
    dv2 = g[:, None].astype(v2.dtype) * (s_tiled - v2)
    return (dv2,)


fm_cross_flat.defvjp(_fm_flat_fwd, _fm_flat_bwd)


# --- Lane-packed Pallas FM (the RESULTS.md round-1 "[TB, F*K] schedule") ----
#
# Forward reads v2 [B, F*K] exactly once from HBM (no [B, F, K] padding:
# F*K = 26*64 = 1664 = 13 exact lane tiles), does the field reduction as an
# in-VMEM MXU matmul against the [F*K, K] stacked-identity matrix, and the
# squares/reductions on the VPU while the next batch tile streams in. S is
# emitted as a second output so the backward doesn't recompute the matmul:
# bwd reads v2 + S, re-broadcasts S with the transpose matmul, writes dv2.
# Traffic: fwd ~= |v2| read; bwd ~= |v2| read + |dv2| write — the bandwidth
# roofline for this op. Reference math: /root/reference/trainers/deep_fm.py:81-90.


def _fm_flat_fwd_kernel(v_ref, a_ref, out_ref, s_ref):
    v = v_ref[:]
    s = jnp.dot(v, a_ref[:], preferred_element_type=jnp.float32)  # [TB, K]
    v32 = v.astype(jnp.float32)
    square_sum = jnp.sum(v32 * v32, axis=-1)
    sum_square = jnp.sum(s * s, axis=-1)
    out_ref[:] = (0.5 * (sum_square - square_sum))[:, None]
    s_ref[:] = s.astype(s_ref.dtype)


def _fm_flat_bwd_kernel(v_ref, s_ref, at_ref, g_ref, dv_ref):
    s_tiled = jnp.dot(
        s_ref[:].astype(jnp.float32), at_ref[:], preferred_element_type=jnp.float32
    )  # [TB, F*K]
    g = g_ref[:].astype(jnp.float32)  # [TB, 1]
    dv_ref[:] = (g * (s_tiled - v_ref[:].astype(jnp.float32))).astype(dv_ref.dtype)


def _flat_tile_b(fk: int, dtype) -> int:
    """Batch tile: keep ~2 double-buffered [TB, FK] blocks under ~6 MB."""
    per_row = fk * jnp.dtype(dtype).itemsize
    tb = 256
    while tb * 2 * per_row * 2 <= 6 * 1024 * 1024 and tb < 2048:
        tb *= 2
    return tb


def _fm_flat_pallas_fwd(v2, f, k, interpret):
    b, fk = v2.shape
    tb = _flat_tile_b(fk, v2.dtype)
    bp = _round_up(max(b, tb), tb)
    v_p = jnp.pad(v2, ((0, bp - b), (0, 0)))
    a = _field_sum_matrix(f, k, v2.dtype)
    out, s = pl.pallas_call(
        _fm_flat_fwd_kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, fk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fk, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, k), v2.dtype),
        ),
        interpret=interpret,
    )(v_p, a)
    return out[:b, 0], s[:b]


def _fm_flat_pallas_bwd(v2, s, g, f, k, interpret):
    b, fk = v2.shape
    tb = _flat_tile_b(fk, v2.dtype)
    bp = _round_up(max(b, tb), tb)
    v_p = jnp.pad(v2, ((0, bp - b), (0, 0)))
    s_p = jnp.pad(s, ((0, bp - b), (0, 0)))
    g_p = jnp.pad(g.reshape(b, 1).astype(jnp.float32), ((0, bp - b), (0, 0)))
    at = _field_sum_matrix(f, k, jnp.float32).T  # [K, F*K]
    dv = pl.pallas_call(
        _fm_flat_bwd_kernel,
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, fk), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, fk), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, fk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, fk), v2.dtype),
        interpret=interpret,
    )(v_p, s_p, at, g_p)
    return dv[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fm_cross_flat_pallas(v2, f: int, k: int, interpret: bool | None = None):
    """Lane-packed Pallas FM: v2 [B, F*K] -> [B] fp32 logits.

    Requires F*K to be a lane-tile multiple (128); callers fall back to
    fm_cross_flat (XLA) otherwise — see fm_cross_flat_dispatch."""
    if interpret is None:
        interpret = not _on_tpu()
    out, _ = _fm_flat_pallas_fwd(v2, f, k, interpret)
    return out


def _fm_flat_pallas_vjp_fwd(v2, f, k, interpret):
    if interpret is None:
        interpret = not _on_tpu()
    out, s = _fm_flat_pallas_fwd(v2, f, k, interpret)
    return out, (v2, s)


def _fm_flat_pallas_vjp_bwd(f, k, interpret, res, g):
    if interpret is None:
        interpret = not _on_tpu()
    v2, s = res
    return (_fm_flat_pallas_bwd(v2, s, g, f, k, interpret),)


fm_cross_flat_pallas.defvjp(_fm_flat_pallas_vjp_fwd, _fm_flat_pallas_vjp_bwd)

_FLAT_AUTO = {"tpu": "xla", "other": "xla"}


def set_flat_auto_impl(name: str, on_tpu: bool = True) -> None:
    assert name in ("xla", "pallas"), name
    _FLAT_AUTO["tpu" if on_tpu else "other"] = name


def fm_cross_flat_dispatch(v2, f: int, k: int, impl: str = "auto"):
    """Flat FM entry point used by the flat-layout models.

    "auto" resolves to the measured winner for this backend; the Pallas
    kernel needs F*K % 128 == 0 and falls back to XLA otherwise."""
    if impl == "auto":
        impl = _FLAT_AUTO["tpu" if _on_tpu() else "other"]
    if impl == "pallas" and v2.shape[1] % 128 == 0:
        return fm_cross_flat_pallas(v2, f, k)
    return fm_cross_flat(v2, f, k)


def _fm_fwd_kernel(v_ref, out_ref):
    v = v_ref[:].astype(jnp.float32)
    s = jnp.sum(v, axis=1)  # [TB, K]
    sum_square = jnp.square(s)
    square_sum = jnp.sum(jnp.square(v), axis=1)
    out_ref[:] = (0.5 * jnp.sum(sum_square - square_sum, axis=-1, keepdims=True)).astype(
        out_ref.dtype
    )


def _fm_bwd_kernel(v_ref, g_ref, dv_ref):
    v = v_ref[:].astype(jnp.float32)
    s = jnp.sum(v, axis=1, keepdims=True)  # [TB, 1, K]
    g = g_ref[:].astype(jnp.float32)  # [TB, 1]
    dv_ref[:] = (g[:, :, None] * (s - v)).astype(dv_ref.dtype)


def _fm_pallas_fwd(v: jax.Array, tile_b: int, interpret: bool) -> jax.Array:
    b, f, k = v.shape
    bp = _round_up(max(b, tile_b), tile_b)
    v_p = jnp.pad(v, ((0, bp - b), (0, 0), (0, 0)))
    out = pl.pallas_call(
        _fm_fwd_kernel,
        grid=(bp // tile_b,),
        in_specs=[pl.BlockSpec((tile_b, f, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 1), v.dtype),
        interpret=interpret,
    )(v_p)
    return out[:b, 0]


def _fm_pallas_bwd(v: jax.Array, g: jax.Array, tile_b: int, interpret: bool) -> jax.Array:
    b, f, k = v.shape
    bp = _round_up(max(b, tile_b), tile_b)
    v_p = jnp.pad(v, ((0, bp - b), (0, 0), (0, 0)))
    g_p = jnp.pad(g.reshape(b, 1), ((0, bp - b), (0, 0)))
    dv = pl.pallas_call(
        _fm_bwd_kernel,
        grid=(bp // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, f, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, f, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, f, k), v.dtype),
        interpret=interpret,
    )(v_p, g_p)
    return dv[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _fm_pallas(v, tile_b, interpret):
    return _fm_pallas_fwd(v, tile_b, interpret)


def _fm_pallas_vjp_fwd(v, tile_b, interpret):
    return _fm_pallas_fwd(v, tile_b, interpret), v


def _fm_pallas_vjp_bwd(tile_b, interpret, v, g):
    return (_fm_pallas_bwd(v, g, tile_b, interpret),)


_fm_pallas.defvjp(_fm_pallas_vjp_fwd, _fm_pallas_vjp_bwd)


def _auto_tile_b(f: int, k: int) -> int:
    """Largest power-of-two batch tile whose working set fits VMEM.

    Mosaic pads the K (lane) dim to 128 and stages ~4 copies of the block
    (input, fp32 upcast, squares, broadcasts); budget ~6 MB of the 16 MB VMEM
    for the [TB, F, K] block to leave room for pipelining.
    """
    k_padded = max(k, 128)
    per_row = f * k_padded * 4 * 4
    tb = 8
    while tb * 2 * per_row <= 6 * 1024 * 1024 and tb < 1024:
        tb *= 2
    return tb


def fm_cross_pallas(v: jax.Array, tile_b: int | None = None, interpret: bool | None = None) -> jax.Array:
    if interpret is None:
        interpret = not _on_tpu()
    if tile_b is None:
        tile_b = _auto_tile_b(v.shape[1], v.shape[2])
    return _fm_pallas(v, tile_b, interpret)


_IMPLS = {"xla": fm_cross_xla, "pallas": fm_cross_pallas, "matmul": fm_cross_matmul}
_AUTO_DEFAULT = {"tpu": "xla", "other": "xla"}


def set_auto_impl(name: str, on_tpu: bool = True) -> None:
    assert name in _IMPLS, name
    _AUTO_DEFAULT["tpu" if on_tpu else "other"] = name


def fm_cross(v: jax.Array, impl: str = "auto") -> jax.Array:
    """FM second-order logit from field embeddings v [B, F, K] -> [B]."""
    if impl == "auto":
        impl = _AUTO_DEFAULT["tpu" if _on_tpu() else "other"]
    return _IMPLS[impl](v)


# --- Third-order FM (HOFM order 3; the PAPERS.md "tensorFM" lead) ----------
#
# The reference stops at second order (/root/reference/trainers/deep_fm.py:81-90).
# tensorFM (arXiv:2602.15229) motivates low-rank CROSS-ORDER interactions; the
# TPU-native form here is the elementary-symmetric-polynomial identity over
# the SHARED embedding lanes (Newton's identities), which keeps the op at
# O(B*F*K) elementwise work + the same stacked-identity MXU field reduction
# the order-2 flat op uses — no [B, F, F, F] tensor, no extra table:
#
#     e3_k = (p1^3 - 3*p1*p2 + 2*p3) / 6,   p_m[b,k] = sum_f v[b,f,k]^m
#     logit3[b] = sum_k e3_k
#
# Backward is closed-form: d e3 / d v_f = e2 - v_f*p1 + v_f^2 (the order-2
# elementary symmetric over the OTHER fields), so the VJP needs only the
# [B, K] power sums re-broadcast by the transpose matmul — same traffic
# shape as the order-2 backward.


def fm_cross3_xla(v: jax.Array) -> jax.Array:
    """Order-3 FM logit from field embeddings v [B, F, K] -> [B] fp32."""
    v32 = v.astype(jnp.float32)
    p1 = jnp.sum(v32, axis=1)
    p2 = jnp.sum(jnp.square(v32), axis=1)
    p3 = jnp.sum(v32 * jnp.square(v32), axis=1)
    e3 = (p1 * jnp.square(p1) - 3.0 * p1 * p2 + 2.0 * p3) / 6.0
    return jnp.sum(e3, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fm_cross3_flat(v2: jax.Array, f: int, k: int) -> jax.Array:
    """Order-3 FM on the LANE-PACKED layout: v2 [B, F*K] -> [B] fp32.

    Power sums p1/p2/p3 are three MXU matmuls of fp32 elementwise powers
    against the [F*K, K] stacked-identity matrix (XLA fuses the power chains
    into the matmul reads, so v2 streams from HBM once); combination and the
    lane reduction are VPU. Backward re-broadcasts e2 and p1 via the
    transpose matmul and is exact (closed form, no recomputation of powers).
    """
    out, _, _ = _fm3_flat_fwd_impl(v2, f, k)
    return out


def _fm3_flat_fwd_impl(v2, f, k):
    a = _field_sum_matrix(f, k, jnp.float32)
    v32 = v2.astype(jnp.float32) if v2.dtype != jnp.float32 else v2
    p1 = jnp.dot(v32, a, preferred_element_type=jnp.float32)            # [B, K]
    p2 = jnp.dot(jnp.square(v32), a, preferred_element_type=jnp.float32)
    p3 = jnp.dot(v32 * jnp.square(v32), a, preferred_element_type=jnp.float32)
    e3 = (p1 * jnp.square(p1) - 3.0 * p1 * p2 + 2.0 * p3) / 6.0
    e2 = 0.5 * (jnp.square(p1) - p2)                                    # [B, K]
    return jnp.sum(e3, axis=-1), p1, e2


def _fm3_flat_fwd(v2, f, k):
    out, p1, e2 = _fm3_flat_fwd_impl(v2, f, k)
    return out, (v2, p1, e2)


def _fm3_flat_bwd(f, k, res, g):
    v2, p1, e2 = res
    at = _field_sum_matrix(f, k, jnp.float32).T
    e2_t = jnp.dot(e2, at, preferred_element_type=jnp.float32)          # [B, F*K]
    p1_t = jnp.dot(p1, at, preferred_element_type=jnp.float32)
    v32 = v2.astype(jnp.float32) if v2.dtype != jnp.float32 else v2
    dv2 = g[:, None] * (e2_t - v32 * p1_t + jnp.square(v32))
    return (dv2.astype(v2.dtype),)


fm_cross3_flat.defvjp(_fm3_flat_fwd, _fm3_flat_bwd)
