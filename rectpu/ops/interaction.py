"""Pairwise-dot feature interactions (the DLRM interaction block) on TPU.

Reference math: DLRM (Naumov et al., arXiv:1906.00091) §2.1 — the logit
consumes the upper triangle of Z = E E^T per example, E = [F, K] field
embeddings. The reference repo has no DLRM; this op backs rectpu's
beyond-reference DLRM family (rectpu/models/dlrm.py).

Why a Pallas kernel: XLA expresses Z as a batched [B, F, K] x [B, K, F]
matmul — at F=26, K=64 each batch element is a tiny matmul that pads to a
128x128 MXU tile (~4% utilization), and the padded [B, 32sub, 128lane] z
tensor costs 134 MB of HBM traffic at batch 8192. Measured: the whole XLA
interaction chain (relayout + einsum + z + triangle gather, fwd+bwd) is
1.42 ms of the 2.96 ms flat-DLRM step (benchmarks/_ablate_dlrm.py), and a
bf16 z does NOT help — it is structure-bound, not bandwidth-bound.

The kernel never forms [B, F, K] or z: it reads the lane-packed flat
[B, F*K] activation directly (the lookup_flat output layout), computes the
P = F*(F-1)/2 pair dots on the VPU — per field i, ONE widened multiply of
the packed remaining fields against a lane-repeated E_i, then static
per-pair lane reductions — and writes [B, P] f32. Backward mirrors it:
dflat[:, i] = sum_j dz_(i,j) * E_j accumulated in VMEM f32, two
broadcast-multiply-adds per pair, no z and no relayout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pairs(num_fields: int, itself: bool):
    """Upper-triangle (i, j) pairs in the DLRM gather order (row-major)."""
    offset = 0 if itself else 1
    iu, ju = np.triu_indices(num_fields, k=offset)
    return list(zip(iu.tolist(), ju.tolist()))


def interact_xla(flat, num_fields: int, k: int, itself: bool = False):
    """XLA reference: reshape + batched matmul + static triangle gather."""
    b = flat.shape[0]
    vectors = flat.reshape(b, num_fields, k)
    z = jnp.einsum(
        "bik,bjk->bij", vectors, vectors, preferred_element_type=jnp.float32
    )
    iu, ju = np.triu_indices(num_fields, k=0 if itself else 1)
    flat_idx = jnp.asarray(iu * num_fields + ju)
    return z.reshape(b, num_fields * num_fields)[:, flat_idx]


def _fwd_kernel(flat_ref, out_ref, *, num_fields, k, pairs, p_pad):
    x = flat_ref[:].astype(jnp.float32)  # [TB, F*K]
    out_ref[:] = jnp.zeros_like(out_ref)  # pad columns stay defined
    # group pairs by left field i: ONE widened multiply per i (the packed
    # contiguous j-run against a lane-repeated E_i), then static per-pair
    # lane reductions out of the shared product
    by_i: dict[int, list[tuple[int, int]]] = {}
    for p, (i, j) in enumerate(pairs):
        by_i.setdefault(i, []).append((p, j))
    for i, plist in by_i.items():
        e_i = x[:, i * k:(i + 1) * k]
        j_lo = plist[0][1]
        j_hi = plist[-1][1]
        m = j_hi - j_lo + 1  # j's are contiguous by construction
        rest = x[:, j_lo * k:(j_hi + 1) * k]  # [TB, m*K]
        prod = rest * pltpu.repeat(e_i, m, axis=1)
        for p, j in plist:
            off = (j - j_lo) * k
            red = jnp.sum(prod[:, off:off + k], axis=1, keepdims=True)
            out_ref[:, p:p + 1] = red


def _fwd_kernel_mxu(flat_ref, out_ref, *, num_fields, k, pairs, p_pad):
    """Round-3 attempt at the utilization problem (VERDICT weak #6): same
    pair grouping as _fwd_kernel, but the per-pair LANE REDUCTIONS (the
    measured bottleneck: 325 VPU reductions + single-column stores) become
    ONE [TB, m*K] @ [m*K, m] matmul per left field against a block-ones
    selector built from iota — the reduction rides the MXU and each i's m
    outputs store as one contiguous slice. Overcomputes nothing (the
    selector is exact); the MXU work is Σ m_i²K ≈ 17x the useful dot FLOPs,
    which is the price of skipping the [B, F, K] relayout XLA pays — and the
    MXU is otherwise idle in this op."""
    x = flat_ref[:]
    out_ref[:] = jnp.zeros_like(out_ref)
    by_i: dict[int, list[tuple[int, int]]] = {}
    for p, (i, j) in enumerate(pairs):
        by_i.setdefault(i, []).append((p, j))
    for i, plist in by_i.items():
        e_i = x[:, i * k:(i + 1) * k]
        j_lo = plist[0][1]
        j_hi = plist[-1][1]
        m = j_hi - j_lo + 1  # j's are contiguous by construction
        rest = x[:, j_lo * k:(j_hi + 1) * k]  # [TB, m*K]
        prod = rest * pltpu.repeat(e_i, m, axis=1)
        rsel = jax.lax.broadcasted_iota(jnp.int32, (m * k, m), 0) // k
        csel = jax.lax.broadcasted_iota(jnp.int32, (m * k, m), 1)
        sel = (rsel == csel).astype(prod.dtype)  # block-ones [m*K, m]
        red = jax.lax.dot_general(
            prod, sel,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [TB, m] — every pair (i, j_lo..j_hi) at once
        p_lo = plist[0][0]
        out_ref[:, p_lo:p_lo + m] = red


def _interact_bwd_xla(flat, g, num_fields, k, itself):
    """Backward as ONE batched matmul: dE_b = C_b E_b with C the
    symmetrized pair-cotangent matrix.

    Why XLA here while the forward is Pallas: the backward is a genuine
    per-sample [F, F] x [F, K] contraction — every Pallas formulation needs
    a per-scalar coefficient broadcast (element-repeat across a K-lane
    block) that Mosaic has no cheap primitive for (probed 2026-08: the
    broadcast/reshape/jnp.repeat lowerings all fail to compile, and
    per-pair [TB, 1] slices lane-pad to 128 wide and blow the 16 MB scoped
    VMEM). The forward is where the XLA chain loses (z materialization +
    triangle gather); the backward C build is a static lane gather that
    fuses, and the batched matmul is the irreducible core either way."""
    b, d = flat.shape
    f = num_fields
    pairs = _pairs(f, itself)
    # inverse map: flat [F*F] position -> pair column (or the zero slot)
    inv = np.full(f * f, len(pairs), dtype=np.int32)
    for p, (i, j) in enumerate(pairs):
        inv[i * f + j] = p
        inv[j * f + i] = p  # symmetric: C[j, i] = C[i, j]
        if i == j:
            # d(e.e)/de = 2e; the diagonal appears once in the flat map, so
            # double it by pointing both "halves" at the same column and
            # scaling below
            pass
    g = g.astype(flat.dtype)
    gz = jnp.concatenate([g, jnp.zeros((b, 1), g.dtype)], axis=1)
    c = gz[:, jnp.asarray(inv)].reshape(b, f, f)  # static lane gather
    if itself:
        diag = jnp.asarray(np.eye(f, dtype=np.float32), c.dtype)
        c = c + c * diag  # diagonal counts twice (d(e.e)/de = 2e)
    v = flat.reshape(b, f, k)
    dv = jnp.einsum("bij,bjk->bik", c, v,
                    preferred_element_type=jnp.float32)
    return dv.astype(flat.dtype).reshape(b, d)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def interact_pallas(flat, num_fields: int, k: int, itself: bool = False,
                    block_rows: int = 256, interpret: bool = False,
                    variant: str = "vpu"):
    return _interact_fwd_impl(flat, num_fields, k, itself, block_rows,
                              interpret, variant)


def _interact_fwd_impl(flat, num_fields, k, itself, block_rows, interpret,
                       variant="vpu"):
    b, d = flat.shape
    assert d == num_fields * k, (d, num_fields, k)
    pairs = _pairs(num_fields, itself)
    n_pairs = len(pairs)
    p_pad = _round_up(n_pairs, 128)
    b_pad = _round_up(max(b, 1), block_rows)
    if b_pad != b:
        flat = jnp.pad(flat, ((0, b_pad - b), (0, 0)))
    kernel = functools.partial(
        {"vpu": _fwd_kernel, "mxu": _fwd_kernel_mxu}[variant],
        num_fields=num_fields, k=k, pairs=pairs, p_pad=p_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // block_rows,),
        in_specs=[pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block_rows, p_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, p_pad), jnp.float32),
        interpret=interpret,
    )(flat)
    return out[:b, :n_pairs]


def _interact_vjp_fwd(flat, num_fields, k, itself, block_rows, interpret,
                      variant):
    out = _interact_fwd_impl(flat, num_fields, k, itself, block_rows,
                             interpret, variant)
    return out, flat


def _interact_vjp_bwd(num_fields, k, itself, block_rows, interpret, variant,
                      flat, g):
    return (_interact_bwd_xla(flat, g, num_fields, k, itself),)


interact_pallas.defvjp(_interact_vjp_fwd, _interact_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def interact_xla_fast(flat, num_fields: int, k: int, itself: bool = False):
    """XLA forward + the reformulated backward.

    Autodiff through the forward differentiates the triangle gather into a
    [B, F*F] scatter and re-derives dz from it — measured 0.695 ms at
    [8192, 26, 64]. The custom backward builds the symmetric C with a
    static lane GATHER (fuses to a copy) and runs the one irreducible
    batched matmul: 0.307 ms, 2.3x faster (RESULTS.md, DLRM interaction)."""
    return interact_xla(flat, num_fields, k, itself)


def _interact_xla_fast_fwd(flat, num_fields, k, itself):
    return interact_xla(flat, num_fields, k, itself), flat


def _interact_xla_fast_bwd(num_fields, k, itself, flat, g):
    return (_interact_bwd_xla(flat, g, num_fields, k, itself),)


interact_xla_fast.defvjp(_interact_xla_fast_fwd, _interact_xla_fast_bwd)


# "auto" resolution (pinned by ops/autotune). TPU default flipped to
# "pallas-mxu" in round 4: three consecutive A/B sessions (RESULTS.md) put
# the MXU-reduction forward below the XLA batched matmul at [8192, 26, 64]
# (1.00/2.40/1.02 ms vs xla 1.3-4.8 in the same sessions); round-2's lone
# 0.745 ms xla quiet record never reproduced. --autotune still re-pins per
# hardware/shape.
_INTERACT_AUTO = {"tpu": "pallas-mxu", "other": "xla"}


def set_interact_auto_impl(name: str, on_tpu: bool = True) -> None:
    assert name in ("xla", "pallas", "pallas-mxu"), name
    _INTERACT_AUTO["tpu" if on_tpu else "other"] = name


def interact_flat(flat, num_fields: int, k: int, itself: bool = False,
                  impl: str = "auto"):
    """Pairwise-dot interactions straight from the flat [B, F*K] activation.

    impl: "auto" (the autotuner's pin, default "xla"), "xla" (batched-matmul
    forward + the fast custom backward — the measured winner at every tested
    shape), "pallas" (the fused VPU pair-dot forward kernel; measured SLOWER
    than XLA's forward at [8192, 26, 64] — 1.20 vs 0.745 ms, the 325
    per-pair lane reductions and single-column stores dominate — kept for
    larger K/F shapes and as the honest record), "xla-autodiff" (no custom
    VJP; the oracle path).
    """
    if impl == "auto":
        impl = _INTERACT_AUTO["tpu" if _on_tpu() else "other"]
    if impl == "xla":
        return interact_xla_fast(flat, num_fields, k, itself)
    if impl == "pallas":
        return interact_pallas(flat, num_fields, k, itself,
                               256, not _on_tpu())
    if impl == "pallas-mxu":
        # round-3 MXU-reduction variant (see _fwd_kernel_mxu)
        return interact_pallas(flat, num_fields, k, itself,
                               256, not _on_tpu(), "mxu")
    return interact_xla(flat, num_fields, k, itself)
