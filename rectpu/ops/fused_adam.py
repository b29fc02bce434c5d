"""Fused Pallas Adam sweep for the packed embedding table.

The table update is the largest dense op of the train step: the XLA path
costs one kLoop fusion over [V, K+1] (read master f32 + m/v slots + grad,
write all three back) PLUS a separate VMEM->HBM master write-back copy that
XLA's memory-space pass inserts (profiled 0.335 + 0.137 ms at the scaled
config). This kernel runs the identical update as ONE tile sweep writing
every output straight to HBM.

Parity contract: the same arithmetic as rectpu.train.optimizers.adam —
TF's eps placement (outside the bias-corrected sqrt), fp32 math, the param
step reading the DOWNCAST slots, the same murmur hash and seed salts for
stochastic rounding (v: t, bf16 master params: t + 2^30). XLA may contract
multiply-adds into FMAs differently across compilations, so cross-
implementation equality is within 1 ulp elementwise (asserted by
tests/test_fused_adam.py) while the fused path itself is bitwise
deterministic run-to-run.

Layout: all four [V, W] tensors are consumed as their transposed [W, V]
row-major views (== the {0,1} layout XLA stores narrow tables in — see
ops/scatter_rows) so the sweep reads/writes sequential HBM with no 65->128
lane padding. Replaces the TF runtime's dense Adam apply kernel for the
embedding-table variable (ref trainers/model_utils.py:57-66 registry,
Adam default at trainers/deep_fm.py:24-26).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sr_bits(x_f32, idx_u32, seed_u32):
    """Stochastic fp32->bf16 rounding bits, identical integer math to
    optimizers.stochastic_round_bf16."""
    h = idx_u32 * jnp.uint32(2654435761) + seed_u32 * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    xi = jax.lax.bitcast_convert_type(x_f32, jnp.uint32)
    xi = xi + (h & jnp.uint32(0xFFFF))
    return jax.lax.bitcast_convert_type(
        xi & jnp.uint32(0xFFFF0000), jnp.float32
    ).astype(jnp.bfloat16)


def _adam_tile_kernel(sc_ref, t_ref, p_ref, m_ref, v_ref, g_ref, p_out, m_out, v_out,
                      *, w: int, tr: int, m_sr: bool, v_sr: bool, p_sr: bool):
    """One [W, TR] tile: p/m/v/g in, updated p/m/v out (fp32 math)."""
    i = pl.program_id(0)
    lr_t = sc_ref[0]
    beta1 = sc_ref[1]
    omb1 = sc_ref[2]  # f32(1 - beta1) from PYTHON-float arithmetic: computing
    beta2 = sc_ref[3]  # 1 - f32(0.9) in-kernel gives 0.10000002, not f32(0.1),
    omb2 = sc_ref[4]  # and would break bitwise parity with optimizers.adam
    eps = sc_ref[5]
    t_u32 = t_ref[0].astype(jnp.uint32)

    g = g_ref[:].astype(jnp.float32)
    m = beta1 * m_ref[:].astype(jnp.float32) + omb1 * g
    v = beta2 * v_ref[:].astype(jnp.float32) + omb2 * g * g

    # logical flat index in the [V, W] orientation: row = i*TR + lane (dim 1
    # of this [W, TR] tile), col = sublane (dim 0) -> idx = row*W + col
    if m_sr or v_sr or p_sr:
        lane = jax.lax.broadcasted_iota(jnp.uint32, (w, tr), 1)
        col = jax.lax.broadcasted_iota(jnp.uint32, (w, tr), 0)
        idx = (jnp.uint32(i * tr) + lane) * jnp.uint32(w) + col

    # store the slots FIRST, then update p from the STORED (downcast) values
    # — optimizers.adam semantics: the param step reads state["m"]/["v"]
    # after their dtype round-trip, not the full-precision intermediates
    if m_sr:
        # optimizers.adam seeds BOTH m and v SR draws with t
        m_out[:] = _sr_bits(m, idx, t_u32)
    else:
        m_out[:] = m.astype(m_out.dtype)
    if v_sr:
        v_out[:] = _sr_bits(v, idx, t_u32)
    else:
        v_out[:] = v.astype(v_out.dtype)
    m_h = m_out[:].astype(jnp.float32)
    v_h = v_out[:].astype(jnp.float32)
    p = p_ref[:].astype(jnp.float32) - lr_t * m_h / (jnp.sqrt(v_h) + eps)
    if p_sr:
        p_out[:] = _sr_bits(p, idx, t_u32 + jnp.uint32(1 << 30))
    else:
        p_out[:] = p.astype(p_out.dtype)


@functools.partial(
    jax.jit, static_argnames=("lr", "beta1", "beta2", "eps", "m_sr", "v_sr",
                              "tile_rows", "interpret")
)
def fused_adam_table(
    p: jax.Array,
    m: jax.Array,
    v: jax.Array,
    g: jax.Array,
    t: jax.Array,
    *,
    lr: float,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    m_sr: bool = False,
    v_sr: bool = False,
    tile_rows: int = 2048,
    interpret: bool | None = None,
):
    """Adam step for a [V, W] table: returns (p', m', v').

    ``t`` is the POST-increment step counter (optimizers.adam's
    state["t"] + 1). ``m_sr``/``v_sr`` request the stochastic-rounding slot
    downcasts (the BF16_SR contract; both seeded with t, as the tree-map
    path does); a bf16 ``p`` always gets the SR master-param downcast
    (matching optimizers.adam's automatic behavior).
    V must divide by tile_rows — size tables with table_padding=tile_rows.
    """
    if interpret is None:
        from rectpu.ops.embedding import _on_tpu

        interpret = not _on_tpu()
    vr, w = p.shape
    assert vr % tile_rows == 0, (vr, tile_rows)
    assert m.shape == v.shape == g.shape == p.shape
    grid = vr // tile_rows
    tf_ = t.astype(jnp.float32)
    lr_t = lr * jnp.sqrt(1.0 - beta2**tf_) / (1.0 - beta1**tf_)
    scalars = jnp.stack([
        lr_t,
        jnp.float32(beta1),
        jnp.float32(1.0 - beta1),  # Python-float complement (see kernel note)
        jnp.float32(beta2),
        jnp.float32(1.0 - beta2),
        jnp.float32(eps),
    ])
    t_arr = t.astype(jnp.int32).reshape(1)
    p_sr = p.dtype == jnp.bfloat16

    def tspec():
        return pl.BlockSpec((w, tile_rows), lambda i: (0, i))

    kernel = functools.partial(
        _adam_tile_kernel, w=w, tr=tile_rows, m_sr=m_sr, v_sr=v_sr, p_sr=p_sr
    )
    pT, mT, vT, gT = (x.T for x in (p, m, v, g))
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tspec(), tspec(), tspec(), tspec(),
        ],
        out_specs=[tspec(), tspec(), tspec()],
        out_shape=[
            jax.ShapeDtypeStruct((w, vr), p.dtype),
            jax.ShapeDtypeStruct((w, vr), m.dtype),
            jax.ShapeDtypeStruct((w, vr), v.dtype),
        ],
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scalars, t_arr, pT, mT, vT, gT)
    return tuple(o.T for o in outs)
