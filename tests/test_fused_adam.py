"""ops/fused_adam vs optimizers.adam: equivalent + deterministic.

The fused kernel replaces the optimizer's tree-map update for the packed
embedding-table leaf. XLA contracts multiply-adds into FMAs differently per
compilation, so cross-implementation equality is 1 ulp, not bitwise; the
kernel itself must be bitwise deterministic (exact-resume contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.ops.fused_adam import fused_adam_table
from rectpu.train.optimizers import BF16_SR, adam


def _bits(x):
    a = np.asarray(x)
    return a.view(np.uint16 if a.dtype.itemsize == 2 else np.uint32)


def _assert_close(got, ref, msg, sr=False):
    """Equivalence tolerances per dtype.

    XLA contracts mul+add into FMA differently per compilation, giving
    ~1-ulp differences (plus absolute-tiny cancellation noise in fp32 m);
    stochastic rounding amplifies a 1-ulp pre-round difference into a full
    bf16 ulp (rel 2^-8), which then propagates into p via m_hat/sqrt(v_hat).
    """
    g = np.asarray(got, np.float64)
    r = np.asarray(ref, np.float64)
    if np.asarray(got).dtype.itemsize == 2 or sr:
        rtol, atol = 2 ** -6.5, 1e-9  # bf16 resolution / SR amplification
    else:
        rtol, atol = 1e-5, 1e-7
    np.testing.assert_allclose(g, r, rtol=rtol, atol=atol, err_msg=msg)


def _ref_step(p, m, v, g, t, lr, m_dtype, v_dtype):
    """One optimizers.adam step on a single-leaf tree, returning the leaf."""
    opt = adam(learning_rate=lr, slot_dtype={"m": m_dtype, "v": v_dtype})
    state = {"m": {"w": m}, "v": {"w": v}, "t": t - 1}
    new_p, new_state = opt.update({"w": g}, state, {"w": p})
    return new_p["w"], new_state["m"]["w"], new_state["v"]["w"]


CASES = [
    # (param dtype, m slot, v slot)
    (jnp.float32, None, None),
    (jnp.float32, jnp.bfloat16, BF16_SR),
    (jnp.float32, jnp.bfloat16, jnp.bfloat16),
    (jnp.float32, BF16_SR, BF16_SR),
    (jnp.bfloat16, jnp.bfloat16, BF16_SR),
]


@pytest.mark.parametrize("p_dtype,m_dtype,v_dtype", CASES)
def test_fused_matches_treemap(p_dtype, m_dtype, v_dtype):
    m_sr, v_sr = m_dtype == BF16_SR, v_dtype == BF16_SR
    rng = np.random.default_rng(0)
    vr, w, tr = 256, 5, 64
    st = lambda dt: jnp.bfloat16 if dt == BF16_SR else (dt or jnp.float32)
    p = jnp.asarray(rng.normal(size=(vr, w)), jnp.float32).astype(p_dtype)
    m = jnp.asarray(rng.normal(size=(vr, w)) * 0.1, jnp.float32).astype(st(m_dtype))
    v = jnp.asarray(rng.random((vr, w)) * 0.01, jnp.float32).astype(st(v_dtype))
    g = jnp.asarray(rng.normal(size=(vr, w)), jnp.float32)

    for t_val in (1, 7, 12345):
        t = jnp.asarray(t_val, jnp.int32)
        ref_p, ref_m, ref_v = _ref_step(p, m, v, g, t, 1e-3, m_dtype, v_dtype)
        got_p, got_m, got_v = fused_adam_table(
            p, m, v, g, t, lr=1e-3, m_sr=m_sr, v_sr=v_sr, tile_rows=tr,
            interpret=True,
        )
        for got, ref, name in ((got_p, ref_p, "p"), (got_m, ref_m, "m"),
                               (got_v, ref_v, "v")):
            assert got.dtype == ref.dtype, name
            _assert_close(got, ref, f"{name} @ t={t_val}", sr=m_sr or v_sr)
        # bitwise determinism of the fused path itself
        again = fused_adam_table(
            p, m, v, g, t, lr=1e-3, m_sr=m_sr, v_sr=v_sr, tile_rows=tr,
            interpret=True,
        )
        for a, b in zip(again, (got_p, got_m, got_v)):
            np.testing.assert_array_equal(_bits(a), _bits(b))


def test_fused_grad_dtype_bf16():
    """bf16 gradients (table_grad_dtype) upcast identically."""
    rng = np.random.default_rng(1)
    vr, w, tr = 128, 3, 32
    p = jnp.asarray(rng.normal(size=(vr, w)), jnp.float32)
    m = jnp.zeros((vr, w), jnp.bfloat16)
    v = jnp.zeros((vr, w), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(vr, w)), jnp.float32).astype(jnp.bfloat16)
    t = jnp.asarray(3, jnp.int32)
    ref = _ref_step(p, m, v, g, t, 1e-3, jnp.bfloat16, BF16_SR)
    got = fused_adam_table(p, m, v, g, t, lr=1e-3, v_sr=True, tile_rows=tr,
                           interpret=True)
    for a, b, name in zip(got, ref, "pmv"):
        _assert_close(a, b, name, sr=True)
