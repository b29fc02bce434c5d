"""Optimizer-step parity vs closed-form TF-1.x update rules."""

import jax.numpy as jnp
import numpy as np

from rectpu.train.optimizers import adagrad, adam, ftrl, get_optimizer, per_subtree, rmsprop, sgd


def _run(opt, grads_seq, p0=1.0):
    params = {"w": jnp.asarray(p0, jnp.float32)}
    state = opt.init(params)
    out = []
    for g in grads_seq:
        params, state = opt.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        out.append(float(params["w"]))
    return out


def test_sgd():
    assert np.allclose(_run(sgd(0.1), [1.0, 2.0]), [0.9, 0.7])


def test_adam_closed_form():
    lr, b1, b2, eps = 0.001, 0.9, 0.999, 1e-8
    grads = [0.5, -0.3, 1.2]
    m = v = 0.0
    p = 1.0
    expect = []
    for t, g in enumerate(grads, start=1):
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        lr_t = lr * np.sqrt(1 - b2**t) / (1 - b1**t)
        p = p - lr_t * m / (np.sqrt(v) + eps)
        expect.append(p)
    assert np.allclose(_run(adam(lr), grads), expect, rtol=1e-6)


def test_adagrad_tf_init_accumulator():
    # TF initial accumulator = 0.1, update p -= lr*g/sqrt(acc)
    lr = 0.05
    g = 1.0
    acc = 0.1 + g * g
    expect = 1.0 - lr * g / np.sqrt(acc)
    assert np.allclose(_run(adagrad(lr), [g]), [expect], rtol=1e-6)


def test_rmsprop_tf_ones_init():
    lr, decay, eps = 0.01, 0.9, 1e-10
    g = 2.0
    ms = decay * 1.0 + (1 - decay) * g * g  # ms starts at ONES in TF
    expect = 1.0 - lr * g / np.sqrt(ms + eps)
    assert np.allclose(_run(rmsprop(lr), [g]), [expect], rtol=1e-6)


def test_ftrl_closed_form():
    lr = 0.1
    n0 = 0.1
    g = 0.5
    w0 = 1.0
    n1 = n0 + g * g
    sigma = (np.sqrt(n1) - np.sqrt(n0)) / lr
    z1 = 0.0 + g - sigma * w0
    expect = -z1 / (np.sqrt(n1) / lr)
    assert np.allclose(_run(ftrl(lr), [g]), [expect], rtol=1e-6)


def test_ftrl_l1_sparsity():
    opt = ftrl(0.1, l1_regularization_strength=10.0)
    # huge l1 forces the weight to exactly zero
    assert _run(opt, [0.5, 0.2]) == [0.0, 0.0]


def test_registry_names():
    for name in ["Adagrad", "Adam", "Ftrl", "RMSProp", "SGD"]:
        assert get_optimizer(name, 0.01).name == name


def test_per_subtree_routes():
    opt = per_subtree({"linear": sgd(1.0)}, default=sgd(0.1))
    params = {"linear": {"w": jnp.asarray(1.0)}, "deep": {"w": jnp.asarray(1.0)}}
    grads = {"linear": {"w": jnp.asarray(1.0)}, "deep": {"w": jnp.asarray(1.0)}}
    state = opt.init(params)
    params, _ = opt.update(grads, state, params)
    assert float(params["linear"]["w"]) == 0.0  # lr 1.0
    assert np.isclose(float(params["deep"]["w"]), 0.9)  # lr 0.1


def test_adam_bf16_slots_close_to_fp32():
    """slot_dtype=bf16 stores m/v in bf16 but keeps fp32 math: trajectories
    stay within bf16 rounding of the fp32 run, and the state is actually
    half-width."""
    rng = np.random.default_rng(0)
    grads_seq = rng.normal(size=20).astype(np.float32)
    ref = _run(adam(0.01), list(grads_seq))
    opt = adam(0.01, slot_dtype=jnp.bfloat16)
    params = {"w": jnp.asarray(1.0, jnp.float32)}
    state = opt.init(params)
    assert state["m"]["w"].dtype == jnp.bfloat16
    out = []
    for g in grads_seq:
        params, state = opt.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        out.append(float(params["w"]))
    assert state["v"]["w"].dtype == jnp.bfloat16
    # params remain fp32 and track the fp32 trajectory to ~bf16 precision
    assert params["w"].dtype == jnp.float32
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-3)


def test_get_optimizer_slot_dtype_adam_only():
    import pytest

    assert get_optimizer("Adam", 0.01, slot_dtype=jnp.bfloat16).name == "Adam"
    with pytest.raises(ValueError):
        get_optimizer("Ftrl", 0.01, slot_dtype=jnp.bfloat16)


def test_adam_per_slot_dtype_dict():
    """{"m": bf16} keeps v fp32: m stored half-width, trajectory even closer
    to the fp32 run than all-bf16 slots."""
    rng = np.random.default_rng(1)
    grads_seq = rng.normal(size=30).astype(np.float32)
    ref = _run(adam(0.01), list(grads_seq))
    opt = adam(0.01, slot_dtype={"m": jnp.bfloat16})
    params = {"w": jnp.asarray(1.0, jnp.float32)}
    state = opt.init(params)
    assert state["m"]["w"].dtype == jnp.bfloat16
    assert state["v"]["w"].dtype == jnp.float32
    out = []
    for g in grads_seq:
        params, state = opt.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        out.append(float(params["w"]))
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-3)


def test_stochastic_round_bf16_unbiased_and_no_stall():
    from rectpu.train.optimizers import BF16_SR, stochastic_round_bf16

    # unbiased: averaging many independently-seeded roundings recovers x to
    # far better than bf16 precision (1.00195 sits between bf16 ulps)
    x = jnp.full((2048,), 1.00195, jnp.float32)
    acc = np.zeros(2048, np.float64)
    for seed in range(64):
        acc += np.asarray(stochastic_round_bf16(x, jnp.asarray(seed)), np.float64)
    np.testing.assert_allclose(acc.mean() / 64, 1.00195, atol=2e-4)

    # no stall: adding an increment of ~ulp/8 for 4096 steps must accumulate
    # (plain bf16 rounds every single add to nothing)
    inc = 1e-3  # ulp(1.0) in bf16 is 2^-7 = 7.8e-3
    plain = jnp.asarray(1.0, jnp.bfloat16)
    sr = jnp.asarray(1.0, jnp.bfloat16)
    for t in range(4096):
        plain = (plain.astype(jnp.float32) + inc).astype(jnp.bfloat16)
        sr = stochastic_round_bf16(sr.astype(jnp.float32) + inc, jnp.asarray(t))
    assert float(plain) == 1.0  # demonstrates the stall SR fixes
    assert abs(float(sr) - (1.0 + 4096 * inc)) < 0.3

    # adam with SR v slots: converges like fp32 on a tiny problem
    rng = np.random.default_rng(2)
    grads_seq = rng.normal(size=30).astype(np.float32)
    ref = _run(adam(0.01), list(grads_seq))
    opt = adam(0.01, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    params = {"w": jnp.asarray(1.0, jnp.float32)}
    state = opt.init(params)
    assert state["v"]["w"].dtype == jnp.bfloat16
    out = []
    for g in grads_seq:
        params, state = opt.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        out.append(float(params["w"]))
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-3)


def test_adam_bf16_params_sr_tracks_fp32():
    """bf16 master params: fp32 update math + stochastically-rounded downcast.
    The trajectory tracks the fp32 run to bf16 resolution, the average over
    many elements tracks it much closer (unbiased rounding), and the update
    still lands when single increments fall below bf16 ulp/2."""
    rng = np.random.default_rng(2)
    n = 512
    g_seq = [rng.normal(size=n).astype(np.float32) for _ in range(40)]

    ref_opt = adam(0.01)
    ref_p = {"w": jnp.ones((n,), jnp.float32)}
    ref_s = ref_opt.init(ref_p)
    opt = adam(0.01)
    p = {"w": jnp.ones((n,), jnp.bfloat16)}
    s = opt.init(p)
    for g in g_seq:
        ref_p, ref_s = ref_opt.update({"w": jnp.asarray(g)}, ref_s, ref_p)
        p, s = opt.update({"w": jnp.asarray(g)}, s, p)
    assert p["w"].dtype == jnp.bfloat16
    a = np.asarray(p["w"], np.float32)
    b = np.asarray(ref_p["w"])
    # elementwise: each step adds up to ulp/2 (~0.004 here) of unbiased
    # rounding noise; 40 steps random-walk to ~0.015 sd, so allow the tails
    np.testing.assert_allclose(a, b, rtol=0, atol=0.15)
    # unbiasedness: mean-of-512 error has sd ~ 0.015/sqrt(512) ~ 6.6e-4;
    # allow 3 sd. (A truncating downcast would bias ~ -ulp/4 per step,
    # ~0.04 after 40 steps — two orders of magnitude larger.)
    assert abs(float(np.mean(a - b))) < 2.5e-3


def test_adam_bf16_params_deterministic():
    """Same seed/step -> bitwise-identical bf16 params (SR uses the step
    counter, not an RNG), so resumed runs stay reproducible."""
    g = jnp.asarray(np.random.default_rng(3).normal(size=64).astype(np.float32))

    def run():
        opt = adam(0.01)
        p = {"w": jnp.zeros((64,), jnp.bfloat16)}
        s = opt.init(p)
        for _ in range(10):
            p, s = opt.update({"w": g}, s, p)
        return np.asarray(p["w"], np.float32)

    np.testing.assert_array_equal(run(), run())


def test_adagrad_bf16_sr_acc_tracks_fp32():
    """Adagrad with a stochastically-rounded bf16 accumulator tracks the
    fp32 trajectory (unbiased mean) and keeps accumulating where plain bf16
    would stall."""
    from rectpu.train.optimizers import BF16_SR, adagrad

    rng = np.random.default_rng(4)
    n = 512
    g_seq = [rng.normal(size=n).astype(np.float32) for _ in range(30)]

    ref_opt = adagrad(0.05)
    sr_opt = adagrad(0.05, slot_dtype=BF16_SR)
    p_ref = {"w": jnp.ones((n,), jnp.float32)}
    p_sr = {"w": jnp.ones((n,), jnp.float32)}
    s_ref, s_sr = ref_opt.init(p_ref), sr_opt.init(p_sr)
    assert s_sr["acc"]["w"].dtype == jnp.bfloat16
    for g in g_seq:
        p_ref, s_ref = ref_opt.update({"w": jnp.asarray(g)}, s_ref, p_ref)
        p_sr, s_sr = sr_opt.update({"w": jnp.asarray(g)}, s_sr, p_sr)
    a = np.asarray(p_sr["w"], np.float64)
    b = np.asarray(p_ref["w"], np.float64)
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.02)
    assert abs(float(np.mean(a - b))) < 5e-3
    # accumulator still grows (no bf16 stall): after 30 steps of unit-scale
    # grads, acc >> its 0.1 init everywhere
    assert float(np.asarray(s_sr["acc"]["w"], np.float32).min()) > 1.0


def test_get_optimizer_adagrad_slot_dtype():
    import pytest

    from rectpu.train.optimizers import BF16_SR, get_optimizer

    assert get_optimizer("Adagrad", 0.05, slot_dtype=BF16_SR).name == "Adagrad"
    with pytest.raises(ValueError):
        get_optimizer("Ftrl", 0.01, slot_dtype=jnp.bfloat16)


def test_bf16_param_store_bitwise_vs_recast_path():
    """bf16_param_store trains BITWISE identically to the fp32-param path that
    re-casts the table to bf16 in every forward (the gather_dtype contract):
    both forwards read round_bf16(master), and the master update is exact."""
    import jax

    from rectpu.train.optimizers import bf16_param_store

    rng = np.random.default_rng(0)
    table0 = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, size=(6, 16)).astype(np.int32))

    def loss(params, i):
        # astype is the recast on the fp32 path and a no-op on the bf16 store
        rows = jnp.take(params["table"].astype(jnp.bfloat16), ids[i], axis=0)
        h = rows @ params["w"].astype(jnp.bfloat16)
        return (h.astype(jnp.float32) ** 2).mean()

    opt_a = adam(0.01)
    p_a = {"table": table0, "w": w0}
    s_a = opt_a.init(p_a)

    opt_b = bf16_param_store(adam(0.01))
    p_b = {"table": table0, "w": w0}
    s_b = opt_b.init(p_b)
    p_b = opt_b.prepare(p_b)
    assert p_b["table"].dtype == jnp.bfloat16
    assert p_b["w"].dtype == jnp.float32  # only table leaves are stored bf16

    for i in range(6):
        g_a = jax.grad(loss)(p_a, i)
        p_a, s_a = opt_a.update(g_a, s_a, p_a)
        g_b = jax.grad(loss)(p_b, i)
        p_b, s_b = opt_b.update(g_b, s_b, p_b)
        np.testing.assert_array_equal(
            np.asarray(p_a["table"]), np.asarray(s_b["master"]["table"])
        )
        np.testing.assert_array_equal(np.asarray(p_a["w"]), np.asarray(p_b["w"]))
        np.testing.assert_array_equal(
            np.asarray(p_a["table"].astype(jnp.bfloat16), np.float32),
            np.asarray(p_b["table"], np.float32),
        )


def test_bf16_param_store_init_rejects_prepared_params():
    import pytest

    from rectpu.train.optimizers import bf16_param_store

    opt = bf16_param_store(adam(0.01))
    good = {"table": jnp.zeros((4, 2), jnp.float32)}
    prepared = opt.prepare(good)
    with pytest.raises(ValueError, match="fp32 masters"):
        opt.init(prepared)
