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
