"""Self-built optimizers with TF-1.x update semantics.

Replaces the reference's optimizer registry
(/root/reference/trainers/model_utils.py:57-66): {Adagrad, Adam, Ftrl,
RMSProp, SGD}, each reproducing the corresponding ``tf.train.*Optimizer``
update rule and default hyperparameters (including TF's non-standard
initial accumulator values), so training dynamics match the reference's
canned estimators.

Interface (optax-style, but params-in/params-out):
    opt = adam(learning_rate=1e-3)
    state = opt.init(params)
    params, state = opt.update(grads, state, params)
All updates are pure jnp and jit through; state is a pytree, so checkpoints
and shardings treat it like params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Optimizer:
    name: str
    init: Callable
    update: Callable  # (grads, state, params) -> (new_params, new_state)


def sgd(learning_rate: float = 0.001) -> Optimizer:
    """tf.train.GradientDescentOptimizer."""

    def init(params):
        return {}

    def update(grads, state, params):
        new_params = jax.tree.map(lambda p, g: p - learning_rate * g, params, grads)
        return new_params, state

    return Optimizer("SGD", init, update)


def adam(
    learning_rate: float = 0.001,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
) -> Optimizer:
    """tf.train.AdamOptimizer: lr_t = lr*sqrt(1-b2^t)/(1-b1^t);
    p -= lr_t * m / (sqrt(v) + eps). Note eps is added OUTSIDE the
    bias-corrected sqrt (TF semantics, differs from some Adam variants)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params), "t": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        t = state["t"] + 1
        tf_ = t.astype(jnp.float32)
        lr_t = learning_rate * jnp.sqrt(1.0 - beta2**tf_) / (1.0 - beta1**tf_)
        m = jax.tree.map(lambda m_, g: beta1 * m_ + (1 - beta1) * g, state["m"], grads)
        v = jax.tree.map(lambda v_, g: beta2 * v_ + (1 - beta2) * g * g, state["v"], grads)
        new_params = jax.tree.map(
            lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + epsilon), params, m, v
        )
        return new_params, {"m": m, "v": v, "t": t}

    return Optimizer("Adam", init, update)


def adagrad(learning_rate: float = 0.001, initial_accumulator_value: float = 0.1) -> Optimizer:
    """tf.train.AdagradOptimizer: accumulator starts at 0.1 (TF default),
    p -= lr * g / sqrt(acc)."""

    def init(params):
        return {
            "acc": jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params
            )
        }

    def update(grads, state, params):
        acc = jax.tree.map(lambda a, g: a + g * g, state["acc"], grads)
        new_params = jax.tree.map(
            lambda p, g, a: p - learning_rate * g / jnp.sqrt(a), params, grads, acc
        )
        return new_params, {"acc": acc}

    return Optimizer("Adagrad", init, update)


def rmsprop(
    learning_rate: float = 0.001,
    decay: float = 0.9,
    momentum: float = 0.0,
    epsilon: float = 1e-10,
) -> Optimizer:
    """tf.train.RMSPropOptimizer: ms initialized to ONES (TF quirk),
    mom = momentum*mom + lr*g/sqrt(ms+eps); p -= mom."""

    def init(params):
        return {
            "ms": jax.tree.map(jnp.ones_like, params),
            "mom": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        ms = jax.tree.map(lambda s, g: decay * s + (1 - decay) * g * g, state["ms"], grads)
        mom = jax.tree.map(
            lambda mo, g, s: momentum * mo + learning_rate * g / jnp.sqrt(s + epsilon),
            state["mom"], grads, ms,
        )
        new_params = jax.tree.map(lambda p, mo: p - mo, params, mom)
        return new_params, {"ms": ms, "mom": mom}

    return Optimizer("RMSProp", init, update)


def ftrl(
    learning_rate: float = 0.001,
    learning_rate_power: float = -0.5,
    initial_accumulator_value: float = 0.1,
    l1_regularization_strength: float = 0.0,
    l2_regularization_strength: float = 0.0,
) -> Optimizer:
    """tf.train.FtrlOptimizer (FTRL-proximal), TF defaults.

    With lr_power=-0.5:
        n' = n + g^2
        sigma = (sqrt(n') - sqrt(n)) / lr
        z' = z + g - sigma * w
        w' = -(z' - sign(z')*l1) / (sqrt(n')/lr + 2*l2)   if |z'| > l1 else 0
    """
    if learning_rate_power != -0.5:
        raise NotImplementedError("only learning_rate_power=-0.5 (TF default) supported")
    l1, l2 = l1_regularization_strength, l2_regularization_strength

    def init(params):
        return {
            "n": jax.tree.map(lambda p: jnp.full_like(p, initial_accumulator_value), params),
            "z": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        n_new = jax.tree.map(lambda n, g: n + g * g, state["n"], grads)

        def z_up(z, g, w, n, nn):
            sigma = (jnp.sqrt(nn) - jnp.sqrt(n)) / learning_rate
            return z + g - sigma * w

        z_new = jax.tree.map(z_up, state["z"], grads, params, state["n"], n_new)

        def w_up(z, nn):
            quad = jnp.sqrt(nn) / learning_rate + 2.0 * l2
            w = -(z - jnp.sign(z) * l1) / quad
            return jnp.where(jnp.abs(z) > l1, w, jnp.zeros_like(w))

        new_params = jax.tree.map(w_up, z_new, n_new)
        return new_params, {"n": n_new, "z": z_new}

    return Optimizer("Ftrl", init, update)


def per_subtree(mapping: dict, default: Optimizer) -> Optimizer:
    """Apply different optimizers to different top-level param subtrees.

    Mirrors DNNLinearCombined's per-tower optimizers (FTRL on 'linear',
    Adagrad on the deep tower). ``mapping`` keys are top-level param dict
    keys; everything else uses ``default``.
    """

    def opt_for(key):
        return mapping.get(key, default)

    def init(params):
        return {k: opt_for(k).init(v) for k, v in params.items()}

    def update(grads, state, params):
        new_params, new_state = {}, {}
        for k in params:
            p, s = opt_for(k).update(grads[k], state[k], params[k])
            new_params[k], new_state[k] = p, s
        return new_params, new_state

    names = ",".join(f"{k}:{v.name}" for k, v in mapping.items()) + f",*:{default.name}"
    return Optimizer(f"PerSubtree({names})", init, update)


_REGISTRY = {
    "Adagrad": adagrad,
    "Adam": adam,
    "Ftrl": ftrl,
    "RMSProp": rmsprop,
    "SGD": sgd,
}


def get_optimizer(optimizer_name: str = "Adam", learning_rate: float = 0.001) -> Optimizer:
    """Name-based factory (ref trainers/model_utils.py:57-66)."""
    return _REGISTRY[optimizer_name](learning_rate=learning_rate)
