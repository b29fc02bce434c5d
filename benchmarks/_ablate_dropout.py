"""Ablation: threefry vs hash dropout masks at the scaled config.

RESULTS.md profiled dropout at ~0.25 ms of the 1.9 ms scaled step; the mask
generation is threefry (~100 ALU ops per uint32 pair). hash_dropout_mask
(models/base.py) replaces it with a murmur3-finalizer counter hash
(~8 ops/element). Also measures dropout=0 as the floor.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(dropout=0.1, dropout_impl="threefry"):
    fs = scaled_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=dropout,
        compute_dtype="bfloat16", packed_linear=True, table_grad_dtype="bfloat16",
        flat_layout=True, scatter_impl="mxu", table_padding=2048,
        dropout_impl=dropout_impl,
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    return fs, model, params, opt


def measure(dropout, impl, staged, steps=200):
    fs, model, params, opt = build(dropout, impl)
    rng = jax.random.PRNGKey(1)

    def train(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    fj = jax.jit(train, donate_argnums=(0, 1))
    state = fj(params, opt.init(params), jnp.asarray(0, jnp.int32), staged[0])
    jax.block_until_ready(state[-1])
    t0 = time.time()
    for i in range(steps):
        state = fj(*state[:-1], jnp.asarray(i + 1, jnp.int32), staged[i % len(staged)])
    jax.block_until_ready(state[-1])
    ms = 1e3 * (time.time() - t0) / steps
    log(f"dropout={dropout} impl={impl}: {ms:.3f} ms/step")
    return ms


def main():
    batch = 8192
    fs = scaled_feature_set()
    sb = random_superbatch(fs, 8, batch)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]
    a = measure(0.1, "threefry", staged)
    b = measure(0.1, "hash", staged)
    c = measure(0.0, "threefry", staged)
    log(f"threefry {a:.3f} | hash {b:.3f} | no-dropout floor {c:.3f} "
        f"| hash win {a-b:+.3f} ms ({100*(a-b)/a:+.1f}%)")


if __name__ == "__main__":
    main()
