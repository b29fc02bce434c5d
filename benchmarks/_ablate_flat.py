"""Ablation: flat (lane-packed) looked layout vs stacked [B,F,K+1], scaled config."""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam


def run(flat: bool, batch=8192, steps=60, scatter="xla"):
    fs = scaled_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", table_padding=2048 if scatter == "mxu" else 128,
        packed_linear=True, table_grad_dtype="bfloat16", flat_layout=flat,
        scatter_impl=scatter,
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(1)

    def train_one(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optimizer.update(grads, opt_state, params)
        return params, opt_state, loss

    fj = jax.jit(train_one, donate_argnums=(0, 1))
    n_stage = 8
    sb = random_superbatch(fs, n_stage, batch)
    staged = [{kk: jax.device_put(v[i]) for kk, v in sb.items()} for i in range(n_stage)]

    t0 = time.time()
    params, opt_state, loss = fj(params, opt_state, jnp.asarray(0, jnp.int32), staged[0])
    jax.block_until_ready(loss)
    print(f"flat={flat}: compile {time.time()-t0:.1f}s loss0={float(loss):.4f}", file=sys.stderr)

    t0 = time.time()
    for i in range(steps):
        params, opt_state, loss = fj(
            params, opt_state, jnp.asarray(i + 1, jnp.int32), staged[i % n_stage]
        )
    jax.block_until_ready(loss)
    dt = time.time() - t0
    ms = 1e3 * dt / steps
    print(f"flat={flat} scatter={scatter}: {ms:.3f} ms/step  {steps*batch/dt:,.0f} ex/s  loss={float(loss):.4f}")
    return ms


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("std", "both"):
        run(False)
    if which in ("flat", "both"):
        run(True)
    if which == "mxu":
        run(True, scatter="mxu")
