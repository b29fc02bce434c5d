"""DNN scaled-config: flat vs standard layout."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from bench import random_superbatch, scaled_feature_set
from rectpu.models import TowerConfig
from rectpu.models.dnn import DNNModel
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adagrad

def run(flat, sr=False, steps=200, batch=8192):
    fs = scaled_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", table_padding=2048 if flat else 128,
        table_grad_dtype="bfloat16", flat_layout=flat,
        scatter_impl="mxu" if flat else "xla",
        embedding_impl="split" if not flat else "auto",
    )
    model = DNNModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = adagrad(learning_rate=0.05, slot_dtype=BF16_SR if sr else None)
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
    sb = random_superbatch(fs, 4, batch)
    staged = [{kk: jax.device_put(v[i]) for kk, v in sb.items()} for i in range(4)]
    p, o, loss = fj(params, opt_state, jnp.asarray(0, jnp.int32), staged[0])
    jax.block_until_ready(loss)
    for i in range(10):
        p, o, loss = fj(p, o, jnp.asarray(i, jnp.int32), staged[i % 4])
    jax.block_until_ready(loss)
    t0 = time.time()
    for i in range(steps):
        p, o, loss = fj(p, o, jnp.asarray(i, jnp.int32), staged[i % 4])
    jax.block_until_ready(loss)
    dt = time.time() - t0
    print(f"dnn flat={flat} sr={sr}: {1e3*dt/steps:.3f} ms/step  {steps*batch/dt:,.0f} ex/s")

for a in sys.argv[1:] or ["0", "1", "1sr"]:
    run(a.startswith("1"), sr=a.endswith("sr"))
