import time
import numpy as np, jax, jax.numpy as jnp
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import sgd
from bench import scaled_feature_set, random_superbatch

fs = scaled_feature_set()
B = 8192
sb = random_superbatch(fs, 1, B)
batch = {k: jax.device_put(v[0]) for k, v in sb.items()}
rng = jax.random.PRNGKey(1)

def run(tag, iters=60, dropout=0.1, use_linear=True, use_mf=True, use_dnn=True,
        opt_name="adam", train=True, dtype="bfloat16", k=64, hidden=(256,128)):
    cfg = TowerConfig(feature_set=fs, embedding_size=k, hidden_units=hidden,
                      dropout=dropout, compute_dtype=dtype, table_padding=128)
    model = DeepFMModel(cfg, use_linear=use_linear, use_mf=use_mf, use_dnn=use_dnn)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer() if opt_name=="adam" else sgd(0.001)
    opt_state = opt.init(params)
    def loss_fn(p, b):
        return sigmoid_xent(model.apply(p, b, train=train, rng=rng), b["labels"]).mean()
    def full(p, s, b):
        loss, grads = jax.value_and_grad(loss_fn)(p, b)
        p, s = opt.update(grads, s, p)
        return p, s, loss
    fj = jax.jit(full, donate_argnums=(0,1))
    p2, s2, l = fj(params, opt_state, batch); jax.block_until_ready(l)
    p2, s2, l = fj(p2, s2, batch); jax.block_until_ready(l)
    t0 = time.perf_counter()
    for _ in range(iters):
        p2, s2, l = fj(p2, s2, batch)
    jax.block_until_ready(l)
    ms = (time.perf_counter()-t0)/iters*1e3
    print(f"{tag:28s} {ms:7.3f} ms  {B/ms*1000:>12,.0f} ex/s", flush=True)

run("baseline")
run("no_dropout", dropout=0.0)
run("eval_mode", train=False)
run("no_linear", use_linear=False)
run("no_mf", use_mf=False)
run("no_dnn", use_dnn=False)
run("sgd", opt_name="sgd")
run("fp32_towers", dtype=None)
run("k16", k=16)
run("hidden_64_64", hidden=(64,64))
