import time
import numpy as np, jax, jax.numpy as jnp
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import sgd
from bench import scaled_feature_set, random_superbatch
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

fs = scaled_feature_set()
B = 8192
sb = random_superbatch(fs, 1, B)
batch = {k: jax.device_put(v[0]) for k, v in sb.items()}
rng = jax.random.PRNGKey(1)

def run(tag, iters=60, **kw):
    mkw = {k: kw.pop(k) for k in ("use_linear","use_mf","use_dnn") if k in kw}
    opt_name = kw.pop("opt", "adam")
    fwd_only = kw.pop("fwd_only", False)
    cfg = TowerConfig(feature_set=fs, embedding_size=kw.pop("k", 64),
                      hidden_units=kw.pop("hidden", (256,128)),
                      dropout=kw.pop("dropout", 0.1),
                      compute_dtype=kw.pop("dtype", "bfloat16"), table_padding=128, **kw)
    model = DeepFMModel(cfg, **mkw)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer() if opt_name=="adam" else sgd(0.001)
    opt_state = opt.init(params)
    def loss_fn(p, b):
        return sigmoid_xent(model.apply(p, b, train=True, rng=rng), b["labels"]).mean()
    if fwd_only:
        def full(p, s, b):
            return p, s, loss_fn(p, b)
    else:
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
    print(f"{tag:26s} {ms:7.3f} ms  {B/ms*1000:>12,.0f} ex/s", flush=True)

run("fused_baseline")
run("fwd_only", fwd_only=True)
run("sgd", opt="sgd")
run("no_mf", use_mf=False)
run("no_dnn", use_dnn=False)
run("no_linear", use_linear=False)
run("emb_only", use_mf=False, use_dnn=False, use_linear=True)
