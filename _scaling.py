import time
import numpy as np, jax, jax.numpy as jnp
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import adam
from bench import scaled_feature_set, random_superbatch
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
fs = scaled_feature_set()
rng = jax.random.PRNGKey(1)
opt = adam(0.001)
cfg = TowerConfig(feature_set=fs, embedding_size=64, hidden_units=(256,128),
                  dropout=0.1, compute_dtype="bfloat16", table_padding=128,
                  packed_linear=True)
model = DeepFMModel(cfg)
for B in [512, 2048, 8192, 32768, 65536]:
    params = model.init(jax.random.PRNGKey(0))
    sb = random_superbatch(fs, 4, B)
    staged = [{kk: jax.device_put(v[i]) for kk, v in sb.items()} for i in range(4)]
    def train_one(p, s, step, b):
        srng = jax.random.fold_in(rng, step)
        def loss_fn(pp):
            return sigmoid_xent(model.apply(pp, b, train=True, rng=srng), b["labels"]).mean()
        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, s = opt.update(grads, s, p)
        return p, s, loss
    fj = jax.jit(train_one, donate_argnums=(0,1))
    p, s = params, opt.init(params)
    p, s, l = fj(p, s, jnp.asarray(0, jnp.int32), staged[0]); jax.block_until_ready(l)
    n = max(20, 200000 // B)
    t0 = time.perf_counter()
    for i in range(n):
        p, s, l = fj(p, s, jnp.asarray(i, jnp.int32), staged[i % 4])
    jax.block_until_ready(l)
    ms = (time.perf_counter()-t0)/n*1e3
    print(f"B={B:6d}  {ms:8.3f} ms/step  {B/ms*1000:>12,.0f} ex/s", flush=True)
