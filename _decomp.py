import time, sys
import numpy as np, jax, jax.numpy as jnp
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from bench import scaled_feature_set, random_superbatch

fs = scaled_feature_set()
cfg = TowerConfig(feature_set=fs, embedding_size=64, hidden_units=(256,128),
                  dropout=0.1, compute_dtype="bfloat16", table_padding=128)
model = DeepFMModel(cfg)
params = model.init(jax.random.PRNGKey(0))
opt = model.default_optimizer()
opt_state = opt.init(params)
B = 8192
sb = random_superbatch(fs, 1, B)
batch = {k: jax.device_put(v[0]) for k, v in sb.items()}
rng = jax.random.PRNGKey(1)

def timeit(fn, *args, iters=30, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time()-t0)/iters*1e3

fwd = jax.jit(lambda p, b: model.apply(p, b, train=True, rng=rng))
print("fwd_ms", timeit(fwd, params, batch))

fwd_nodrop = jax.jit(lambda p, b: model.apply(p, b, train=False))
print("fwd_nodrop_ms", timeit(fwd_nodrop, params, batch))

def loss_fn(p, b):
    return sigmoid_xent(model.apply(p, b, train=True, rng=rng), b["labels"]).mean()
g = jax.jit(jax.value_and_grad(loss_fn))
print("fwd_bwd_ms", timeit(g, params, batch))

def full(p, s, b):
    loss, grads = jax.value_and_grad(loss_fn)(p, b)
    p, s = opt.update(grads, s, p)
    return p, s, loss
fj = jax.jit(full, donate_argnums=(0,1))
# can't donate in a timing loop easily; rebind
out = fj(params, opt_state, batch); jax.block_until_ready(out)
p2, s2, _ = out
t0=time.time()
iters=30
for _ in range(iters):
    p2, s2, l = fj(p2, s2, batch)
jax.block_until_ready(l)
print("full_step_ms", (time.time()-t0)/iters*1e3)

# optimizer update alone on table-shaped grads
grads = jax.jit(jax.grad(loss_fn))(params, batch)
ou = jax.jit(lambda g, s, p: opt.update(g, s, p))
print("opt_update_ms", timeit(ou, grads, opt_state, params))

# embedding gather alone
ids = batch["cat_ids"]
table = params["emb"]
gather = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
print("gather_ms", timeit(gather, table, ids))
scat = jax.jit(jax.grad(lambda t: jnp.take(t, ids, axis=0).astype(jnp.float32).sum()))
print("scatter_ms", timeit(scat, table))
