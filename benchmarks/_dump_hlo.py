import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from bench import random_superbatch, scaled_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam

fs = scaled_feature_set()
cfg = TowerConfig(feature_set=fs, embedding_size=64, hidden_units=(256,128), dropout=0.1,
    compute_dtype="bfloat16", packed_linear=True, table_padding=2048,
    table_grad_dtype="bfloat16", flat_layout=True, scatter_impl="mxu")
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

sb = random_superbatch(fs, 1, 8192)
b0 = {k: v[0] for k, v in sb.items()}
lowered = jax.jit(train_one, donate_argnums=(0,1)).lower(params, opt_state, jnp.asarray(0, jnp.int32), b0)
comp = lowered.compile()
hlo = comp.as_text()
open("/tmp/step_hlo.txt","w").write(hlo)
print(len(hlo))
