"""Capture a device trace of the flat train step and print top ops by time."""
import glob
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from bench import random_superbatch, scaled_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam

fs = scaled_feature_set()
cfg = TowerConfig(
    feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
    compute_dtype="bfloat16", packed_linear=True,
    table_grad_dtype="bfloat16", flat_layout=True,
    scatter_impl="mxu", table_padding=2048,
)
model = DeepFMModel(cfg)
params = model.init(jax.random.PRNGKey(0))
optimizer = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
opt_state = optimizer.init(params)
rng = jax.random.PRNGKey(1)
B = 8192


def train_one(params, opt_state, step, b):
    step_rng = jax.random.fold_in(rng, step)

    def loss_fn(p):
        logits = model.apply(p, b, train=True, rng=step_rng)
        return sigmoid_xent(logits, b["labels"]).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    params, opt_state = optimizer.update(grads, opt_state, params)
    return params, opt_state, loss


fj = jax.jit(train_one, donate_argnums=(0, 1))
sb = random_superbatch(fs, 4, B)
staged = [{kk: jax.device_put(v[i]) for kk, v in sb.items()} for i in range(4)]
params, opt_state, loss = fj(params, opt_state, jnp.asarray(0, jnp.int32), staged[0])
jax.block_until_ready(loss)
for i in range(10):
    params, opt_state, loss = fj(params, opt_state, jnp.asarray(i, jnp.int32), staged[i % 4])
jax.block_until_ready(loss)

logdir = "/tmp/flat_trace"
jax.profiler.start_trace(logdir)
for i in range(20):
    params, opt_state, loss = fj(params, opt_state, jnp.asarray(i, jnp.int32), staged[i % 4])
jax.block_until_ready(loss)
jax.profiler.stop_trace()
print("trace captured", file=sys.stderr)

# --- parse the xplane ---
xplanes = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))
path = xplanes[-1]

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

xs = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name.lower():
        continue
    # XLA Ops line
    agg = {}
    for line in plane.lines:
        if line.name not in ("XLA Ops",):
            continue
        for ev in line.events:
            meta = plane.event_metadata[ev.metadata_id]
            agg.setdefault(meta.name, [0, 0.0])
            agg[meta.name][0] += 1
            agg[meta.name][1] += ev.duration_ps / 1e9  # ms
    total = sum(v[1] for v in agg.values())
    print(f"\nplane: {plane.name}  total XLA-op time {total:.3f} ms over trace")
    for name, (n, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]:
        print(f"  {ms/20:8.4f} ms/step  x{n:<4d} {name[:110]}")
