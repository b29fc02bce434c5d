"""Ablation: bf16 shadow table vs per-step f32->bf16 gather recast.

Current scaled-config step casts the full f32 master table to bf16 every
step before the gather (gather_dtype): ~119 MB of pure recast traffic
(read 79 f32 + write 40 bf16 ~ 0.145 ms at roofline). Variant B carries a
bf16 SHADOW of the packed table in the train state: the lookup consumes
the shadow directly (cast is a no-op), and the new shadow is emitted as
new_master.astype(bf16) right after the Adam write-back, where XLA can
fuse it into the same HBM sweep — trading the 79 MB recast READ for a
40 MB fused write (net ~0.1 ms).

Numerically identical: shadow == master.astype(bf16) is exactly what the
per-step recast computed.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    fs = scaled_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", packed_linear=True, table_grad_dtype="bfloat16",
        flat_layout=True, scatter_impl="mxu", table_padding=2048,
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    return fs, model, params, opt


def run(fj, inits, staged, steps=200):
    """Chained slope timing (round-4 upgrade: the naive time.time loop this
    used before is burst-contaminated through the tunnel — min/median of
    chained two-point slopes per the timing doctrine)."""
    import statistics

    from rectpu.utils.timing import chained_slope_s

    def step_fn(carry):
        params, opt_state, step = carry
        p2, o2, loss = fj(params, opt_state, step, staged[0])
        return (p2, o2, step + 1)

    # donation means carry0's buffers die on the first call: use the
    # utility's internal repeats (they continue the live chain) rather than
    # re-calling with the consumed carry
    del statistics
    carry0 = (*inits, jnp.asarray(0, jnp.int32))
    return chained_slope_s(step_fn, carry0, (10, 40), repeats=5)


def main():
    batch, steps = 8192, 200
    fs, model, params, opt = build()
    rng = jax.random.PRNGKey(1)
    sb = random_superbatch(fs, 8, batch)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]

    # A: current path (per-step recast inside lookup_flat via gather_dtype)
    def train_a(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    fj_a = jax.jit(train_a, donate_argnums=(0, 1))
    ms_a = 1e3 * run(fj_a, (params, opt.init(params)), staged, steps)
    log(f"A current (per-step recast): {ms_a:.3f} ms/step")

    # B: bf16 param store (train/optimizers.bf16_param_store — the real path)
    from rectpu.train.optimizers import bf16_param_store

    fs2, model2, params2, inner2 = build()
    opt2 = bf16_param_store(inner2)

    def train_b(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model2.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt2.update(grads, opt_state, params)
        return params, opt_state, loss

    fj_b = jax.jit(train_b, donate_argnums=(0, 1))
    state_b = opt2.init(params2)
    params2 = opt2.prepare(params2)
    ms_b = 1e3 * run(fj_b, (params2, state_b), staged, steps)
    log(f"B bf16 shadow table:        {ms_b:.3f} ms/step")
    log(f"delta: {ms_a - ms_b:+.3f} ms ({100*(ms_a-ms_b)/ms_a:+.1f}%)")


if __name__ == "__main__":
    main()
