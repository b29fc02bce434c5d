"""Ablation: cost of the order-3 FM term (--fm-order 3) at the scaled config.

The order-3 term (ops/fm.fm_cross3_flat; PAPERS.md tensorFM lead) adds two
more stacked-identity matmuls over the already-resident [B, F*K] activations
plus VPU power chains — nominally a small fraction of the 1.6-1.7 ms step.
Measures the full scaled train step at fm_order 2 vs 3 (v2 slope timing,
chained through the donated train state) and the bare fwd+bwd op.
"""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.ops.fm import fm_cross3_flat, fm_cross_flat
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam
from rectpu.utils.timing import chained_slope_ms


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def step_ms(fm_order: int, staged, repeats=5) -> float:
    fs = scaled_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", packed_linear=True, table_grad_dtype="bfloat16",
        flat_layout=True, scatter_impl="mxu", table_padding=2048,
        dropout_impl="hash",
    )
    model = DeepFMModel(cfg, fm_order=fm_order)
    params = model.init(jax.random.PRNGKey(0))
    opt = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    rng = jax.random.PRNGKey(1)

    def train(carry, b):
        params, opt_state, step = carry

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=jax.random.fold_in(rng, step))
            return sigmoid_xent(logits, b["labels"]).mean()

        _, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return (params, opt_state, step + 1)

    fj = jax.jit(train, donate_argnums=(0,))
    # rotate the staged batches per DISPATCHED step (host-side counter, the
    # same feeding pattern as bench.py) — a fixed batch per run flatters the
    # step with cache-warm gathers on identical ids (round-2 ADVICE)
    counter = {"i": 0}

    def step(c):
        b = staged[counter["i"] % len(staged)]
        counter["i"] += 1
        return fj(c, b)

    def fresh_x0():
        # the carry is DONATED — every chained_slope repeat needs live buffers
        p = model.init(jax.random.PRNGKey(0))
        return (p, opt.init(p), jnp.asarray(0, jnp.int32))

    ms = min(chained_slope_ms(step, fresh_x0()) for _ in range(repeats))
    log(f"fm_order={fm_order}: {ms:.3f} ms/step")
    return ms


def op_ms(order: int, b=8192, f=26, k=64, repeats=5) -> float:
    v2 = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(2), (b, f * k), jnp.bfloat16))
    op = {2: fm_cross_flat, 3: fm_cross3_flat}[order]

    def fwdbwd(x):
        out, dv = jax.value_and_grad(lambda y: jnp.sum(op(y, f, k)))(x)
        return dv + out.astype(x.dtype) * 1e-9  # chain both outputs

    fj = jax.jit(fwdbwd)
    ms = min(chained_slope_ms(fj, v2) for _ in range(repeats))
    log(f"fm_cross{order if order == 3 else ''}_flat fwd+bwd [{b},{f}*{k}]: {ms:.3f} ms")
    return ms


def main():
    batch = 8192
    fs = scaled_feature_set()
    sb = random_superbatch(fs, 8, batch)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]
    m2 = step_ms(2, staged)
    m3 = step_ms(3, staged)
    o2 = op_ms(2)
    o3 = op_ms(3)
    log(f"step: order2 {m2:.3f} | order3 {m3:.3f} | delta {m3-m2:+.3f} ms "
        f"({100*(m3-m2)/m2:+.1f}%); bare op: order2 {o2:.3f} | order3 {o3:.3f} ms")


if __name__ == "__main__":
    main()
