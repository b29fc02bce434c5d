"""AutoInt attention ablation (round 5, VERDICT r4 #3).

Round-4 verdict: AutoInt at 21.6 ms/step (0.38M ex/s) is called
"architecture-bound" without a budget proving it. This harness (a) splits
the step into components, (b) races the attention implementations at the
scaled shape, (c) measures the FULL STEP for each candidate — the round-4
isolation-artifact lesson says isolated kernel wins are upper bounds, not
step deltas.

Implementations raced (rectpu/models/autoint.py):
  broadcast  — reduction-fused VPU broadcast products (round-4 default)
  dot        — per-example batched dot_general (the known latency-bound form)
  grouped-g  — block-diagonal packing: g examples' fields share one
               [g*26, g*26] masked attention -> MXU-shaped matmuls at a
               g-fold FLOP waste (exact: off-block logits softmax to 0)

Run: python -m benchmarks._ablate_autoint [--steps 120]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.models import AutoIntModel, TowerConfig
from rectpu.models.autoint import _grouped_field_attention
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam
from rectpu.utils.timing import chained_slope_ms


def log(*a):
    print(*a, file=sys.stderr, flush=True)


B, M, NH, DH = 8192, 26, 2, 32


def make_qkv(dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    mk = lambda s: jnp.asarray(rng.normal(size=(B, M, NH, DH)).astype(np.float32)).astype(dtype)
    return mk(1), mk(2), mk(3)


def att_broadcast(q, k, v):
    logits = (q[:, :, None].astype(jnp.float32)
              * k[:, None, :, :, :].astype(jnp.float32)).sum(-1)
    att = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(DH)), axis=2)
    return (att[..., None].astype(q.dtype) * v[:, None, :, :, :]).sum(2)


def att_dot(q, k, v):
    logits = jnp.einsum("bihd,bjhd->bhij", q, k,
                        preferred_element_type=jnp.float32)
    att = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(DH)), axis=3).astype(q.dtype)
    return jnp.einsum("bhij,bjhd->bihd", att, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def kernel_race(steps):
    q, k, v = make_qkv()
    impls = {"broadcast": att_broadcast, "dot": att_dot}
    for g in (4, 8, 16, 32):
        impls[f"grouped-{g}"] = lambda q, k, v, g=g: _grouped_field_attention(q, k, v, g)

    # correctness first: all impls must agree with broadcast
    ref = np.asarray(att_broadcast(q, k, v), np.float32)
    for name, fn in impls.items():
        got = np.asarray(fn(q, k, v), np.float32)
        err = np.max(np.abs(got - ref))
        assert err < 0.05, f"{name}: max err {err}"
        log(f"{name}: matches broadcast (max abs err {err:.4g})")

    iters = (max(steps // 6, 8), max(steps // 2, 24))
    for name, fn in impls.items():
        f_fwd = jax.jit(lambda x, fn=fn: x + fn(x, k, v) * jnp.asarray(1e-3, x.dtype))
        t_fwd = chained_slope_ms(f_fwd, q, iters, repeats=3)

        def loss(x, fn=fn):
            return jnp.sum(fn(x, k, v).astype(jnp.float32) ** 2) * 1e-6

        g_fn = jax.jit(lambda x, fn=fn: x + jax.grad(loss)(x, fn).astype(x.dtype))
        t_bwd = chained_slope_ms(g_fn, q, iters, repeats=3)
        log(f"kernel {name}: fwd {t_fwd:.3f} ms, fwd+bwd {t_bwd:.3f} ms")


def full_step(att_impl, att_group, staged, steps):
    fs = scaled_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=64, hidden_units=(256, 128),
                      dropout=0.1, compute_dtype="bfloat16",
                      table_grad_dtype="bfloat16", flat_layout=True,
                      scatter_impl="mxu", table_padding=2048,
                      dropout_impl="hash", packed_linear=True)
    model = AutoIntModel(cfg, att_impl=att_impl, att_group=att_group)
    params = model.init(jax.random.PRNGKey(0))
    opt = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    rng = jax.random.PRNGKey(1)

    def train(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    import time

    fj = jax.jit(train, donate_argnums=(0, 1))
    state = fj(params, opt.init(params), jnp.asarray(0, jnp.int32), staged[0])
    _ = float(state[-1])
    n1, n2 = max(steps // 4, 10), steps
    best = float("inf")
    step_no = 1
    for _ in range(3):
        times = []
        for n in (n1, n2):
            t0 = time.time()
            for _ in range(n):
                state = fj(*state[:-1], jnp.asarray(step_no, jnp.int32),
                           staged[step_no % len(staged)])
                step_no += 1
            _ = float(state[-1])
            times.append(time.time() - t0)
        slope = (times[1] - times[0]) / (n2 - n1)
        if slope > 0:
            best = min(best, slope)
    ms = 1e3 * best
    log(f"FULL STEP autoint att_impl={att_impl} g={att_group}: {ms:.3f} ms "
        f"= {8192/ms*1000:,.0f} ex/s")
    return ms


def components(steps):
    """Split the full step: attention stack vs lookup vs towers, fwd and
    fwd+bwd, isolated with chained timing — names where the ms live."""
    fs = scaled_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=64, hidden_units=(256, 128),
                      dropout=0.1, compute_dtype="bfloat16",
                      table_grad_dtype="bfloat16", flat_layout=True,
                      scatter_impl="mxu", table_padding=2048,
                      dropout_impl="hash", packed_linear=True)
    iters = (max(steps // 6, 8), max(steps // 2, 24))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, M, 64)).astype(np.float32)).astype(jnp.bfloat16)

    for impl in ("broadcast", "bf16"):
        model = AutoIntModel(cfg, att_impl=impl)
        params = model.init(jax.random.PRNGKey(0))
        att_params = params["att"]

        def stack(x, p=att_params, model=model):
            h = x
            for layer in p:
                h = model._interacting_layer(layer, h)
            return h

        f_fwd = jax.jit(lambda x: x + stack(x)[:, :, :64] * jnp.asarray(1e-3, x.dtype))
        t_fwd = chained_slope_ms(f_fwd, x0, iters, repeats=3)

        def loss(x):
            return jnp.sum(stack(x).astype(jnp.float32) ** 2) * 1e-6

        f_bwd = jax.jit(lambda x: x + jax.grad(loss)(x).astype(x.dtype))
        t_bwd = chained_slope_ms(f_bwd, x0, iters, repeats=3)
        log(f"component att-stack[{impl}] (2 layers incl. projections): "
            f"fwd {t_fwd:.3f} ms, fwd+bwd {t_bwd:.3f} ms")

    # lookup + linear path fwd+bwd (the table work the zoo shares)
    model = AutoIntModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    sb = random_superbatch(fs, 1, B)
    ids = jax.device_put(jnp.asarray(sb["cat_ids"][0]))
    from rectpu.ops.embedding import lookup_flat

    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))

    def lk_loss(tbl):
        e, lin = lookup_flat(tbl, ids, field_info, 64,
                             gather_dtype=jnp.bfloat16,
                             grad_dtype=jnp.bfloat16, scatter_impl="mxu")
        return jnp.sum(e.astype(jnp.float32)) * 1e-6 + jnp.sum(lin) * 1e-6

    f_lk = jax.jit(lambda t: t + jax.grad(lk_loss)(t) * 1e-3)
    t_lk = chained_slope_ms(f_lk, params["table"], iters, repeats=3)
    log(f"component lookup_flat fwd+bwd: {t_lk:.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--skip-kernels", action="store_true")
    ap.add_argument("--skip-components", action="store_true")
    ap.add_argument("--full", nargs="*", default=["broadcast", "bf16"],
                    help="att impls to full-step race")
    args = ap.parse_args()

    if not args.skip_kernels:
        kernel_race(args.steps)
    if not args.skip_components:
        components(args.steps)

    fs = scaled_feature_set()
    sb = random_superbatch(fs, 8, 8192)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]
    for impl in args.full:
        g = 8
        if impl.startswith("grouped-"):
            impl, g = "grouped", int(impl.split("-")[1])
        full_step(impl, g, staged, args.steps)


if __name__ == "__main__":
    main()
