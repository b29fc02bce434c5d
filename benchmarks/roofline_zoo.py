"""Roofline budgets for the zoo families (round 5, VERDICT r4 #3).

`benchmarks/roofline.py` budgets the DeepFM flagship only; this extends the
discipline to DLRM / DCN / xDeepFM / AutoInt so "architecture-bound" is a
measured budget, not a hypothesis. For each family: the family-specific
block is measured in isolation (chained v2 timing) against an analytic
bound (true FLOPs at the measured MXU rate for matmul shapes, VPU rate for
broadcast-reduce shapes, bytes at the measured stream rate, per-row latency
for gathers), the full step is measured with the bench harness, and the
step is stated as a multiple of its bound sum.

Shared rows (lookup_flat fwd, table-grad build, Adam sweep) are budgeted
once in roofline.py — here each family's table shows its SPECIFIC blocks
plus the shared-path subtotal measured as one piece.

Run: python -m benchmarks.roofline_zoo [--families dlrm dcn xdeep_fm autoint]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.utils.timing import chained_slope_s

B, K, HIDDEN = 8192, 64, (256, 128)
F = 26
FK = F * K


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_op(make_out, x0, iters=(16, 48), repeats=3):
    """make_out(x) must return an array of x's shape (e.g. a grad); chained
    by folding it back into x with a tiny coefficient."""
    f = jax.jit(lambda x: x + (
        make_out(x) * jnp.asarray(1e-3, x.dtype)).astype(x.dtype))
    return chained_slope_s(f, x0, iters, repeats=repeats)


def probe_rates():
    """Stream, MXU and VPU rates measured with the same methodology."""
    n = 1 << 26
    x = jnp.ones((n,), jnp.float32)
    t = time_op(lambda v: v * 1.0000001, x)
    bw = 2 * n * 4 / t / 1e9
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)

    @jax.jit
    def mm(v):
        return v + (jnp.dot(v, v, preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) * jnp.asarray(1e-3, jnp.bfloat16))

    t2 = chained_slope_s(mm, a, (16, 48), repeats=3)
    mxu = 2 * m**3 / t2 / 1e12
    # VPU fused multiply-add rate, ALU-BOUND: a degree-64 polynomial chain
    # fused into one pass (128 flops/elem vs 8 bytes/elem traffic — ALU
    # dominates by ~10x at stream rate), f32 like the attention products
    xv = jnp.ones((1 << 23,), jnp.float32)

    @jax.jit
    def poly(v):
        h = v
        for _ in range(64):
            h = h * 1.0000001 + 1e-9
        return h

    t3 = chained_slope_s(poly, xv, (16, 48), repeats=3)
    vpu = 128 * (1 << 23) / t3 / 1e12
    log(f"probes: stream {bw:.0f} GB/s, MXU bf16 {mxu:.1f} TFLOP/s, "
        f"VPU f32 {vpu:.2f} TFLOP/s")
    return bw * 1e9, mxu * 1e12, vpu * 1e12



def grad_all(loss2, params_tree):
    """make_out(x) computing grads wrt x AND params (all train-step legs);
    param grads fold into the chain with a 1e-30 coefficient so they are
    computed but numerically negligible."""
    def make_out(x):
        dx, dp = jax.grad(loss2, argnums=(0, 1))(x, params_tree)
        acc = sum(jnp.sum(leaf.astype(jnp.float32))
                  for leaf in jax.tree_util.tree_leaves(dp))
        return dx + (acc * 1e-30).astype(x.dtype)
    return make_out


def full_step(model, staged, steps=100):
    from rectpu.train.metrics import sigmoid_xent
    from rectpu.train.optimizers import BF16_SR, adam

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
    return best


def shared_cfg(**kw):
    from rectpu.models import TowerConfig

    fs = scaled_feature_set()
    base = dict(feature_set=fs, embedding_size=K, hidden_units=HIDDEN,
                dropout=0.1, compute_dtype="bfloat16",
                table_grad_dtype="bfloat16", flat_layout=True,
                scatter_impl="mxu", table_padding=2048,
                dropout_impl="hash", packed_linear=True)
    base.update(kw)
    return TowerConfig(**base)


def budget_table(name, rows, step_s):
    bound_sum = sum(r[2] for r in rows)
    log("")
    log(f"### {name}")
    log("| component | measured ms | bound ms | x bound | basis |")
    log("|---|---|---|---|---|")
    for nm, t, b, basis in rows:
        log(f"| {nm} | {1e3*t:.3f} | {1e3*b:.3f} | "
            f"{t/b if b else float('inf'):.1f}x | {basis} |")
    log(f"| **full step** | {1e3*step_s:.3f} | {1e3*bound_sum:.3f} "
        f"(component bound sum) | {step_s/bound_sum:.1f}x | |")
    return step_s / bound_sum


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*",
                    default=["dlrm", "dcn", "xdeep_fm", "autoint"])
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    gb, tf, vpu = probe_rates()
    rng = np.random.default_rng(0)
    fs = scaled_feature_set()
    sb = random_superbatch(fs, 8, B)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]
    results = {}

    # shared table path (lookup fwd + grad build + Adam sweep) measured as
    # one piece on the DeepFM flagship budget (roofline.py); its bound of
    # record is ~0.95 ms (round-4 table). Use the measured DeepFM full step
    # minus its interaction/tower blocks as the shared-path proxy: simpler
    # and honest — state it as a constant with its source.
    shared_bound = 0.95e-3  # roofline.py round-4: recast+lookup+grad+sweep bounds
    shared_basis = "shared table path (roofline.py r4 bound sum)"

    if "dlrm" in args.families:
        from rectpu.models import DLRMModel
        from rectpu.ops.interaction import interact_xla_fast

        cfg = shared_cfg()
        model = DLRMModel(cfg)
        x0 = jnp.asarray(rng.normal(size=(B, FK)).astype(np.float32)).astype(jnp.bfloat16)

        def inter_loss(x):
            return jnp.sum(interact_xla_fast(x, F, K).astype(jnp.float32)) * 1e-6

        t_int = time_op(lambda x: jax.grad(inter_loss)(x), x0)
        # pairwise dots: F*F*K MACs/example fwd, x3 for fwd+bwd, on the VPU
        # (per-example [F,K] class — latency-bound, VPU rate is the bound)
        int_flops = 3 * 2 * B * F * F * K
        int_bytes = 4 * B * F * K * 2
        b_int = int_flops / vpu + int_bytes / gb
        rows = [
            ("interaction fwd+bwd (xla_fast)", t_int, b_int,
             f"{int_flops/1e9:.1f} GF @ VPU-lb + {int_bytes/1e6:.0f} MB"),
            ("shared table+tower path", float("nan"), shared_bound, shared_basis),
        ]
        step = full_step(model, staged, args.steps)
        results["dlrm"] = budget_table("DLRM-flat", rows, step)

    if "dcn" in args.families:
        from rectpu.models import DCNModel

        cfg = shared_cfg()
        model = DCNModel(cfg, num_cross_layers=2, low_rank=256)
        x0 = jnp.asarray(rng.normal(size=(B, FK)).astype(np.float32)).astype(jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0))
        cross = params["cross"]

        def cross_loss(x, cross, model=model):
            h = x
            for layer in cross:
                h = model._cross(layer, x, h)
            return jnp.sum(h.astype(jnp.float32)) * 1e-6

        t_cross = time_op(grad_all(cross_loss, cross), x0)
        r = 256
        cross_flops = 3 * 2 * 2 * B * FK * r * 2  # 2 layers x (U,V) x fwd/dgrad/wgrad
        cross_bytes = 6 * B * FK * 2
        b_cross = cross_flops / tf + cross_bytes / gb
        rows = [
            ("low-rank cross (2 layers) fwd+bwd", t_cross, b_cross,
             f"{cross_flops/1e9:.1f} GF @ MXU + {cross_bytes/1e6:.0f} MB"),
            ("shared table+tower path", float("nan"), shared_bound, shared_basis),
        ]
        step = full_step(model, staged, args.steps)
        results["dcn"] = budget_table("DCN low-rank r=256", rows, step)

    if "xdeep_fm" in args.families:
        from rectpu.models import XDeepFMModel
        from rectpu.ops.cin import cin_core

        cfg = shared_cfg()
        model = XDeepFMModel(cfg)
        x0 = jnp.asarray(rng.normal(size=(B, F, K)).astype(np.float32)).astype(jnp.bfloat16)
        params = model.init(jax.random.PRNGKey(0))
        w1, w2 = params["cin"][0]["w"], params["cin"][1]["w"]

        def cin_loss(x, ws):
            w1, w2 = ws
            h1 = cin_core(x, x, w1.astype(x.dtype))
            h2 = cin_core(h1.astype(x.dtype), x, w2.astype(x.dtype))
            return (jnp.sum(h1.astype(jnp.float32)) +
                    jnp.sum(h2.astype(jnp.float32))) * 1e-6

        t_cin = time_op(grad_all(cin_loss, (w1, w2)), x0)
        o = 64
        # true contraction FLOPs: 2*B*K*H*M*O per layer (H=26 then 64),
        # x4 for fwd + dx + dy + dw (each the same-size contraction)
        cin_flops = 4 * 2 * B * K * (26 + 64) * F * o
        b_cin = cin_flops / tf
        rows = [
            ("CIN(64,64) fwd+bwd (custom VJP)", t_cin, b_cin,
             f"{cin_flops/1e9:.0f} GF true contraction @ MXU"),
            ("shared table+tower path", float("nan"), shared_bound, shared_basis),
        ]
        step = full_step(model, staged, args.steps)
        results["xdeep_fm"] = budget_table("xDeepFM CIN(64,64)", rows, step)

    if "autoint" in args.families:
        from rectpu.models import AutoIntModel

        cfg = shared_cfg()
        best_name, best_step, best_rows = None, float("inf"), None
        for impl in ("broadcast", "bf16"):
            model = AutoIntModel(cfg, att_impl=impl)
            params = model.init(jax.random.PRNGKey(0))
            att = params["att"]
            x0 = jnp.asarray(rng.normal(size=(B, F, K)).astype(np.float32)).astype(jnp.bfloat16)

            def att_loss(x, att, model=model):
                h = x
                for layer in att:
                    h = model._interacting_layer(layer, h)
                return jnp.sum(h.astype(jnp.float32)) * 1e-6

            t_att = time_op(grad_all(att_loss, att), x0)
            # qk + av broadcast-reduce: 2*B*M*M*D MACs/layer, x3 fwd/bwd legs,
            # on the VPU; plus the [B,M,N,H] logits round trips
            att_flops = 3 * 2 * 2 * B * F * F * K * 2
            att_bytes = 6 * B * F * F * 2 * 4  # logits+softmax+dlogits passes f32
            proj_flops = 3 * 2 * 2 * B * F * K * (4 * K)
            b_att = att_flops / vpu + att_bytes / gb + proj_flops / tf
            rows = [
                (f"att stack[{impl}] (2 layers) fwd+bwd", t_att, b_att,
                 f"{att_flops/1e9:.1f} GF @ VPU-lb + {att_bytes/1e6:.0f} MB "
                 f"+ proj {proj_flops/1e9:.1f} GF @ MXU"),
                ("shared table+tower path", float("nan"), shared_bound, shared_basis),
            ]
            step = full_step(model, staged, args.steps)
            x = budget_table(f"AutoInt [{impl}]", rows, step)
            if step < best_step:
                best_name, best_step, best_rows = impl, step, x
        results["autoint"] = best_rows
        log(f"AutoInt best impl: {best_name} at {1e3*best_step:.3f} ms")

    log("")
    log("x-bound summary: " + ", ".join(
        f"{k}={v:.1f}x" for k, v in results.items()))
    print('{"zoo_x_bound": ' + str({k: round(v, 2) for k, v in results.items()})
          .replace("'", '"') + "}")


if __name__ == "__main__":
    main()
