"""Full-step roofline budget at the scaled config (round-3 VERDICT item 4).

One auditable table instead of per-kernel prose: for each component of the
flagship flat-DeepFM train step (batch 8192, K=64, 311k-row packed table,
bf16 towers, mxu scatter, hash dropout, bf16/bf16-sr Adam slots), measure it
in ISOLATION with chained slope timing and state the achievable bound it is
judged against — bytes at this chip's MEASURED stream bandwidth, FLOPs at
the MEASURED MXU rate, or the documented grid-overhead floor. Then measure
the full step and close the budget:

    step = X% of the component sum; the residual is named.

Timing methodology: rectpu/utils/timing.py doctrine (dependency-chained,
fetch-synced, two-count slope). Components chain through a SCALAR folded
into the operand (one fused broadcast-add, no extra memory traffic) so the
measured time is the op, not the chain.

Run: python -m benchmarks.roofline        (on the TPU; ~5 min warm cache)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.utils.timing import chained_slope_s

B, K, W, HIDDEN = 8192, 64, 65, (256, 128)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_op(make_out, x_const, iters=(20, 60), repeats=3) -> float:
    """Seconds for make_out(x) — chained through a scalar: the op consumes
    x + s*1e-30 (a fused broadcast-add, no extra HBM traffic) and the next
    iteration's scalar is derived from one element of the output, so
    dispatches serialize and the full output stays live (it is a jit
    output). ``x_const`` is passed as a jit ARGUMENT — a closure capture
    would bake multi-GB constants into the HLO and kill the remote
    compiler (learned the hard way, twice)."""

    @jax.jit
    def step(s, xc):
        out = make_out(
            jax.tree.map(lambda x: x + (s * 1e-30).astype(x.dtype), xc)
        )
        leaf = jax.tree_util.tree_leaves(out)[0]
        return s + leaf.ravel()[0].astype(jnp.float32) * 1e-12, out

    x_dev = jax.tree.map(jax.device_put, x_const)

    def chain(s):
        s2, _ = step(s, x_dev)
        return s2

    return chained_slope_s(chain, jnp.zeros((), jnp.float32), iters,
                           repeats=repeats)


def probe_rates():
    """This chip's achievable stream bandwidth and bf16 MXU rate, measured
    with the same methodology the components use."""
    n = 1 << 26  # 64M f32 = 256 MB
    x = jnp.ones((n,), jnp.float32)
    t = time_op(lambda v: v * 1.0000001, x)  # read + write
    bw = 2 * n * 4 / t / 1e9
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    t2 = time_op(lambda v: jnp.dot(v, v, preferred_element_type=jnp.float32)
                 .astype(jnp.bfloat16), a)
    mxu = 2 * m**3 / t2 / 1e12
    # random-row gather floor at the table shape (latency-bound, NOT
    # bandwidth): the per-row cost every big-field gather pays
    vr = 311296
    tb = jnp.zeros((vr, W), jnp.bfloat16)
    idr = jnp.asarray(
        np.random.default_rng(7).integers(0, vr, size=3 * B).astype(np.int32))
    t3 = time_op(lambda d: jnp.take(d["t"], d["i"], axis=0),
                 {"t": tb, "i": idr})
    row_ns = t3 / (3 * B) * 1e9
    log(f"probes: stream {bw:.0f} GB/s, MXU bf16 {mxu:.1f} TFLOP/s, "
        f"random-row gather {row_ns:.1f} ns/row")
    return bw, mxu, row_ns


def main():
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.ops.embedding import lookup_flat
    from rectpu.ops.fm import fm_cross_flat
    from rectpu.train.optimizers import BF16_SR, adam

    fs = scaled_feature_set()
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
    offsets, sizes = field_info
    cfg = TowerConfig(
        feature_set=fs, embedding_size=K, hidden_units=HIDDEN, dropout=0.1,
        compute_dtype="bfloat16", packed_linear=True,
        table_grad_dtype="bfloat16", flat_layout=True, scatter_impl="mxu",
        table_padding=2048, dropout_impl="hash",
    )
    model = DeepFMModel(cfg)
    v_rows = cfg.padded_buckets
    rng = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0))
    table_f32 = params["table"]
    table_bf16 = table_f32.astype(jnp.bfloat16)
    sb = random_superbatch(fs, 1, B)
    ids = jax.device_put(jnp.asarray(sb["cat_ids"][0]))
    fk = fs.num_fields * K

    bw, mxu, row_ns = probe_rates()
    gb, tf = bw * 1e9, mxu * 1e12

    small = [f for f in range(fs.num_fields) if sizes[f] <= 4096]
    medium = [f for f in range(fs.num_fields)
              if 4096 < sizes[f] <= cfg.mxu_dense_threshold]
    huge = [f for f in range(fs.num_fields) if sizes[f] > cfg.mxu_dense_threshold]
    s_total = sum(sizes[f] for f in small)

    rows = []  # (name, measured_s, bound_s, basis, hbm_bytes)

    def add(row):
        rows.append(row)
        name, t, b, basis = row[:4]
        log(f"  {name}: {1e3*t:.3f} ms (bound {1e3*b:.3f} ms) [{basis}]")

    # 1. f32 master -> bf16 gather recast (full-table read f32 + write bf16)
    t = time_op(lambda x: x.astype(jnp.bfloat16), table_f32)
    add(("gather recast f32->bf16", t, v_rows * W * 6 / gb,
                 f"{v_rows*W*6/1e6:.0f} MB @ stream", v_rows * W * 6))

    # 2. lookup_flat forward (blockdiag MXU chain + 3 big-field gathers),
    #    fed the ALREADY-bf16 table (the recast is component 1)
    t = time_op(
        lambda x: lookup_flat(x, ids, field_info, K)[0], table_bf16
    )
    n_gather = (len(huge) + len(medium)) * B
    fwd_bytes = B * fk * 2  # flat output write
    fwd_flops = 2 * B * s_total * (fk + 1)  # multihot @ blockdiag
    fwd_bound = n_gather * row_ns * 1e-9 + fwd_bytes / gb + fwd_flops / tf
    add(("lookup_flat fwd", t, fwd_bound,
         f"{n_gather/1e3:.0f}k rows @ {row_ns:.0f} ns (latency) + "
         f"{fwd_bytes/1e6:.0f} MB + {fwd_flops/1e9:.1f} GF",
         fwd_bytes + n_gather * W * 2))

    # 3. table-cotangent build (the mxu backward: merged sorted stream ->
    #    per-tile one-hot matmuls + medium-field one-hot rebuilds)
    # time ONLY the transpose: jax.vjp precomputes the forward + residuals
    # once outside the timed region (residuals are small: ids + the [B, S]
    # multihot), then the vjp closure is the pure backward
    _, vjp_fn = jax.vjp(
        lambda t_: lookup_flat(t_, ids, field_info, K,
                               gather_dtype=jnp.bfloat16,
                               grad_dtype=jnp.bfloat16, scatter_impl="mxu"),
        table_f32,
    )
    d_emb0 = jnp.ones((B, fk), jnp.bfloat16)
    d_lin0 = jnp.ones((B,), jnp.float32)
    t = time_op(lambda d: vjp_fn((d["e"], d["l"]))[0],
                {"e": d_emb0, "l": d_lin0})
    g_tiles = v_rows // 2048
    stream_rows = len(huge) * B + s_total
    bwd_bytes = v_rows * W * 2 + stream_rows * W * 6  # dtable write + stream rw
    med_flops = sum(2 * B * sizes[f] * W for f in medium)
    add(("table-grad build (vjp)", t,
                 g_tiles * 1.3e-6 + bwd_bytes / gb + med_flops / tf,
                 f"{g_tiles} tiles @ 1.3us grid floor + {bwd_bytes/1e6:.0f} MB "
                 f"@ stream + {med_flops/1e9:.1f} GF", bwd_bytes))

    # 4. FM chain fwd+bwd on the flat activations
    v2 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, fk)).astype(np.float32)).astype(jnp.bfloat16))
    t = time_op(
        lambda x: jax.grad(lambda y: jnp.sum(fm_cross_flat(y, fs.num_fields, K)
                                             .astype(jnp.float32)))(x), v2)
    fm_bytes = 3 * B * fk * 2  # read v2 (fwd) + read v2 + write dv2 (bwd)
    fm_flops = 3 * 2 * B * fk  # stacked-identity matmuls, fwd + 2x bwd
    add(("FM fwd+bwd", t, fm_bytes / gb + fm_flops / tf,
                 f"{fm_bytes/1e6:.0f} MB @ stream", fm_bytes))

    # 5. DNN towers fwd+bwd (3 matmul layers, x3 for fwd/dgrad/wgrad)
    mlp = params["mlp"]

    def towers(x):
        def obj(p):
            h = x
            for layer in p:
                h = jnp.maximum(
                    jnp.dot(h, layer["kernel"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) + layer["bias"].astype(jnp.bfloat16),
                    0)
            return jnp.sum(h.astype(jnp.float32))
        return jax.grad(obj)(mlp), x

    t = time_op(lambda x: towers(x)[0], v2)
    dims = [fk] + list(HIDDEN) + [1]
    mlp_flops = 3 * sum(2 * B * dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    mlp_bytes = 4 * B * fk * 2  # the wide activation dominates
    add(("DNN towers fwd+bwd", t, mlp_flops / tf + mlp_bytes / gb,
                 f"{mlp_flops/1e9:.1f} GF @ MXU + {mlp_bytes/1e6:.0f} MB",
                 mlp_bytes))

    # 6. Adam table sweep (bf16 m + bf16-sr v slots) incl. write-back
    opt = adam(learning_rate=0.001,
               slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    tbl = {"table": table_f32}
    state0 = opt.init(tbl)
    g_tbl = {"table": table_bf16 * 1e-3}

    def sweep(d):
        p2, s2 = opt.update(d["g"], d["s"], d["p"])
        return p2["table"], s2  # all outputs live or the m/v writes DCE

    # everything rides as arguments (multi-GB closure constants kill the
    # remote compiler)
    t = time_op(sweep, {"g": g_tbl, "s": state0, "p": tbl})
    sweep_bytes = v_rows * W * (4 + 2 + 2 + 2 + 4 + 2 + 2)
    add(("Adam sweep + write-back", t, sweep_bytes / gb,
                 f"{sweep_bytes/1e6:.0f} MB @ stream", sweep_bytes))

    # 7. hash dropout masks (two hidden activations)
    from rectpu.models.base import hash_dropout_mask

    seed = jnp.asarray(7, jnp.uint32)

    def masks(s):
        a = hash_dropout_mask(s[0].astype(jnp.uint32), (B, HIDDEN[0]), 0.1)
        b = hash_dropout_mask(s[0].astype(jnp.uint32) + 1, (B, HIDDEN[1]), 0.1)
        return jnp.sum(a) + jnp.sum(b)

    t = time_op(masks, jnp.ones((1,), jnp.float32))
    mask_bytes = B * sum(HIDDEN)
    add(("hash dropout masks", t, mask_bytes / gb,
                 f"{B*sum(HIDDEN)/1e6:.1f}M elems @ ~8 VPU ops", mask_bytes))

    # --- the full step: the bench.py harness itself (donated buffers +
    # two-point slope + real loss fetch — the number of record's method)
    from bench import bench_tpu

    step_s = B / bench_tpu(B, steps=120)["examples_per_sec"]

    # --- report -----------------------------------------------------------
    comp_sum = sum(r[1] for r in rows)
    bound_sum = sum(r[2] for r in rows)
    total_bytes = sum(r[4] for r in rows)
    hbm_bound = total_bytes / gb
    log("")
    log("| component | measured ms | bound ms | x bound | bound basis |")
    log("|---|---|---|---|---|")
    for name, t, b, basis, _ in rows:
        log(f"| {name} | {1e3*t:.3f} | {1e3*b:.3f} | "
            f"{t/b if b else float('inf'):.1f}x | {basis} |")
    log(f"| **component sum** | {1e3*comp_sum:.3f} | {1e3*bound_sum:.3f} | "
        f"{comp_sum/bound_sum:.1f}x | |")
    log(f"| **full step** | {1e3*step_s:.3f} | | | |")
    log("")
    log(f"step = {100*step_s/comp_sum:.0f}% of the component sum; "
        f"residual {1e3*(step_s-comp_sum):+.3f} ms = loss/logit glue, "
        f"dispatch gaps and imperfect overlap (negative residual = XLA "
        f"overlapping components the isolated timings serialize)")
    log(f"step = {100*step_s/bound_sum:.0f}% of the summed achievable bound "
        f"({1e3*bound_sum:.2f} ms)")
    # the serialized bound-sum overstates the floor when XLA overlaps
    # components; the binding shared resource is HBM traffic — the
    # overlap-aware roofline is total bytes at the measured stream rate
    log(f"overlap-aware HBM roofline: {total_bytes/1e6:.0f} MB @ "
        f"{bw:.0f} GB/s = {1e3*hbm_bound:.3f} ms -> step = "
        f"{step_s/hbm_bound:.2f}x the HBM floor")
    print(f'{{"step_ms": {1e3*step_s:.3f}, "component_sum_ms": '
          f'{1e3*comp_sum:.3f}, "bound_sum_ms": {1e3*bound_sum:.3f}, '
          f'"hbm_floor_ms": {1e3*hbm_bound:.3f}}}')


if __name__ == "__main__":
    main()
