"""Benchmark: DeepFM training throughput (examples/sec/chip) on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N, ...}

Configuration is the BASELINE.json scaled config (configs[4]): DeepFM with
embedding_size=64, hidden [256,128], large hashed vocab (user 100k / item 200k
/ zipcode 10k), batch 8192, bf16 towers — measured as steady-state training
throughput (forward + backward + optimizer update) on one chip.

``vs_baseline`` is measured against a CPU proxy of the reference: the same
DeepFM math in torch (CPU, batch 32 — the reference's TF-1.12 defaults,
/root/reference/trainers/deep_fm.py:197-206). The reference publishes no
numbers (BASELINE.md), so the proxy is measured fresh on this machine each
run; all details go to stderr, only the JSON line to stdout.

Usage: python bench.py [--steps 200] [--batch 8192] [--kernels] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def scaled_feature_set():
    """The BASELINE 'large hashed vocab' variant of the ml-100k schema."""
    from rectpu.features.schema import (
        GENRE,
        BucketizedFeature,
        FeatureSet,
        HashFeature,
        IdentityFeature,
        VocabFeature,
    )

    feats = [
        HashFeature("user_id", 100_000, dtype="int32"),
        HashFeature("item_id", 200_000, dtype="int32"),
        BucketizedFeature("age", tuple(range(15, 66, 10))),
        VocabFeature("gender", ("F", "M"), num_oov_buckets=1),
        HashFeature("occupation", 50),
        HashFeature("zipcode", 10_000),
        BucketizedFeature("release_year", tuple(range(1930, 1991, 10))),
    ]
    feats.extend(IdentityFeature(g, 2) for g in GENRE)
    return FeatureSet(categorical=tuple(feats))


def random_superbatch(fs, k, batch, seed=0):
    rng = np.random.default_rng(seed)
    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [
            offs[f] + rng.integers(0, sizes[f], size=(k, batch))
            for f in range(fs.num_fields)
        ],
        axis=2,
    ).astype(np.int32)
    return {
        "cat_ids": ids,
        "num_vals": np.zeros((k, batch, 0), np.float32),
        "labels": (rng.random((k, batch)) < 0.2).astype(np.float32),
    }


def bench_tpu(batch: int, steps: int, embedding_size=64, hidden=(256, 128)) -> dict:
    import jax
    import jax.numpy as jnp

    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.metrics import sigmoid_xent

    fs = scaled_feature_set()
    cfg = TowerConfig(
        feature_set=fs,
        embedding_size=embedding_size,
        hidden_units=hidden,
        dropout=0.1,
        compute_dtype="bfloat16",
        packed_linear=True,
        # bf16 dense table cotangent: halves the scatter/pad/optimizer-read
        # traffic of the table-grad path (4.54 -> 3.62 ms measured). The
        # towers already produce bf16 gradients; only the big-field scatter's
        # (rare-by-construction) collision sums change precision — see
        # ops/embedding.lookup_split.
        table_grad_dtype="bfloat16",
        # lane-packed [B, F*K] looked activations: no [B, F, K+1] tile padding,
        # FM as MXU matmul-reduction, DNN input needs no reshape
        # (3.76 -> 3.34 ms/step measured).
        flat_layout=True,
        # MXU row-scatter for the table cotangent (ops/scatter_rows): XLA's
        # serial scatter costs 1.11 ms at this shape; sorted one-hot matmul
        # rebuild (huge fields) + per-field one-hot rebuilds (dense-medium
        # fields) + transposed {0,1}-layout output take the step
        # 3.32 -> 1.91 ms. table_padding=2048 keeps the tile grid exact.
        scatter_impl="mxu",
        table_padding=2048,
        # counter-hash dropout masks instead of threefry: ~8 ALU ops/element
        # vs ~100; measured 1.919 -> 1.709 ms/step (+11%) at this config
        # (benchmarks/_ablate_dropout.py, 2026-08-19). dropout=0 floor is 1.639 ms.
        dropout_impl="hash",
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    # bf16 m/v slots with stochastically-rounded v (fp32 math): halves the
    # optimizer-state traffic of the dense table sweep, ~4.5% step win, and
    # AUC-validated at the parity config (RESULTS.md: SR 0.81298 vs fp32
    # 0.81247; PLAIN bf16 v loses 0.02 AUC to increment underflow). Parity
    # bench below keeps all-fp32 slots = exact TF semantics.
    from rectpu.train.optimizers import BF16_SR, adam

    optimizer = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(1)

    # pipelined per-step dispatch (the Trainer's large-batch mode): K async
    # dispatches over pre-staged distinct batches, block once at the end —
    # lax.scan's carry copying costs ~0.5-1 ms/step on big param trees.
    def train_one(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optimizer.update(grads, opt_state, params)
        return params, opt_state, loss

    fj = jax.jit(train_one, donate_argnums=(0, 1))
    n_stage = 8
    sb = random_superbatch(fs, n_stage, batch)
    staged = [
        {kk: jax.device_put(v[i]) for kk, v in sb.items()} for i in range(n_stage)
    ]

    # warmup + compile (float(loss) fetches real bytes -> true completion;
    # block_until_ready alone can return early through the tunnel)
    t0 = time.time()
    params, opt_state, loss = fj(params, opt_state, jnp.asarray(0, jnp.int32), staged[0])
    log(f"tpu: compile+warmup {time.time()-t0:.1f}s; loss[0]={float(loss):.4f}")

    # Timing methodology v3 (round 5) — SELF-CERTIFYING step time.
    #
    # Two estimators with opposite failure modes bracket the truth:
    #  * SLOPE (lower-bound side): run n1 then n2 chained steps, each synced
    #    by fetching the loss; slope = (t2-t1)/(n2-n1) cancels the
    #    fetch/dispatch fixed cost. Ambient load usually ADDS time, so the
    #    min over 3 window-pairs is the least-contaminated sample — but a
    #    load burst in the FIRST window SHRINKS the slope, so the min slope
    #    can UNDERSHOOT (two round-4 sub-HBM-floor readings were disproven
    #    this way; CLAUDE.md round-4 addendum).
    #  * INCLUSIVE (upper-bound side): one window of n_inc steps timed
    #    end-to-end including the fixed cost — it can only OVER-read (the
    #    per-window fetch cost is amortized to <0.1 ms/step at n_inc=300;
    #    min over 2 windows trims a single burst while staying an upper
    #    bound, since each window individually over-reads).
    #
    # CERTIFICATION (two-sided): slope and inclusive within agree_tol of
    # each other means neither a slope undershoot (slope << inclusive) nor
    # slope-window load (slope >> inclusive) contaminated the attempt —
    # quote min(slope, inclusive) of the best certified attempt (the
    # overclaim risk is bounded by agree_tol; the inclusive side is a hard
    # upper bound). On disagreement, back off and retry (bounded):
    # sustained ambient tunnel load is bursty on this shared chip
    # (BENCH_r04 regression: driver read 2.23-2.47 ms under load while the
    # quiet-session band was 1.41-1.50 ms). If no attempt certifies, quote
    # the min INCLUSIVE reading across attempts (a trustworthy upper bound
    # on step time -> conservative throughput, valid even under load) and
    # set load_flag so the record self-documents the contamination.
    n1 = max(steps // 8, 10)
    n2 = max(steps // 2, 40)
    # big inclusive window so the once-per-window fetch/pipeline-fill cost
    # (~40-80 ms through the tunnel) amortizes below ~5% of the step time
    n_inc = max(steps * 3, 600)
    agree_tol = 1.15
    max_attempts = 4
    backoffs = (20.0, 45.0, 75.0)
    step_no = 1

    def run_window(n):
        nonlocal params, opt_state, step_no
        t0 = time.time()
        for _ in range(n):
            params, opt_state, loss = fj(
                params, opt_state, jnp.asarray(step_no, jnp.int32),
                staged[step_no % n_stage],
            )
            step_no += 1
        _ = float(loss)  # real-bytes sync (block_until_ready lies through the tunnel)
        return time.time() - t0

    attempts = []
    for attempt in range(max_attempts):
        best_slope = float("inf")
        fallback = None
        for _rep in range(3):
            t1, t2 = run_window(n1), run_window(n2)
            slope = (t2 - t1) / (n2 - n1)
            fallback = t2 / n2
            if slope > 0:
                best_slope = min(best_slope, slope)
            log(f"tpu: slope of {n1}/{n2} steps x batch {batch} "
                f"(attempt {attempt} rep {_rep}): {1e3*slope:.3f} ms/step")
        if best_slope == float("inf"):
            best_slope = fallback
        inclusive = min(run_window(n_inc) / n_inc for _ in range(2))
        ratio = inclusive / best_slope
        agree = max(ratio, 1.0 / ratio) <= agree_tol
        log(f"tpu: attempt {attempt}: slope {1e3*best_slope:.3f} ms vs "
            f"inclusive {1e3*inclusive:.3f} ms ({n_inc}-step upper bound), "
            f"ratio {ratio:.3f} -> {'agree' if agree else 'DISAGREE'}")
        attempts.append({"slope": best_slope, "inclusive": inclusive,
                         "agree": agree})
        if agree:
            break
        if attempt < max_attempts - 1:
            wait = backoffs[min(attempt, len(backoffs) - 1)]
            log(f"tpu: slope/inclusive disagree >{agree_tol:.2f}x — ambient "
                f"load suspected; backing off {wait:.0f}s and retrying")
            time.sleep(wait)

    certified = [a for a in attempts if a["agree"]]
    if certified:
        pick = min(certified, key=lambda a: min(a["slope"], a["inclusive"]))
        dt, load_flag = min(pick["slope"], pick["inclusive"]), False
    else:
        pick = min(attempts, key=lambda a: a["inclusive"])
        dt, load_flag = pick["inclusive"], True
    # throughput band, ascending: lo from the slower reading, hi from the faster
    band = sorted([batch / pick["inclusive"], batch / pick["slope"]])
    eps = batch / dt
    tag = "CERTIFIED" if not load_flag else "CONTAMINATED (quoting inclusive upper bound)"
    log(f"tpu: {tag}: {1e3*dt:.3f} ms/step -> {eps:,.0f} "
        f"examples/s (band [{band[0]:,.0f}, {band[1]:,.0f}])")
    return {"examples_per_sec": eps, "steps": step_no - 1, "batch": batch,
            "seconds": dt * n2, "band": band, "load_flag": load_flag,
            "slope_ms": 1e3 * pick["slope"],
            "inclusive_ms": 1e3 * pick["inclusive"],
            "attempts": len(attempts)}


def bench_cpu_reference_proxy(seconds: float = 4.0) -> float:
    """The reference's workload (TF-1.12 Estimator DeepFM, CPU, batch 32)
    proxied in torch CPU: same towers, same batch, full train step."""
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 4))
    v, f, k_emb, batch = 4106, 26, 4, 32

    emb = torch.nn.Embedding(v, k_emb)
    lin = torch.nn.Embedding(v, 1)
    mlp = torch.nn.Sequential(
        torch.nn.Linear(f * k_emb, 16), torch.nn.ReLU(), torch.nn.Dropout(0.1),
        torch.nn.Linear(16, 16), torch.nn.ReLU(), torch.nn.Dropout(0.1),
        torch.nn.Linear(16, 1),
    )
    params = list(emb.parameters()) + list(lin.parameters()) + list(mlp.parameters())
    opt = torch.optim.Adam(params, lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss()

    ids = torch.randint(0, v, (64, batch, f))
    labels = (torch.rand(64, batch) < 0.2).float()

    def step(i):
        b = ids[i % 64]
        e = emb(b)  # [B, F, K]
        s = e.sum(1)
        fm = 0.5 * (s.square() - e.square().sum(1)).sum(1)
        dnn = mlp(e.reshape(batch, -1))[:, 0]
        logits = lin(b).sum(1)[:, 0] + fm + dnn
        loss = loss_fn(logits, labels[i % 64])
        opt.zero_grad()
        loss.backward()
        opt.step()

    for i in range(10):  # warmup
        step(i)
    # best-of-3 windows: the shared host's load varies ~2x between runs and
    # a depressed baseline would inflate vs_baseline; max is the fairest
    # estimate of what the reference machine can actually do. If the windows
    # spread >2x (a load burst starved torch mid-run — observed 23.5k vs
    # 569 ex/s under a concurrent 8-core job), sleep and re-run once: a
    # too-LOW baseline is the dishonest-in-our-favor direction.
    def windows(k):
        out = []
        for _ in range(k):
            n = 0
            t0 = time.time()
            while time.time() - t0 < seconds / 2:
                step(n)
                n += 1
            out.append(n * batch / (time.time() - t0))
        return out

    w = windows(3)
    if max(w) / max(min(w), 1.0) > 2.0:
        log(f"cpu proxy: windows spread >2x ({[f'{x:,.0f}' for x in w]}) — "
            "host load burst suspected; retrying after 10s")
        time.sleep(10.0)
        w += windows(3)
    best = max(w)
    log(f"cpu proxy (torch, batch {batch}): best of {len(w)} -> {best:,.0f} examples/s")
    return best


def bench_kernels() -> dict:
    """Micro-benchmarks: pallas vs XLA for FM-cross and embedding lookup."""
    import jax
    import jax.numpy as jnp

    from rectpu.ops.embedding import lookup_onehot, lookup_pallas, lookup_take
    from rectpu.ops.fm import fm_cross_pallas, fm_cross_xla

    results = {}
    b, f, k = 8192, 26, 64
    v = jnp.asarray(np.random.default_rng(0).normal(size=(b, f, k)).astype(np.float32))

    def timeit_chained(make_out, feedback, x0, iters=(40, 120)):
        """Dependency-chained two-point timing (rectpu.utils.timing): chained
        so the device cannot overlap/elide repeated work, synced by real data
        fetches (block_until_ready can return early through the tunnel), and
        slope-of-two-counts so the fetch's fixed cost cancels."""
        from rectpu.utils.timing import chained_slope_s

        f_jit = jax.jit(lambda x: feedback(make_out(x), x))
        return chained_slope_s(f_jit, x0, iters, repeats=3)

    for name, fn in [("fm_xla", fm_cross_xla), ("fm_pallas", fm_cross_pallas)]:
        results[name + "_fwd_ms"] = 1e3 * timeit_chained(
            fn, lambda out, x: x + out[:, None, None] * 1e-12, v
        )
        grad_fn = jax.grad(lambda x: jnp.sum(fn(x)))
        results[name + "_bwd_ms"] = 1e3 * timeit_chained(
            grad_fn, lambda out, x: x + out * 1e-12, v
        )

    # lane-packed flat FM (the production layout): XLA vs the Pallas kernel,
    # at the scaled shape in both fp32 and the production bf16
    from rectpu.ops.fm import fm_cross_flat, fm_cross_flat_pallas

    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        v2 = v.reshape(b, f * k).astype(dt)
        for name, fn in [
            ("fm_flat_xla", lambda x: fm_cross_flat(x, f, k)),
            ("fm_flat_pallas", lambda x: fm_cross_flat_pallas(x, f, k)),
        ]:
            results[f"{name}_{dt_name}_fwd_ms"] = 1e3 * timeit_chained(
                fn, lambda out, x: x + (out[:, None] * 1e-12).astype(x.dtype), v2
            )
            grad_fn = jax.grad(lambda x: jnp.sum(fn(x)))
            results[f"{name}_{dt_name}_bwd_ms"] = 1e3 * timeit_chained(
                grad_fn, lambda out, x: x + (out * 1e-12).astype(x.dtype), v2
            )

    table = jnp.asarray(np.random.default_rng(1).normal(size=(4224, 64)).astype(np.float32))
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 4106, size=(8192, 26)).astype(np.int32))
    for name, fn in [("take", lookup_take), ("onehot", lookup_onehot), ("pallas", lookup_pallas)]:
        results[f"lookup_{name}_fwd_ms"] = 1e3 * timeit_chained(
            lambda t: fn(t, ids), lambda out, t: t + out.sum() * 1e-12, table
        )
        grad_fn = jax.grad(lambda t: jnp.sum(fn(t, ids)))
        results[f"lookup_{name}_bwd_ms"] = 1e3 * timeit_chained(
            grad_fn, lambda out, t: t + out * 1e-12, table
        )
    # dense row-scatter at the scaled-config shape: XLA's serial scatter vs
    # the sorted one-hot MXU rebuild (ops/scatter_rows)
    from rectpu.ops.scatter_rows import scatter_rows_dense

    v_rows = 311296
    rng = np.random.default_rng(3)
    sc_ids = jnp.asarray(rng.integers(0, v_rows, size=16384).astype(np.int32))
    sc_upd = jnp.asarray(rng.normal(size=(16384, 65)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def xla_scatter(u):
        return jnp.zeros((v_rows, 65), jnp.bfloat16).at[sc_ids].add(u)

    def mxu_scatter(u):
        return scatter_rows_dense(sc_ids, u, v_rows, out_dtype=jnp.bfloat16)

    for name, fn in [("scatter_xla", xla_scatter), ("scatter_mxu", mxu_scatter)]:
        # scalar-reduce feedback: a row-gather feedback would add ~1 ms of
        # its own serial-gather time to BOTH sides and mask the difference
        results[name + "_ms"] = 1e3 * timeit_chained(
            fn, lambda out, u: u + (out.sum() * 1e-12).astype(u.dtype), sc_upd
        )

    # serving-shape gather: fp32 vs int8+per-row-scale dequant (serve/quant),
    # 8192x26 ids over the 310k-row scaled table. Both sides chain through
    # the IDS (the gather's consumed input) so neither pays extra table
    # traffic in its feedback and neither can run ahead of the chain.
    big_table = jnp.asarray(
        np.random.default_rng(4).normal(size=(v_rows, 65)).astype(np.float32)
    )
    from rectpu.serve.quant import dequant_lookup, quantize_rows

    q_np, s_np = quantize_rows(np.asarray(big_table))
    qt = {"q": jnp.asarray(q_np), "s": jnp.asarray(s_np)}
    g_ids = jnp.asarray(
        np.random.default_rng(5).integers(0, v_rows, size=(8192, 26)).astype(np.int32)
    )

    def chain_ids(out, ids):
        # data-dependent no-op: the next iteration's ids consume this output
        return ids + (out.sum() * 1e-12).astype(jnp.int32)

    results["serve_gather_f32_ms"] = 1e3 * timeit_chained(
        lambda ids: jnp.take(big_table, ids, axis=0), chain_ids, g_ids
    )
    results["serve_gather_int8_ms"] = 1e3 * timeit_chained(
        lambda ids: dequant_lookup(qt, ids), chain_ids, g_ids
    )

    for k_, v_ in results.items():
        log(f"kernel {k_}: {v_:.3f} ms")
    return results


def _enable_compile_cache():
    """Persistent compilation cache: first-compile of the scanned train step
    is minutes over the remote-compile tunnel; subsequent runs are seconds."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def bench_parity_config(steps: int = 2000) -> dict:
    """Reference-default config (batch 32, K=4, hidden [16,16], dropout 0.1 —
    /root/reference/trainers/deep_fm.py:197-206) training throughput."""
    import jax
    import jax.numpy as jnp

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16), dropout=0.1)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    optimizer = model.default_optimizer()
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(1)
    batch = 32

    def one_step(carry, b):
        params, opt_state, step = carry
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optimizer.update(grads, opt_state, params)
        return (params, opt_state, step + 1), loss

    @jax.jit
    def chunk(params, opt_state, step, batches):
        (params, opt_state, step), losses = jax.lax.scan(
            one_step, (params, opt_state, step), batches
        )
        return params, opt_state, step, losses

    k = 500
    sb = random_superbatch(fs, k, batch)
    sb = {kk: jax.device_put(v) for kk, v in sb.items()}
    step = jnp.zeros((), jnp.int32)
    t0 = time.time()
    params, opt_state, step, losses = chunk(params, opt_state, step, sb)
    jax.block_until_ready(losses)
    log(f"parity: compile+warmup {time.time()-t0:.1f}s")
    n_chunks = max(steps // k, 2)
    t0 = time.time()
    for _ in range(n_chunks):
        params, opt_state, step, losses = chunk(params, opt_state, step, sb)
    jax.block_until_ready(losses)
    dt = time.time() - t0
    eps = n_chunks * k * batch / dt
    log(f"parity config: {n_chunks*k} steps x batch {batch} in {dt:.2f}s -> {eps:,.0f} examples/s")
    return {"examples_per_sec": eps}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--kernels", action="store_true", help="also run kernel micro-benchmarks")
    ap.add_argument("--parity", action="store_true",
                    help="also measure the reference-default (batch 32) config")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    if args.quick:
        args.steps = 60

    _enable_compile_cache()
    import jax

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    tpu = bench_tpu(args.batch, args.steps)
    cpu_eps = bench_cpu_reference_proxy(2.0 if args.quick else 4.0)

    extra = {}
    if args.kernels:
        extra = bench_kernels()
    parity = None
    if args.parity:
        parity = bench_parity_config(500 if args.quick else 2000)

    result = {
        "metric": "deepfm_train_examples_per_sec_per_chip",
        "value": round(tpu["examples_per_sec"], 1),
        "unit": "examples/s",
        "vs_baseline": round(tpu["examples_per_sec"] / cpu_eps, 2),
        # measurement self-certification (methodology v3): band = ascending
        # throughput bracket from the picked attempt's two estimators;
        # load_flag means slope and inclusive never agreed within 15% and
        # the conservative inclusive bound is being quoted as `value`
        "band": [round(tpu["band"][0], 1), round(tpu["band"][1], 1)],
        "load_flag": tpu["load_flag"],
        "step_ms": {"slope": round(tpu["slope_ms"], 3),
                    "inclusive": round(tpu["inclusive_ms"], 3),
                    "attempts": tpu["attempts"]},
        "baseline": {
            "name": "cpu_reference_proxy_torch_batch32",
            "examples_per_sec": round(cpu_eps, 1),
        },
        "config": {
            "model": "deep_fm",
            "batch": tpu["batch"],
            "embedding_size": 64,
            "hidden_units": [256, 128],
            "vocab_rows": 310_497,
            "compute_dtype": "bfloat16",
            "table_grad_dtype": "bfloat16",
            "optimizer_slot_dtype": {"m": "bfloat16", "v": "bfloat16_sr"},
            "flat_layout": True,
            "scatter_impl": "mxu",
            "backend": backend,
        },
    }
    if extra:
        result["kernels_ms"] = {k: round(v, 3) for k, v in extra.items()}
    if parity:
        result["parity_config_examples_per_sec"] = round(parity["examples_per_sec"], 1)
        result["parity_vs_baseline"] = round(parity["examples_per_sec"] / cpu_eps, 2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
