"""Where do the ~90 ms/step go in the 6M-row sparse fast step?

Round-4 left the question open (RESULTS.md: packed m|v slab measured NO win;
"the 213k-elem per-step dedupe sort is the next suspect"). This harness
times each component of the sparse step (train/fast_step.py) in isolation
at the big-table config (batch 8192, 26 fields -> R = 212,992 lookup rows,
packed [V, 65] table, V ~ 6.1M, mv [V, 130]) with the v2 chained
methodology, donating the table/mv state wherever a scatter would otherwise
force XLA to copy the multi-GB operand (the real step donates).

Components:
  fwd_gather   table[ids] -> [R, 65]                 (1 row pass)
  sort         argsort(ids)  [R]
  dedupe       dedupe_rows(ids, grads[R,65], V)      (sort + grads gather +
                                                      segment_sum + rebuild)
  adam_gather  mv[rows] + p[rows] + row math, no scatters   (2 row passes)
  adam_scatter p.at[rows].set + mv.at[rows].set, donated    (2 row passes)
  adam_full    sparse_adam_rows_packed, donated             (4 row passes)
  full_step    the whole jitted sparse step (reference number ~90 ms)

Run: python -m benchmarks._profile_sparse   (on the TPU)
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from benchmarks._ablate_bigtable import batches, big_feature_set
from benchmarks.roofline import time_op
from rectpu.train.sparse import dedupe_rows, sparse_adam_rows_packed
from rectpu.utils.timing import chained_slope_s, fetch_sync

B, K, W = 8192, 64, 65


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_carried(step, state, iters=(20, 60), repeats=3):
    """Chained timing for ops that mutate big carried state (scatters):
    the state feeds back through donated args so .at[].set updates in
    place, exactly as the real step does."""
    x = step(state)
    fetch_sync(x)
    return chained_slope_s(step, x, iters, repeats=repeats)


def main():
    global B
    small = "small" in sys.argv[1:]  # CPU smoke test of the harness itself
    if small:
        B = 256
        from bench import scaled_feature_set
        fs = scaled_feature_set()
    else:
        fs = big_feature_set()
    v = int(fs.total_buckets)
    rng = np.random.default_rng(3)
    offs, sizes = fs.offsets, fs.field_sizes
    ids_np = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=B) for f in range(fs.num_fields)],
        axis=1,
    ).astype(np.int32).reshape(-1)
    r = ids_np.shape[0]
    uniq = np.unique(ids_np)
    u = uniq.shape[0]
    rows_np = np.full((r,), v, np.int32)
    rows_np[:u] = uniq  # sorted uniques + OOB sentinel tail, like dedupe_rows
    log(f"V={v:,} R={r:,} uniques={u:,}")

    ids = jax.device_put(jnp.asarray(ids_np))
    rows = jax.device_put(jnp.asarray(rows_np))
    grads = jax.device_put(jnp.asarray(rng.standard_normal((r, W)).astype(np.float32)))
    table = jax.device_put(jnp.zeros((v, W), jnp.float32))
    mv = jax.device_put(jnp.zeros((v, 2 * W), jnp.float32))
    res = {}

    # --- read-only components (time_op: perturb-input chain) ---
    res["fwd_gather"] = time_op(lambda d: jnp.take(d["t"], d["i"], axis=0),
                                {"t": table, "i": ids})
    res["sort"] = time_op(lambda d: jnp.argsort(d["i"]), {"i": ids})
    res["dedupe"] = time_op(lambda d: dedupe_rows(d["i"], d["g"], v),
                            {"i": ids, "g": grads})

    def adam_gather(d):
        mv_rows = d["mv"][d["r"]]
        m_rows = mv_rows[:, :W] * 0.9 + d["g"] * 0.1
        v_rows = mv_rows[:, W:] * 0.999 + jnp.square(d["g"]) * 0.001
        return d["t"][d["r"]] - 1e-3 * m_rows / (jnp.sqrt(v_rows) + 1e-8)

    res["adam_gather"] = time_op(adam_gather,
                                 {"mv": mv, "t": table, "r": rows, "g": grads})

    def report(name, t, denom):
        log(f"{name:16s} {1e3 * t:8.3f} ms   ({t / denom * 1e9:6.1f} ns per row x {denom:,})")

    for k2, t in res.items():
        report(k2, t, r)

    # --- scatter components (carried, DONATED state — without donation the
    # .at[].set copies the multi-GB operand and the 16 GB chip OOMs) ---
    def mk_scatter(rr, vals):
        @partial(jax.jit, donate_argnums=(0,))
        def step(st):
            t, m2, s = st
            val = (vals + (s * 1e-30)).astype(t.dtype)
            t = t.at[rr].set(val, mode="drop", indices_are_sorted=True)
            m2 = m2.at[rr].set(
                jnp.concatenate([val, val], axis=1), mode="drop",
                indices_are_sorted=True)
            return t, m2, s + t[0, 0] * 1e-12
        return lambda st: step((st[0], st[1], st[2]))

    def mk_adam_full(rr, g0):
        @partial(jax.jit, donate_argnums=(0,))
        def step(st):
            t, m2, s = st
            g = g0 + (s * 1e-30)
            t, m2 = sparse_adam_rows_packed(t, m2, rr, g, jnp.float32(1e-3))
            return t, m2, s + t[0, 0] * 1e-12
        return lambda st: step((st[0], st[1], st[2]))

    d_vals = jax.device_put(jnp.asarray(rng.standard_normal((r, W)).astype(np.float32)))
    res["adam_scatter"] = time_carried(
        mk_scatter(rows, d_vals), (table, mv, jnp.float32(0.0)))
    report("adam_scatter", res["adam_scatter"], r)

    table = jax.device_put(jnp.zeros((v, W), jnp.float32))
    mv = jax.device_put(jnp.zeros((v, 2 * W), jnp.float32))
    res["adam_full"] = time_carried(
        mk_adam_full(rows, grads), (table, mv, jnp.float32(0.0)))
    report("adam_full", res["adam_full"], r)

    # --- the capacity insight: uniques are bounded by sum_f min(size_f, B),
    # ~24.7k here, but dedupe_rows hands the update the full [R]=213k
    # sentinel-padded vector — 8.7x more scatter/gather rows than real ones.
    # Time the identical update on a [C]-sliced rows/grads to bound the win.
    cap = 1
    while cap < sum(min(int(s_), B) for s_ in sizes):
        cap *= 2
    cap = min(cap, r)
    log(f"capacity bound sum_f min(size_f, B) = "
        f"{sum(min(int(s_), B) for s_ in sizes):,} -> padded C = {cap:,}")
    table = jax.device_put(jnp.zeros((v, W), jnp.float32))
    mv = jax.device_put(jnp.zeros((v, 2 * W), jnp.float32))
    res["adam_full_cap"] = time_carried(
        mk_adam_full(rows[:cap], grads[:cap]), (table, mv, jnp.float32(0.0)))
    report("adam_full_cap", res["adam_full_cap"], cap)

    # --- the full step, same loop as _ablate_bigtable.run_sparse(packed) ---
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.fast_step import make_sparse_deepfm_step
    cfg = TowerConfig(
        feature_set=fs, embedding_size=K, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", table_padding=2048, packed_linear=True,
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    init_opt, step_fn = make_sparse_deepfm_step(model, learning_rate=0.001)
    opt_state = init_opt(params)
    fj = jax.jit(step_fn, donate_argnums=(0, 1))
    staged = batches(fs, 4, B, seed=2)
    key = jax.random.PRNGKey(1)
    si = lambda i: jnp.asarray(i, jnp.int32)
    p, o, loss = fj(params, opt_state, staged[0], jax.random.fold_in(key, 0), si(0))
    _ = float(loss)
    for i in range(5):
        p, o, loss = fj(p, o, staged[i % 4], jax.random.fold_in(key, i), si(i))
    _ = float(loss)
    steps = 60
    t0 = time.time()
    for i in range(steps):
        p, o, loss = fj(p, o, staged[i % 4], jax.random.fold_in(key, i), si(i))
    _ = float(loss)
    full = (time.time() - t0) / steps
    log(f"{'full_step':16s} {1e3 * full:8.3f} ms   (fixed-cost inclusive)")
    acc = res["fwd_gather"] + res["dedupe"] + res["adam_full"]
    log(f"table-side sum (fwd_gather+dedupe+adam_full) {1e3 * acc:8.3f} ms   "
        f"rest-of-step {1e3 * (full - acc):8.3f} ms")


if __name__ == "__main__":
    main()
