"""Production-scale table (6M rows, ~390M params): dense sweep vs sparse fast step."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from rectpu.features.schema import (GENRE, BucketizedFeature, FeatureSet,
                                    HashFeature, IdentityFeature, VocabFeature)
from rectpu.models import DeepFMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam

_SCALE = [1.0]  # "x2" CLI arg doubles the hashed vocabs (12M rows)

def big_feature_set():
    m = _SCALE[0]
    feats = [
        HashFeature("user_id", int(3_000_000 * m), dtype="int32"),
        HashFeature("item_id", int(2_500_000 * m), dtype="int32"),
        BucketizedFeature("age", tuple(range(15, 66, 10))),
        VocabFeature("gender", ("F", "M"), num_oov_buckets=1),
        HashFeature("occupation", 50),
        HashFeature("zipcode", int(500_000 * m), dtype="int32"),
        BucketizedFeature("release_year", tuple(range(1930, 1991, 10))),
    ]
    feats.extend(IdentityFeature(g, 2) for g in GENRE)
    return FeatureSet(categorical=tuple(feats))

def batches(fs, k, batch, seed=0):
    rng = np.random.default_rng(seed)
    offs, sizes = fs.offsets, fs.field_sizes
    out = []
    for i in range(k):
        ids = np.stack([offs[f] + rng.integers(0, sizes[f], size=batch)
                        for f in range(fs.num_fields)], axis=1).astype(np.int32)
        out.append({
            "cat_ids": jax.device_put(jnp.asarray(ids)),
            "num_vals": jax.device_put(jnp.zeros((batch, 0), jnp.float32)),
            "labels": jax.device_put(jnp.asarray((rng.random(batch) < 0.2).astype(np.float32))),
        })
    return out

def run_dense(steps=100, batch=8192):
    fs = big_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", packed_linear=True, table_padding=2048,
        table_grad_dtype="bfloat16", flat_layout=True, scatter_impl="mxu",
    )
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

    fj = jax.jit(train_one, donate_argnums=(0, 1))
    staged = batches(fs, 4, batch)
    p, o, loss = fj(params, opt_state, jnp.asarray(0, jnp.int32), staged[0])
    _ = float(loss)  # real fetch: block_until_ready can lie through the tunnel
    for i in range(5):
        p, o, loss = fj(p, o, jnp.asarray(i, jnp.int32), staged[i % 4])
    _ = float(loss)
    t0 = time.time()
    for i in range(steps):
        p, o, loss = fj(p, o, jnp.asarray(i, jnp.int32), staged[i % 4])
    _ = float(loss)
    dt = time.time() - t0
    print(f"dense 6M-row: {1e3*dt/steps:.3f} ms/step  {steps*batch/dt:,.0f} ex/s")

def run_sparse(steps=100, batch=8192, packed=False, scatter_backend="xla",
               slot_dtype="float32"):
    from rectpu.train.fast_step import make_sparse_deepfm_step
    fs = big_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", table_padding=2048, packed_linear=packed,
        # round-5 scatter law: lane-aligned widths scatter per-row; the odd
        # [V, 65] width pays a ~24 ms full-table pass per update
        packed_col_pad=128 if packed else 0,
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    init_opt, step_fn = make_sparse_deepfm_step(
        model, learning_rate=0.001, scatter_backend=scatter_backend,
        slot_dtype=slot_dtype)
    opt_state = init_opt(params)
    fj = jax.jit(step_fn, donate_argnums=(0, 1))
    staged = batches(fs, 4, batch, seed=2)
    rng = jax.random.PRNGKey(1)
    si = lambda i: jnp.asarray(i, jnp.int32)
    p, o, loss = fj(params, opt_state, staged[0], jax.random.fold_in(rng, 0), si(0))
    _ = float(loss)  # real fetch: block_until_ready can lie through the tunnel
    for i in range(5):
        p, o, loss = fj(p, o, staged[i % 4], jax.random.fold_in(rng, i), si(i))
    _ = float(loss)
    t0 = time.time()
    for i in range(steps):
        p, o, loss = fj(p, o, staged[i % 4], jax.random.fold_in(rng, i), si(i))
    _ = float(loss)
    dt = time.time() - t0
    print(f"sparse{'-packed' if packed else ''}"
          f"{'-dma' if scatter_backend == 'dma' else ''}"
          f"{'-bf16slots' if slot_dtype != 'float32' else ''} 6M-row: "
          f"{1e3*dt/steps:.3f} ms/step  {steps*batch/dt:,.0f} ex/s")

def run_sparse_ep(steps=100, batch=8192, ep_mode="2d"):
    """The SHARDED sparse code path on one chip (round-3 VERDICT item 1's
    single-chip HW number): packed table + the 2d EP exchange + the
    parallel/sparse_ep shard_map update, on a degenerate (1,1) mesh — the
    collectives are no-ops but the program structure (double dedup, masked
    routing, shard-level lazy Adam) is exactly what runs multi-chip."""
    from rectpu.parallel import ParallelPlan
    from rectpu.parallel.embedding_ep import make_ep_lookup_2d
    from rectpu.train.fast_step import make_sparse_step
    fs = big_feature_set()
    cfg = TowerConfig(
        feature_set=fs, embedding_size=64, hidden_units=(256, 128), dropout=0.1,
        compute_dtype="bfloat16", table_padding=2048, packed_linear=True,
    )
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    plan = ParallelPlan.create(1, 1, table_rows=cfg.padded_buckets)
    plan.ep = True
    plan.ep_mode = ep_mode
    if ep_mode == "dedup":
        from rectpu.parallel.embedding_ep import make_ep_lookup_dedup

        plan.lookup_fn = make_ep_lookup_dedup(plan.mesh)
    else:
        plan.lookup_fn = make_ep_lookup_2d(plan.mesh)
    init_opt, step_fn = make_sparse_step(model, learning_rate=0.001, plan=plan)
    opt_state = init_opt(params)
    fj = jax.jit(step_fn, donate_argnums=(0, 1))
    staged = batches(fs, 4, batch, seed=2)
    rng = jax.random.PRNGKey(1)
    si = lambda i: jnp.asarray(i, jnp.int32)
    p, o, loss = fj(params, opt_state, staged[0], rng, si(0))
    _ = float(loss)  # real fetch: block_until_ready can lie through the tunnel
    for i in range(5):
        p, o, loss = fj(p, o, staged[i % 4], rng, si(i))
    _ = float(loss)
    t0 = time.time()
    for i in range(steps):
        p, o, loss = fj(p, o, staged[i % 4], rng, si(i))
    _ = float(loss)
    dt = time.time() - t0
    print(f"sparse-EP-{ep_mode}(1x1) 6M-row: {1e3*dt/steps:.3f} ms/step  "
          f"{steps*batch/dt:,.0f} ex/s")

import bench as _bench
def use_scaled():
    global big_feature_set
    big_feature_set = _bench.scaled_feature_set

_RUNNERS = {
    "dense": run_dense,
    "sparse": run_sparse,
    "sparse-packed": lambda: run_sparse(packed=True),
    "sparse-dma": lambda: run_sparse(packed=True, scatter_backend="dma"),
    "sparse-bf16": lambda: run_sparse(packed=True, slot_dtype="bfloat16_sr"),
    "sparse-ep": run_sparse_ep,
    "sparse-ep-dedup": lambda: run_sparse_ep(ep_mode="dedup"),
}
if __name__ == "__main__":
    for a in sys.argv[1:] or ["dense", "sparse"]:
        if a == "scaled":
            use_scaled(); continue
        if a == "x2":
            _SCALE[0] = 2.0; continue
        if a == "x15":
            _SCALE[0] = 1.5; continue
        _RUNNERS[a]()
