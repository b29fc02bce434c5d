"""High-throughput training step with sparse table updates.

The generic Trainer step differentiates through the embedding gather, so the
table gradient materializes as a full dense [V, K] (zeros + scatter-add) and
the optimizer sweeps every row — ~2 ms of a 7.5 ms step at the scaled config
for a table where a batch touches <8% of rows.

MEASURED VERDICT (v5e, re-measured round 3 with honest fetch-synced timing):
the dense path WINS far longer than round 2 believed — random-row
scatter/gather on TPU costs ~0.3 us/row at big-table scale, so the ~25k
touched rows' six state round-trips cost ~110-170 ms at a 6M-row table
while the dense sweep costs 22 ms. (Round 2 recorded "1.77 ms sparse at 6M
rows"; that was a block_until_ready sync lie — RESULTS.md round 3.) This
module was therefore called a CAPACITY feature in rounds 3-4. ROUND-5
REVISION: that verdict rested on odd-width XLA scatters (a full-table pass
at [V, 65]/[V, 130]); with LANE-ALIGNED state (the m|v slab pads each half
to 128 cols, ``packed_col_pad`` pads the table) the scatters are per-row
and the sparse step is ~V-flat — 38 ms at 6M rows vs 93 before — crossing
the V-linear dense sweep at ~13M rows (~850M elements) per shard. Trainers
expose it as ``--fast-step {auto,on,off}`` with auto = that measured
crossover. Tests pin its exact lazy-Adam semantics either way.

This step restructures the computation:
  1. gather the (fused linear+embedding) rows OUTSIDE the differentiated
     function — locally (ops/embedding.embedding_lookup) or, given a
     ``ParallelPlan`` with EP, through the sharded exchange (plan.lookup_fn);
  2. differentiate w.r.t. the GATHERED rows and the small dense params;
  3. dedupe the batch ids (sort + segment-sum) and apply TF-style lazy Adam
     to exactly the touched rows (rectpu/train/sparse.py) — per table SHARD
     when EP is on, with the deduped rows + cotangents riding the same
     all_to_all pattern as the forward (rectpu/parallel/sparse_ep.py);
  4. dense Adam for the MLP/bias params (tiny).

Semantics: identical to dense Adam on step 1 from zero state; thereafter it
is lazy Adam — untouched rows keep stale m/v and receive no step, matching
``tf.train.AdamOptimizer._apply_sparse`` (what the reference's estimators run
for embedding variables; the EP composition replaces the reference's sparse
gradient push to parameter servers, /root/reference/distributed.md:43-58).
The model math is each model's ``apply_looked`` hook — the same tower code
the generic step runs, fed pre-gathered rows (DeepFM/DNN/DLRM/DCN all expose
it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rectpu.ops.embedding import embedding_lookup
from rectpu.train import metrics as metrics_lib
from rectpu.train.sparse import (adam_lr_t, dedupe_rows,
                                 sparse_adam_rows_packed, unique_capacity)


def make_sparse_step(
    model,
    learning_rate: float = 0.001,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    plan=None,
    loss_reduction: str = "mean",
    scatter_backend: str = "auto",
    state_pad: bool | None = None,
    slot_dtype: str = "float32",
):
    """Build (init_opt_state, step) for any model exposing ``apply_looked``
    (DeepFM, DNN, DLRM, DCN) with Adam.

    Fused-linear models (DeepFM) require either ``cfg.packed_linear`` (the
    single [V, K+1] table leaf) or ``cfg.fuse_linear_lookup`` (emb + linear.w
    concatenated per step); models without a linear tower update only the
    [V, K] table.

    ``plan``: a ParallelPlan. With EP on, the gather runs through
    plan.lookup_fn (the sharded exchange) and the lazy-Adam table update
    through the shard-level deduped exchange (parallel/sparse_ep.py); the
    table must then be a SINGLE sharded leaf — packed_linear for DeepFM, the
    plain [V, K] table for linear-less models.
    """
    cfg = model.cfg
    if not hasattr(model, "apply_looked"):
        raise ValueError(
            f"{model.name}: sparse fast step needs an apply_looked hook")
    use_linear = bool(getattr(model, "use_linear", False))
    packed = bool(getattr(model, "packed", False))
    if use_linear and not (packed or cfg.fuse_linear_lookup):
        raise ValueError(
            "sparse fast step requires fuse_linear_lookup=True or packed_linear=True"
        )
    ep = plan is not None and getattr(plan, "ep", False)
    if ep and use_linear and not packed:
        raise ValueError(
            "sparse EP fast step with a linear tower needs packed_linear=True "
            "(one sharded [V, K+1] leaf; per-step concat of a sharded emb with "
            "a replicated w would dense-materialize the table)"
        )
    if loss_reduction not in ("mean", "sum"):
        raise ValueError(f"loss_reduction must be mean|sum, got {loss_reduction}")
    k = cfg.embedding_size
    fs = cfg.feature_set
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
    table_key = "table" if packed else "emb"

    # the first droppable row id: real ids live in [0, total_buckets); the
    # rows between total_buckets and padded_buckets are the pad region the
    # DMA scatter's sentinel windows land in
    v_valid = int(fs.offsets[-1]) + int(fs.field_sizes[-1])
    pad_rows = cfg.padded_buckets - v_valid
    if scatter_backend not in ("auto", "xla", "dma"):
        raise ValueError(f"scatter_backend must be auto|xla|dma, got "
                         f"{scatter_backend!r}")
    # ROUND-5 SCATTER MODEL (benchmarks/_ablate_scatter_dma, RESULTS.md):
    # XLA's .at[].set is per-row fast (~70 ns/row, V-independent) at
    # 128-MULTIPLE widths and a full-table pass (~8 ns x table-byte) at odd
    # widths; the DMA window-RMW kernel (ops/scatter_dma) is ~110 ns/row,
    # also 128-multiple-only (Mosaic wall #4: even full-width slices must
    # be lane-aligned), and wins only for small update counts. The big-V
    # fix is therefore LAYOUT: the m|v slab lane-pads to [V, 2*128] below,
    # and 'auto' stays on the XLA scatter.
    if scatter_backend == "auto":
        scatter_backend = "xla"
    elif scatter_backend == "dma":
        if pad_rows < 8:
            raise ValueError(
                f"scatter_backend='dma' needs >= 8 pad rows past the id "
                f"space (padded_buckets {cfg.padded_buckets} - ids "
                f"{v_valid} = {pad_rows}); raise table_padding")
    # lane-pad the packed m|v slab on big tables: +~31% optimizer-state
    # memory buys the per-row scatter (47 -> 1.4 ms at [6M, 130] f32).
    if state_pad is None:
        # the dma backend requires lane-aligned slabs outright; otherwise
        # pad once the table is big enough for the odd-width scatter
        # penalty to matter
        state_pad = (scatter_backend == "dma"
                     or cfg.padded_buckets >= 1_000_000)
    # EP: the mv slab pads too (its per-shard scatter obeys the same
    # width law; sparse_ep reads the layout from the slab width), and the
    # TABLE col-pad composes as well — the fast step rides the NON-flat
    # exchanges, which move full-width rows and slice by index downstream,
    # so a [V/m, 128] shard's p scatter is per-row on every shard. Only
    # the FLAT exchange variants infer K from the table width; those are
    # the one incompatible combination.
    if ep and getattr(cfg, "packed_col_pad", 0) and cfg.flat_layout:
        raise ValueError(
            "packed_col_pad + flat_layout is not supported under EP "
            "sharding: the flat exchange variants infer K from the table "
            "width (parallel/embedding_ep). Drop flat_layout or the pad."
        )
    # bf16 m|v slab: halves optimizer-state HBM (the capacity enabler for
    # beyond-HBM tables — [12M, 256] f32 slots alone are 12.3 GB); v rides
    # stochastic rounding, m plain bf16 (sparse.sparse_adam_rows_packed)
    if slot_dtype not in ("float32", "bfloat16_sr"):
        raise ValueError(f"slot_dtype must be float32|bfloat16_sr, got "
                         f"{slot_dtype!r}")
    if slot_dtype == "bfloat16_sr" and ep:
        raise ValueError("bf16 slots are not wired into the EP exchange yet")
    mv_dtype = jnp.bfloat16 if slot_dtype == "bfloat16_sr" else None

    ep_update = None
    if ep:
        from rectpu.parallel.sparse_ep import make_sparse_rows_ep

        ep_update = make_sparse_rows_ep(
            plan.mesh,
            batch_2d=plan.ep_mode in ("2d", "dedup"),
            beta1=beta1, beta2=beta2, epsilon=epsilon,
            # exact unique_capacity slices inside the exchange (same contract
            # as the local branch below: ids in their field ranges)
            field_sizes=field_info[1],
        )

    def split_params(params):
        sparse = {table_key: params[table_key]}
        rest = {
            kk: vv for kk, vv in params.items() if kk not in (table_key, "linear")
        }
        if use_linear:
            if packed:
                rest["linear_rest"] = dict(params["linear"])
            else:
                sparse["w"] = params["linear"]["w"]
                rest["linear_rest"] = {
                    kk: vv for kk, vv in params["linear"].items() if kk != "w"
                }
        return sparse, rest

    def join_params(sparse, rest):
        params = {kk: vv for kk, vv in rest.items() if kk != "linear_rest"}
        params[table_key] = sparse[table_key]
        if use_linear:
            params["linear"] = dict(rest["linear_rest"])
            if not packed:
                params["linear"]["w"] = sparse["w"]
        return params

    def init_opt_state(params):
        sparse, rest = split_params(params)

        def mv0(leaf):
            # m and v PACKED as one [V, 2W] slab: halves the per-row state
            # passes of the lazy update (see sparse_adam_rows_packed).
            # Big-table slabs LANE-PAD each half to a 128 multiple so the
            # per-step scatter is per-row instead of a full-table pass
            # (round-5 scatter model above); sparse_adam_rows_packed reads
            # the layout from the slab width.
            w = leaf.shape[1] if leaf.ndim == 2 else 1
            wp = -(-w // 128) * 128 if (state_pad and leaf.ndim == 2) else w
            dt = mv_dtype if (mv_dtype is not None and leaf.ndim == 2) else leaf.dtype
            return jnp.zeros((leaf.shape[0], 2 * wp), dt)

        return {"m": {"rest": jax.tree.map(jnp.zeros_like, rest)},
                "v": {"rest": jax.tree.map(jnp.zeros_like, rest)},
                "mv_sparse": jax.tree.map(mv0, sparse),
                "t": jnp.zeros((), jnp.int32)}

    def step(params, opt_state, batch, rng, step_idx):
        sparse, rest = split_params(params)
        ids = batch["cat_ids"]
        dtype = cfg.jnp_compute_dtype

        if use_linear and not packed:
            table = jnp.concatenate([sparse["emb"], sparse["w"][:, None]], axis=1)
        else:
            table = sparse[table_key]
        if ep:
            looked = plan.lookup_fn(table, ids)
        else:
            looked = embedding_lookup(
                table, ids, impl=cfg.embedding_impl, field_info=field_info
            )

        step_rng = jax.random.fold_in(rng, step_idx)

        def loss_fn(rest_p, looked_p):
            # the table enters only through `looked`; placeholders keep the
            # tree shape
            holes = {table_key: None}
            if use_linear and not packed:
                holes["w"] = None
            model_params = join_params(holes, rest_p)
            lp = looked_p.astype(dtype) if dtype is not None else looked_p
            logits = model.apply_looked(model_params, lp, batch, train=True, rng=step_rng)
            losses = metrics_lib.sigmoid_xent(logits, batch["labels"])
            if "weights" in batch:
                w = batch["weights"]
                return jnp.sum(losses * w) / jnp.maximum(jnp.sum(w), 1.0)
            if loss_reduction == "sum":
                return losses.sum()
            return losses.mean()

        (loss, (drest, dlooked)) = jax.value_and_grad(loss_fn, argnums=(0, 1))(rest, looked)

        t = opt_state["t"] + 1
        lr_t = adam_lr_t(learning_rate, t, beta1, beta2)

        # dense Adam on the small params
        m_rest = jax.tree.map(
            lambda m_, g: beta1 * m_ + (1 - beta1) * g, opt_state["m"]["rest"], drest
        )
        v_rest = jax.tree.map(
            lambda v_, g: beta2 * v_ + (1 - beta2) * g * g, opt_state["v"]["rest"], drest
        )
        rest = jax.tree.map(
            lambda p, m_, v_: p - lr_t * m_ / (jnp.sqrt(v_) + epsilon), rest, m_rest, v_rest
        )

        # lazy Adam on exactly the touched table rows (m/v packed per leaf)
        mv_sp = opt_state["mv_sparse"]
        if ep:
            tbl_new, mv_tbl = ep_update(
                sparse[table_key], mv_sp[table_key], ids, dlooked, lr_t,
            )
            new_sparse = {table_key: tbl_new}
            mv_sp_new = {table_key: mv_tbl}
        else:
            v_rows = table.shape[0]
            cols = dlooked.shape[-1]
            # uniques occupy the first sum_f min(size_f, B) slots, so the
            # dedupe builds its [cap, W] result DIRECTLY (round 5: skips
            # ~190 MB of mostly-zero segment-sum output at the big config)
            # instead of a full [R, W] later sliced. Exact ONLY for ids
            # inside their field's [offset, offset+size) range —
            # guaranteed by FeatureSet.encode, guarded by
            # sparse.check_ids_in_field_ranges (unique_capacity's
            # PRECONDITION note).
            cap = unique_capacity(
                field_info[1], ids.shape[0], ids.shape[0] * ids.shape[1])
            rows, row_grads = dedupe_rows(
                ids.reshape(-1), dlooked.reshape(-1, cols).astype(jnp.float32),
                v_rows, num_out=cap,
            )
            if packed or not use_linear:
                tbl_new, mv_tbl = sparse_adam_rows_packed(
                    sparse[table_key], mv_sp[table_key],
                    rows, row_grads, lr_t, beta1, beta2, epsilon,
                    scatter_backend=scatter_backend, v_valid=v_valid,
                    sr_seed=t,
                )
                new_sparse = {table_key: tbl_new}
                mv_sp_new = {table_key: mv_tbl}
            else:
                emb_new, mv_emb = sparse_adam_rows_packed(
                    sparse["emb"], mv_sp["emb"], rows, row_grads[:, :k],
                    lr_t, beta1, beta2, epsilon,
                )
                w_new, mv_w = sparse_adam_rows_packed(
                    sparse["w"], mv_sp["w"], rows, row_grads[:, k],
                    lr_t, beta1, beta2, epsilon,
                )
                new_sparse = {"emb": emb_new, "w": w_new}
                mv_sp_new = {"emb": mv_emb, "w": mv_w}

        params = join_params(new_sparse, rest)
        opt_state = {
            "m": {"rest": m_rest},
            "v": {"rest": v_rest},
            "mv_sparse": mv_sp_new,
            "t": t,
        }
        return params, opt_state, loss

    return init_opt_state, step


# historical name (the step was DeepFM-only before the zoo grew apply_looked)
make_sparse_deepfm_step = make_sparse_step
