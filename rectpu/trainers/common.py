"""Shared CLI harness for the four trainers.

Preserves the reference trainers' CLI contract (flags, defaults, job-dir
wipe-unless---restore semantics; e.g. /root/reference/trainers/deep_fm.py:181-209)
while adding TPU-framework knobs (batch scaling, step-based cadence, kernel
impl selection, mesh shape) behind new optional flags.
"""

from __future__ import annotations

import shutil
from argparse import ArgumentParser
from pathlib import Path

from rectpu.utils.logging import get_logger

logger = get_logger("rectpu.trainers")


def add_common_args(parser: ArgumentParser, job_dir_default: str) -> None:
    parser.add_argument("--train-csv", default="data/ml-100k/train.csv",
                        help="path to the training csv data (default: %(default)s)")
    parser.add_argument("--test-csv", default="data/ml-100k/test.csv",
                        help="path to the test csv data (default: %(default)s)")
    parser.add_argument("--job-dir", default=job_dir_default,
                        help="job directory (default: %(default)s)")
    parser.add_argument("--restore", action="store_true",
                        help="whether to restore from job_dir")
    parser.add_argument("--batch-size", type=int, default=32,
                        help="batch size (default: %(default)s)")
    parser.add_argument("--train-steps", type=int, default=20000,
                        help="number of training steps (default: %(default)s)")
    # framework extensions (not in the reference CLI)
    parser.add_argument("--eval-batch-size", type=int, default=None,
                        help="eval batch size (default: max(batch, 512))")
    parser.add_argument("--save-checkpoints-secs", type=float, default=60.0,
                        help="wall-clock checkpoint+eval cadence (default: %(default)s)")
    parser.add_argument("--save-checkpoints-steps", type=int, default=None,
                        help="step-based checkpoint+eval cadence (overrides secs)")
    parser.add_argument("--steps-per-loop", type=int, default=100,
                        help="device steps per host-loop iteration (default: %(default)s)")
    parser.add_argument("--seed", type=int, default=42, help="PRNG seed")
    parser.add_argument("--loss-reduction", default="mean", choices=["mean", "sum"],
                        help="per-batch loss reduction; 'sum' = TF-1.x head semantics")
    parser.add_argument("--embedding-impl", default="auto",
                        choices=["auto", "take", "onehot", "pallas", "split"],
                        help="embedding lookup kernel (default: %(default)s)")
    parser.add_argument("--fm-impl", default="auto", choices=["auto", "xla", "pallas"],
                        help="FM-cross kernel (default: %(default)s)")
    parser.add_argument("--compute-dtype", default=None, choices=[None, "bfloat16"],
                        help="tower compute dtype (default: float32)")
    parser.add_argument("--table-grad-dtype", default=None, choices=[None, "bfloat16"],
                        help="dtype of the dense embedding-table gradient "
                             "(split lookup only; bfloat16 halves the table-grad "
                             "path's memory traffic, ~25%% step win at the scaled "
                             "config; default: float32)")
    parser.add_argument("--table-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="storage dtype of the embedding-table MASTER param. "
                             "bfloat16 halves table memory (fp32 Adam math + "
                             "stochastically-rounded downcast) — a CAPACITY "
                             "feature for very large vocabs: measured perf-"
                             "neutral at the scaled bench config and -0.006 "
                             "test AUC at reference defaults. Adam only. "
                             "default: %(default)s")
    parser.add_argument("--table-store", default="float32",
                        choices=["float32", "bfloat16"],
                        help="storage dtype of the table the FORWARD reads. "
                             "bfloat16 keeps the fp32 master in the optimizer "
                             "state (exact fp32 training, unlike --table-dtype) "
                             "and skips the per-step full-table f32->bf16 "
                             "gather recast — the bf16 copy is emitted fused "
                             "with the optimizer write-back. Requires "
                             "--compute-dtype bfloat16. default: %(default)s")
    parser.add_argument("--data-placement", choices=["auto", "host", "device"],
                        default="auto",
                        help="'device' keeps the encoded train set device-"
                             "resident and ships only [B] row indices per "
                             "step (batch gathered on device — removes the "
                             "per-step host->device transfer); 'host' ships "
                             "materialized batches; 'auto' = device when "
                             "single-process, unsharded and the dataset fits "
                             "(1 GB cap). Training is IDENTICAL either way "
                             "(both consume the same index stream)")
    parser.add_argument("--streaming-io", action="store_true",
                        help="out-of-core input pipeline: parse+encode CSV in "
                             "windowed chunks with background prefetch instead "
                             "of loading the dataset resident (for datasets "
                             "larger than host RAM)")
    parser.add_argument("--num-data-shards", type=int, default=1,
                        help="data-parallel mesh size (1 = single device)")
    parser.add_argument("--num-model-shards", type=int, default=1,
                        help="embedding (EP) mesh size (1 = unsharded tables)")
    parser.add_argument("--tp-mlp", action="store_true",
                        help="tensor-parallel dense towers: MLP kernels "
                             "alternate column/row sharding over the 'model' "
                             "axis (Megatron style, GSPMD collectives). Only "
                             "pays at much wider towers than the reference "
                             "defaults - see docs/distributed.md")
    parser.add_argument("--ep-mode", default="2d", choices=["1d", "2d", "dedup"],
                        help="EP exchange: '2d' dense reduce_scatter (DLRM), 'dedup' "
                             "unique-row all_to_all (wide K), '1d' masked gather+psum")
    parser.add_argument("--ep-peer-capacity", default=None,
                        help="dedup EP exchange: static request slots per "
                             "peer (int), or 'auto' to size from train-set "
                             "statistics (expected unique rows of the busiest "
                             "shard x1.5; parallel/placement.py). Default: "
                             "the provably-lossless bound (exact but large); "
                             "smaller values DROP overflow ids to zero "
                             "embeddings (MoE capacity contract)")
    parser.add_argument("--ep-row-placement", default="none",
                        choices=["none", "freq"],
                        help="'freq': RecShard-style frequency-aware row "
                             "placement — count train-set lookups per row and "
                             "deal each field's rows, hottest first, round-"
                             "robin across the EP table shards (within-field "
                             "permutation; balances hot-row traffic and dedup "
                             "capacity). Saved to <job-dir>/row_perm.npy and "
                             "carried through exports for serving")
    parser.add_argument("--ep-comm-compress", default=None,
                        choices=["bf16", "int8"],
                        help="lossy ICI wire format for the EP activation "
                             "exchange: 'bf16' halves the bytes (any --ep-mode "
                             "2d/dedup; exact when the table is bf16), 'int8' "
                             "per-row quantized rows, ~3.8x fewer bytes "
                             "(--ep-mode dedup only; backward cotangents ride "
                             "bf16 — dual-level error bounds)")
    parser.add_argument("--warm-start-from", default=None,
                        help="initialize params from a previous run's export "
                             "dir, job dir, or ckpt-N directory "
                             "(tf WarmStartSettings parity; a restored "
                             "checkpoint in --job-dir still wins)")
    parser.add_argument("--warm-start-vars", nargs="*", default=None,
                        help="tree-path prefixes to warm start (e.g. 'emb' "
                             "'linear'); default: every matching leaf "
                             "(tf vars_to_warm_start parity)")
    parser.add_argument("--exporter", choices=["latest", "best"], default="latest",
                        help="'latest' exports after every eval (reference "
                             "LatestExporter cadence); 'best' only when the "
                             "eval metric improves (tf BestExporter parity)")
    parser.add_argument("--best-exporter-metric", default="auc",
                        help="eval metric the 'best' exporter compares "
                             "(lower-is-better for average_loss)")
    parser.add_argument("--eval-auc", choices=["streaming", "exact"],
                        default="streaming",
                        help="'streaming' = 200-threshold tf.metrics.auc parity "
                             "(within ~0.005 of exact); 'exact' = rank-based AUC "
                             "on the gathered eval probabilities - use for "
                             "parity-gate runs (single-process only)")
    parser.add_argument("--autotune", action="store_true",
                        help="benchmark kernel impls at the working shapes and pin winners")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler device trace of the first host loop here")
    parser.add_argument("--compilation-cache-dir", default="/tmp/jax_cache",
                        help="persistent XLA compilation cache ('' disables)")


def add_deep_args(parser: ArgumentParser) -> None:
    parser.add_argument("--embedding-size", type=int, default=4,
                        help="embedding size (default: %(default)s)")
    parser.add_argument("--hidden-units", type=int, nargs="+", default=[16, 16],
                        help="hidden layer specification (default: %(default)s)")
    parser.add_argument("--dropout", type=float, default=0.1,
                        help="dropout rate (default: %(default)s)")
    parser.add_argument("--dropout-impl", choices=["threefry", "hash"],
                        default="threefry",
                        help="dropout mask source: 'hash' swaps the threefry "
                             "bernoulli for a counter-based murmur mask "
                             "(~8 VPU ops/element vs ~100; a different but "
                             "equally-valid Bernoulli stream)")
    parser.add_argument("--flat-layout", action="store_true",
                        help="lane-packed [B, F*K] looked activations: no "
                             "[B, F, K+1] tile padding anywhere in the "
                             "lookup->towers chain; with --ep-mode 2d the "
                             "sharded lookup upgrades to a lane-packed "
                             "exchange (half the reduce_scatter bytes); "
                             "incompatible with --numeric-columns")
    parser.add_argument("--scatter-impl", choices=["xla", "mxu", "auto"],
                        default="xla",
                        help="flat-layout table-cotangent builder: 'mxu' rebuilds "
                             "the dense grad with sorted one-hot MXU matmuls "
                             "(ops/scatter_rows) instead of XLA's serial scatter; "
                             "sets table_padding=2048 for an exact tile grid. "
                             "'auto' defers to the --autotune pin (xla until "
                             "autotune runs)")
    parser.add_argument("--preset", choices=["scaled"], default=None,
                        help="flag bundle. 'scaled' = the measured production "
                             "configuration (bench.py's): --flat-layout, "
                             "--scatter-impl mxu, --compute-dtype bfloat16, "
                             "--table-grad-dtype bfloat16, --dropout-impl hash, "
                             "--packed-linear, and (where supported) "
                             "--optimizer-slot-dtype bfloat16-sr — ~2-3x faster "
                             "than the parity defaults at the scaled config "
                             "(RESULTS.md). Only knobs still at their defaults "
                             "are overridden, so individual flags can be set "
                             "alongside. NOTE bf16 compute/grads, hash dropout "
                             "and bf16-sr slots change the math vs exact TF "
                             "parity (AUC-validated, RESULTS.md); flat layout, "
                             "mxu scatter and packed tables are bitwise-safe")
    parser.add_argument("--fast-step", choices=["auto", "on", "off"], default="auto",
                        help="sparse lazy-Adam training step (train/fast_step): "
                             "gathers rows outside the differentiated function and "
                             "updates only the touched table rows — TF "
                             "_apply_sparse semantics. Composes with EP sharding "
                             "(--num-model-shards >1: deduped rows + cotangents "
                             "ride an all_to_all to the owning shard, "
                             "parallel/sparse_ep). 'auto' = on when the table "
                             "exceeds ~850M elements PER SHARD (~13M rows at "
                             "K=64 — the round-5 measured crossover with "
                             "lane-aligned state; dense sweeps "
                             "win far longer than naive timing suggested — "
                             "RESULTS.md round 3) and the run is Adam-"
                             "compatible; 'on' forces it (errors on "
                             "incompatibility). Adam only; fp32 table/slots")
    parser.add_argument("--sparse-scatter", choices=["auto", "xla", "dma"],
                        default="auto",
                        help="state scatter backend for the sparse fast step: "
                             "xla (.at[].set — a full-table pass at big V) or "
                             "dma (ops/scatter_dma window-RMW kernel, "
                             "table-size-independent; bitwise-equal). auto "
                             "picks dma on TPU past ~1M rows "
                             "(default: %(default)s)")


# --preset scaled: knob -> (parser default, preset value). Only knobs still
# at their default are overridden so explicit flags compose with the preset.
_SCALED_PRESET = {
    "compute_dtype": (None, "bfloat16"),
    "table_grad_dtype": (None, "bfloat16"),
    "flat_layout": (False, True),
    "packed_linear": (False, True),
    "scatter_impl": ("xla", "mxu"),
    "dropout_impl": ("threefry", "hash"),
    "optimizer_slot_dtype": (None, "bfloat16-sr"),
}


def apply_preset(args):
    """Resolve --preset into concrete flag values (call FIRST in each
    trainer's train_and_evaluate, before the TowerConfig is built).

    The 'scaled' bundle reproduces bench.py's measured production
    configuration so the user-visible CLI reaches the benchmarked speed
    instead of running the parity-exact defaults ~2-3x slower (round-2
    VERDICT weak #3). See the --preset help text for which knobs change
    math vs TF parity.
    """
    if getattr(args, "preset", None) != "scaled":
        return args
    applied = []
    for knob, (default, value) in _SCALED_PRESET.items():
        if hasattr(args, knob) and getattr(args, knob) == default:
            setattr(args, knob, value)
            applied.append(knob)
    # remembered so flag validators can tell preset-injected values from
    # user-typed ones (e.g. the fast step ignores the preset's slot dtype
    # instead of erroring on a flag the user never passed)
    args._preset_applied = tuple(applied)
    logger.info("preset scaled: %s",
                ", ".join(f"{k}={getattr(args, k)}" for k in applied))
    return args


def _resolve_fast_step(args, model, plan, optimizer):
    """Build the (init, step) pair for --fast-step, or None.

    'auto' turns the sparse step on when the table is past the measured
    dense-sweep crossover (~100M elements, RESULTS.md / train/fast_step.py)
    AND the run is compatible; incompatibilities silently keep the dense step
    (auto must not break Adagrad/bf16 runs on big tables). 'on' raises on
    incompatibility instead so the user learns why.
    """
    mode = getattr(args, "fast_step", "off") or "off"
    if mode == "off":
        return None

    def fail(msg):
        if mode == "on":
            raise ValueError(f"--fast-step on: {msg}")
        logger.info("--fast-step auto: staying on the dense step (%s)", msg)
        return None

    if not hasattr(model, "apply_looked"):
        return fail(f"{model.name} has no apply_looked hook")
    cols = model.cfg.embedding_size + (1 if getattr(model, "use_linear", False) else 0)
    # Crossover RE-DERIVED round 5 from the width-keyed scatter law
    # (RESULTS.md round-5 sparse-step outcome): with lane-aligned state the
    # sparse step is ~V-flat (38 ms at 6M, +~1.1 ms/M) while the dense
    # sweep is V-linear (+3.45 ms/M) — they cross at ~13M rows/shard
    # (~850M elements at the flagship K=64). Below that the dense sweep
    # wins outright; above it sparse wins on speed AND is the only option
    # once p/m/v no longer fit per-shard HBM.
    elems_per_shard = (
        model.cfg.padded_buckets * cols
        // max(getattr(args, "num_model_shards", 1), 1)
    )
    if mode == "auto" and elems_per_shard < 850_000_000:
        return None
    if optimizer.name != "Adam":
        return fail(f"requires Adam (got {optimizer.name}); the sparse step IS "
                    "lazy Adam (tf _apply_sparse semantics)")
    slot_dtype = "float32"
    if getattr(args, "optimizer_slot_dtype", None):
        if "optimizer_slot_dtype" in getattr(args, "_preset_applied", ()):
            # --preset scaled injected it for the DENSE sweep; the sparse
            # step defaults to exact fp32 rows — only an explicit flag
            # opts the packed slab into bf16
            logger.info("fast step: ignoring the preset's bf16-sr slot dtype "
                        "(sparse rows keep fp32 m/v; pass the flag "
                        "explicitly for the bf16 slab)")
        elif args.optimizer_slot_dtype in ("bfloat16-sr", "bfloat16_sr"):
            # round-5: the packed m|v slab supports bf16 with stochastically
            # rounded v (halves optimizer-state HBM — the capacity layout)
            slot_dtype = "bfloat16_sr"
            logger.info("fast step: bf16 m|v slab (v stochastically rounded)")
        else:
            return fail("sparse rows support float32 or bfloat16-sr slots; "
                        f"got {args.optimizer_slot_dtype}")
    if getattr(args, "table_dtype", "float32") != "float32" or \
            getattr(args, "table_store", "float32") != "float32":
        return fail("needs fp32 tables (no bf16 master/store)")
    if plan is not None and plan.ep and getattr(model, "use_linear", False) \
            and not getattr(model, "packed", False):
        return fail("EP sharding with a linear tower needs the single fused "
                    "table leaf; add --packed-linear")
    from rectpu.train.fast_step import make_sparse_step

    fns = make_sparse_step(
        model,
        learning_rate=getattr(args, "learning_rate", 0.001),
        plan=plan,
        loss_reduction=getattr(args, "loss_reduction", "mean"),
        scatter_backend=getattr(args, "sparse_scatter", "auto"),
        slot_dtype=slot_dtype,
    )
    logger.info("fast step on: sparse lazy-Adam table updates%s",
                " over the EP exchange" if (plan is not None and plan.ep) else "")
    return fns


def _has_checkpoint(job_dir) -> bool:
    from rectpu.train.checkpoint import Checkpointer

    return Checkpointer(job_dir).latest_step() is not None


def build_trainer(args, model, optimizer=None):
    """Assemble datasets + Trainer + exporter from parsed args and a model."""
    from rectpu.io.loader import CsvDataset
    from rectpu.serve.export import make_exporter
    from rectpu.train.loop import TrainConfig, Trainer

    if (getattr(args, "packed_col_pad", 0)
            and getattr(args, "num_model_shards", 1) > 1
            and getattr(args, "flat_layout", False)):
        raise ValueError(
            "--packed-col-pad + --flat-layout is not supported with "
            "--num-model-shards > 1: the flat EP exchange variants infer K "
            "from the table width. Drop one of the two.")

    if getattr(args, "compilation_cache_dir", None):
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", args.compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    if getattr(args, "autotune", False):
        from rectpu.ops.autotune import autotune

        cfg = model.cfg
        fs2 = cfg.feature_set
        autotune(
            batch=args.batch_size,
            num_fields=cfg.num_fields,
            embedding_size=cfg.embedding_size,
            vocab_rows=cfg.padded_buckets,
            field_info=(tuple(int(o) for o in fs2.offsets), tuple(fs2.field_sizes)),
        )

    if not args.restore:
        shutil.rmtree(args.job_dir, ignore_errors=True)
    Path(args.job_dir).mkdir(parents=True, exist_ok=True)

    fs = model.cfg.feature_set
    if getattr(args, "streaming_io", False):
        from rectpu.io.loader import StreamingCsvDataset

        train_ds = StreamingCsvDataset(args.train_csv, fs)
        eval_ds = StreamingCsvDataset(args.test_csv, fs)
    else:
        train_ds = CsvDataset(args.train_csv, fs)
        eval_ds = CsvDataset(args.test_csv, fs)

    import numpy as np

    row_perm = None
    perm_path = Path(args.job_dir) / "row_perm.npy"
    post_perm_counts = None  # post-relabel histogram, reused by capacity auto
    if getattr(args, "ep_row_placement", "none") == "freq":
        from rectpu.parallel.placement import (
            count_row_frequencies,
            frequency_permutation,
        )

        if args.num_model_shards <= 1:
            raise ValueError("--ep-row-placement freq requires --num-model-shards > 1")
        if perm_path.exists():
            # restored run: the relabeling must match the checkpointed table
            row_perm = np.load(perm_path)
        else:
            if args.restore and _has_checkpoint(args.job_dir):
                # a checkpoint exists but was trained WITHOUT placement —
                # computing a fresh perm would remap ids against an
                # unrelabeled restored table (silent corruption)
                raise ValueError(
                    "--ep-row-placement freq with --restore, but the job dir "
                    "has a checkpoint and no row_perm.npy: the checkpoint was "
                    "trained without placement. Drop the flag or start fresh."
                )
            if not hasattr(train_ds, "cat_ids"):
                raise ValueError(
                    "--ep-row-placement freq needs a resident dataset "
                    "(incompatible with --streaming-io: counting requires a "
                    "full pass; precompute row_perm.npy offline instead)"
                )
            fs2 = model.cfg.feature_set
            counts = count_row_frequencies(train_ds.cat_ids, model.cfg.padded_buckets)
            row_perm = frequency_permutation(
                counts,
                (tuple(int(o) for o in fs2.offsets), tuple(fs2.field_sizes)),
                args.num_model_shards,
                model.cfg.padded_buckets,
            )
            # atomic write, process 0 only: every process derives the same
            # perm from the same resident CSV, but concurrent np.save to the
            # shared path could expose a torn file to a later-starting reader
            import os

            import jax as _jax

            if _jax.process_index() == 0:
                tmp_perm = perm_path.parent / f".row_perm.{os.getpid()}.tmp.npy"
                np.save(tmp_perm, row_perm)
                os.replace(tmp_perm, perm_path)
            # relabel the histogram instead of re-scanning the dataset below
            post_perm_counts = np.zeros_like(counts)
            post_perm_counts[row_perm[: counts.shape[0]]] = counts
        train_ds.apply_row_permutation(row_perm)
        eval_ds.apply_row_permutation(row_perm)
    elif perm_path.exists():
        # the checkpoint/export in this job dir was trained with placement;
        # ignoring the stored map would index the permuted table with raw ids
        logger.info("applying stored row placement from %s", perm_path)
        row_perm = np.load(perm_path)
        train_ds.apply_row_permutation(row_perm)
        eval_ds.apply_row_permutation(row_perm)

    peer_capacity = getattr(args, "ep_peer_capacity", None)
    if peer_capacity == "auto":
        from rectpu.parallel.placement import count_row_frequencies, suggest_peer_capacity

        if post_perm_counts is not None:
            counts = post_perm_counts
        else:
            if not hasattr(train_ds, "cat_ids"):
                raise ValueError("--ep-peer-capacity auto needs a resident dataset")
            # counts AFTER any placement remap — capacity is per NEW row label
            counts = count_row_frequencies(train_ds.cat_ids, model.cfg.padded_buckets)
        n_inst = args.num_data_shards * args.num_model_shards
        # the same lookup_fn serves train AND eval steps — size for the
        # larger slice (eval defaults to max(batch_size, 512), loop.py)
        eval_bs = args.eval_batch_size or max(args.batch_size, 512)
        lookups = (max(args.batch_size, eval_bs) // max(n_inst, 1)) * model.cfg.num_fields
        peer_capacity = suggest_peer_capacity(
            counts, args.num_model_shards, model.cfg.padded_buckets, lookups
        )
        logger.info("ep_peer_capacity auto -> %d", peer_capacity)
    elif peer_capacity is not None:
        peer_capacity = int(peer_capacity)

    plan = None
    if args.num_data_shards > 1 or args.num_model_shards > 1:
        from rectpu.parallel.plan import ParallelPlan

        plan = ParallelPlan.create(
            num_data_shards=args.num_data_shards,
            num_model_shards=args.num_model_shards,
            table_rows=model.cfg.padded_buckets,
            ep_mode=getattr(args, "ep_mode", "2d"),
            ep_comm_compress=getattr(args, "ep_comm_compress", None),
            ep_peer_capacity=peer_capacity,
            tp_mlp=getattr(args, "tp_mlp", False),
            # one flag drives both twins: the local flat backward
            # (TowerConfig.scatter_impl) and the per-shard EP backward
            scatter_impl=getattr(args, "scatter_impl", "xla"),
        )

    config = TrainConfig(
        batch_size=args.batch_size,
        train_steps=args.train_steps,
        eval_batch_size=args.eval_batch_size,
        save_checkpoints_secs=args.save_checkpoints_secs,
        save_checkpoints_steps=args.save_checkpoints_steps,
        steps_per_loop=args.steps_per_loop,
        seed=args.seed,
        loss_reduction=args.loss_reduction,
        eval_auc=getattr(args, "eval_auc", "streaming"),
        data_placement=getattr(args, "data_placement", "auto"),
    )
    optimizer = optimizer or model.default_optimizer()
    if getattr(args, "table_store", "float32") == "bfloat16":
        import jax.numpy as jnp

        from rectpu.train.optimizers import bf16_param_store

        if model.cfg.jnp_compute_dtype != jnp.bfloat16:
            # the forward must have been casting its gathers to bf16 already,
            # or a bf16 store silently changes the model
            raise ValueError("--table-store bfloat16 requires --compute-dtype bfloat16")
        if model.cfg.jnp_table_dtype == jnp.bfloat16:
            raise ValueError(
                "--table-store bfloat16 is redundant with --table-dtype bfloat16 "
                "(the master itself is already bf16)"
            )
        optimizer = bf16_param_store(optimizer)
    fast_step = _resolve_fast_step(args, model, plan, optimizer)
    exporter = make_exporter(model, args.job_dir, row_perm=row_perm,
                             mode=getattr(args, "exporter", "latest"),
                             compare_metric=getattr(args, "best_exporter_metric", "auc"))
    trainer = Trainer(
        model, optimizer, train_ds, eval_ds, args.job_dir, config, plan=plan,
        exporter=exporter, fast_step=fast_step,
    )
    trainer.profile_dir = getattr(args, "profile_dir", None)
    trainer.warm_start_from = getattr(args, "warm_start_from", None)
    trainer.warm_start_vars = getattr(args, "warm_start_vars", None)
    return trainer


def run(args, model, optimizer=None) -> dict:
    if getattr(args, "table_dtype", "float32") == "bfloat16" and (
        optimizer is None or optimizer.name != "Adam"
    ):
        # only Adam implements the fp32-math + stochastic-rounding update for
        # bf16 params; Adagrad/FTRL would silently build bf16 accumulators
        raise ValueError("--table-dtype bfloat16 requires the Adam optimizer")
    trainer = build_trainer(args, model, optimizer)
    metrics = trainer.train_and_evaluate(restore=args.restore)
    logger.info("done: %s", metrics)
    return metrics
