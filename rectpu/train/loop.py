"""The training loop: jit-compiled train/eval steps with checkpoint/export cadence.

Replaces ``tf.estimator.train_and_evaluate`` + RunConfig/TrainSpec/EvalSpec
(/root/reference/trainers/conf_utils.py:3-34, deep_fm.py:178). The per-step
``session.run`` of the reference becomes:

  - ``train_step``: forward + backward + optimizer update, one XLA program,
    executed K steps per host-loop iteration via ``lax.scan`` over a stacked
    super-batch (kills per-step dispatch overhead — the reference pays a
    Python<->C++ boundary every 32-row step);
  - ``eval_step``: forward + streaming-metric accumulation, one XLA program,
    full ordered pass over the eval set with zero-weight padding;
  - wall-clock (save_checkpoints_secs=60, reference parity) or step-based
    checkpointing with keep-N rotation, eval + export after each save, exactly
    like the reference's continuous train-and-evaluate cadence;
  - exact resume: params + optimizer state + RNG + input-pipeline position.

Distribution plugs in via a ``ParallelPlan`` (rectpu.parallel): batch/param
shardings and an EP lookup_fn are applied around the same step functions.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rectpu.train import metrics as metrics_lib
from rectpu.train.checkpoint import Checkpointer
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)

EVAL_INTERVAL = 60  # seconds, reference parity (conf_utils.py:3)


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 32
    train_steps: int = 20000
    eval_batch_size: int | None = None  # defaults to batch_size
    save_checkpoints_secs: float | None = EVAL_INTERVAL
    save_checkpoints_steps: int | None = None  # overrides secs if set
    keep_checkpoint_max: int = 5
    log_every_steps: int = 100
    steps_per_loop: int = 100
    seed: int = 42
    final_eval: bool = True
    async_checkpoint: bool = True  # background disk writes (host copy is sync)
    # How the K steps of a host loop reach the device:
    #   "scan":      one dispatch running lax.scan over a stacked super-batch —
    #                best for small batches (kills dispatch overhead);
    #   "pipelined": K async single-step dispatches — best for large batches
    #                (XLA's scan carry copying costs ~0.5-1 ms/step on big
    #                param trees; measured on v5e at batch 8192);
    #   "auto":      pipelined when batch_size >= 2048, else scan.
    dispatch_mode: str = "auto"
    # "mean" (default) or "sum": TF-1.x heads trained on the SUM of per-example
    # losses (tf.losses.Reduction.SUM); mean is scale-stable across batch
    # sizes. Affects optimizer dynamics for non-scale-invariant optimizers
    # (FTRL/Adagrad/SGD); choose "sum" for strict reference-1.12 dynamics.
    loss_reduction: str = "mean"
    # "streaming" (200-threshold confusion-matrix AUC, tf.metrics.auc parity,
    # within ~0.005 of exact) or "exact" (rank-based on the gathered eval
    # probabilities — use for ±0.002 parity-gate decisions; the streaming
    # value is still reported as auc_streaming). Works sharded and
    # multi-process too (the gather is collective, like checkpoint saves).
    eval_auc: str = "streaming"
    # Where each train batch is assembled:
    #   "host":   select rows on the host, ship [B, ...] arrays per step;
    #   "device": upload the WHOLE encoded dataset once and ship only the
    #             [B] row indices per step — the batch is gathered on device,
    #             removing the per-step host->device transfer (measured CLI
    #             bottleneck through the TPU tunnel: ~1 MB + ~30 ms RTT per
    #             step caps throughput at ~0.7M ex/s regardless of model);
    #   "auto":   device whenever the resident dataset fits
    #             data_placement_max_bytes per device (a streaming dataset
    #             keeps the host path). Sharded/multi-process runs replicate
    #             the dataset over the mesh and ship batch-sharded index
    #             rows, so the flagship EP configuration takes the fast
    #             staging path too.
    # Identical training either way: both paths consume the same
    # train_index_batches stream (io/loader.py), so placement — like a
    # restore — never changes which rows form a batch.
    data_placement: str = "auto"
    data_placement_max_bytes: int = 1 << 30


class Trainer:
    def __init__(
        self,
        model,
        optimizer,
        train_ds,
        eval_ds,
        job_dir: str | Path,
        config: TrainConfig,
        plan=None,
        exporter=None,
        event_writer=None,
        fast_step=None,
    ):
        self.model = model
        self.optimizer = optimizer
        # (init_opt_state, step) from train/fast_step.make_sparse_step: the
        # sparse lazy-Adam step replaces value_and_grad + optimizer.update
        # (the optimizer arg then only names the semantics; its init/update
        # are not used)
        self.fast_step = fast_step
        self.train_ds = train_ds
        self.eval_ds = eval_ds
        self.job_dir = Path(job_dir)
        self.config = config
        self.plan = plan
        self.exporter = exporter
        self.ckpt = Checkpointer(
            self.job_dir, keep=config.keep_checkpoint_max,
            async_write=config.async_checkpoint,
        )
        if event_writer is None and jax.process_index() == 0:
            try:
                from rectpu.utils.events import EventWriter

                event_writer = EventWriter(self.job_dir)
            except Exception:  # pragma: no cover
                event_writer = None
        self.events = event_writer
        self.profile_dir: str | None = None  # set to capture a trace of one host loop
        self._build_steps()

    # -- step functions --------------------------------------------------------

    def _lookup_fn(self):
        return self.plan.lookup_fn if self.plan is not None else None

    def _loss_fn(self, params, batch, rng):
        logits = self.model.apply(
            params, batch, train=True, rng=rng, lookup_fn=self._lookup_fn()
        )
        losses = metrics_lib.sigmoid_xent(logits, batch["labels"])
        if self.config.loss_reduction == "sum":
            return losses.sum()
        return losses.mean()

    def _build_steps(self):
        optimizer = self.optimizer

        if self.fast_step is not None:
            _, fstep = self.fast_step

            def one_step(carry, batch):
                params, opt_state, rng, step = carry
                params, opt_state, loss = fstep(params, opt_state, batch, rng, step)
                return (params, opt_state, rng, step + 1), loss
        else:
            def one_step(carry, batch):
                params, opt_state, rng, step = carry
                step_rng = jax.random.fold_in(rng, step)
                loss, grads = jax.value_and_grad(self._loss_fn)(params, batch, step_rng)
                params, opt_state = optimizer.update(grads, opt_state, params)
                return (params, opt_state, rng, step + 1), loss

        def train_chunk(params, opt_state, rng, step, batches):
            (params, opt_state, _, step), losses = jax.lax.scan(
                one_step, (params, opt_state, rng, step), batches
            )
            return params, opt_state, step, losses

        def eval_step(params, mstate, batch):
            logits = self.model.apply(params, batch, train=False, lookup_fn=self._lookup_fn())
            preds = metrics_lib.binary_predictions(logits)
            losses = metrics_lib.sigmoid_xent(logits, batch["labels"])
            return metrics_lib.update_state(
                mstate, preds["probabilities"], batch["labels"],
                losses=losses, weights=batch.get("weights"),
            )

        def eval_scan(params, mstate, batches):
            def body(ms, batch):
                return eval_step(params, ms, batch), None

            mstate, _ = jax.lax.scan(body, mstate, batches)
            return mstate

        def eval_probs_scan(params, batches):
            """Stacked eval probabilities for the exact (rank-based) AUC."""

            def body(_, batch):
                logits = self.model.apply(
                    params, batch, train=False, lookup_fn=self._lookup_fn()
                )
                return None, metrics_lib.binary_predictions(logits)["probabilities"]

            _, probs = jax.lax.scan(body, None, batches)
            return probs

        def train_one(params, opt_state, rng, step, batch):
            (params, opt_state, _, step), loss = one_step((params, opt_state, rng, step), batch)
            return params, opt_state, loss

        # device-resident data variants: the batch is a [B]-index gather from
        # the resident dataset (a jit argument, NOT a baked-in constant).
        # Sharded runs gather from the REPLICATED dataset with batch-sharded
        # indices; the constraint pins the gathered batch to the batch axes
        # so the step is byte-identical to the host-staged sharded path.
        plan = self.plan

        def gather_batch(data, idx):
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            if plan is not None:
                batch = plan.constrain_batch(batch)
            return batch

        def train_one_idx(params, opt_state, rng, step, idx, data):
            return train_one(params, opt_state, rng, step, gather_batch(data, idx))

        def train_chunk_idx(params, opt_state, rng, step, idxs, data):
            def body(carry, idx):
                return one_step(carry, gather_batch(data, idx))

            (params, opt_state, _, step), losses = jax.lax.scan(
                body, (params, opt_state, rng, step), idxs
            )
            return params, opt_state, step, losses

        if self.plan is not None:
            self._train_chunk = self.plan.jit_train_chunk(train_chunk)
            self._eval_step = self.plan.jit_eval_step(eval_step)
            self._eval_scan = jax.jit(eval_scan, donate_argnums=(1,))
        else:
            self._train_chunk = jax.jit(train_chunk, donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step, donate_argnums=(1,))
            self._eval_scan = jax.jit(eval_scan, donate_argnums=(1,))
        self._eval_probs_scan = jax.jit(eval_probs_scan)
        self._train_one = jax.jit(train_one, donate_argnums=(0, 1))
        self._train_one_idx = jax.jit(train_one_idx, donate_argnums=(0, 1))
        self._train_chunk_idx = jax.jit(train_chunk_idx, donate_argnums=(0, 1))
        self._eval_cache = None  # device-resident stacked eval set

    def _gather_for_save(self, tree):
        """Host copy of the full (global) tree. Multi-process EP runs
        row-shard tables across processes — those leaves are not addressable
        from process 0 and plain device_get raises — so they are allgathered
        first. COLLECTIVE when any leaf is non-addressable: every process
        must call this at the same point (the loop's save cadence is
        deterministic in step count, and the wall-clock cadence is broadcast
        from process 0, so they do)."""
        leaves = jax.tree.leaves(tree)
        if any(
            isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
            for leaf in leaves
        ):
            from jax.experimental import multihost_utils

            tree = multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def _proc_info(self):
        """(num_processes, process_index) — multi-host via the plan, else (1, 0)."""
        if self.plan is not None:
            return self.plan.process_count, self.plan.process_index
        return 1, 0

    def _dispatch_mode(self) -> str:
        mode = self.config.dispatch_mode
        if mode == "auto":
            return "pipelined" if self.config.batch_size >= 2048 else "scan"
        return mode

    def _resolve_data_placement(self, cfg, nproc: int):
        """Device-resident training data (see TrainConfig.data_placement):
        returns the dataset as device arrays, or None for the host path."""
        mode = cfg.data_placement
        if mode == "host":
            return None
        ok = hasattr(self.train_ds, "cat_ids")  # resident, not streaming
        nbytes = 0
        if ok:
            nbytes = (
                self.train_ds.cat_ids.nbytes
                + self.train_ds.num_vals.nbytes
                + self.train_ds.labels.nbytes
            )
            # sharded runs REPLICATE the dataset over the mesh, so the limit
            # stays a per-device budget either way
            ok = nbytes <= cfg.data_placement_max_bytes
        if not ok:
            if mode == "device":
                raise ValueError(
                    "data_placement='device' needs a resident (non-streaming) "
                    "dataset no larger than data_placement_max_bytes "
                    f"({cfg.data_placement_max_bytes} B) per device"
                )
            return None
        logger.info(
            "train data device-resident (%.1f MB%s): shipping only row "
            "indices per step", nbytes / 1e6,
            ", replicated over the mesh" if self.plan is not None else "",
        )
        tree = {
            "cat_ids": np.asarray(self.train_ds.cat_ids),
            "num_vals": np.asarray(self.train_ds.num_vals),
            "labels": np.asarray(self.train_ds.labels),
        }
        if self.plan is not None:
            return self.plan.put_replicated(tree)
        return {k: jax.device_put(jnp.asarray(v)) for k, v in tree.items()}

    # -- data staging ------------------------------------------------------------

    def _stack_batches(self, batch_iter, k: int):
        """Stack k consecutive batches into one [k, B, ...] super-batch."""
        bs, state = [], None
        for _ in range(k):
            b, state = next(batch_iter)
            bs.append(b)
        stacked = {key: np.stack([b[key] for b in bs]) for key in bs[0]}
        if self.plan is not None:
            stacked = self.plan.shard_superbatch(stacked)
        return stacked, state

    # -- public API ---------------------------------------------------------------

    def evaluate(self, params) -> dict:
        """One full pass over the eval set -> metric dict (floats).

        The padded eval batches are stacked and staged on device ONCE (cached
        across evals) and consumed by a single scanned dispatch — the
        60-second eval cadence costs one device call, not one per batch.
        """
        eval_bs = self.config.eval_batch_size or max(self.config.batch_size, 512)
        nproc, pidx = self._proc_info()
        mstate = metrics_lib.init_state()
        if self.plan is not None:
            mstate = self.plan.replicate_metric_state(mstate)
        if self._eval_cache is None:
            batches = list(
                self.eval_ds.eval_batches(
                    max(eval_bs // nproc, 1), shard_id=pidx, num_shards=nproc
                )
            )
            stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
            if self.plan is not None:
                stacked = self.plan.shard_superbatch(stacked)
            else:
                stacked = {k: jax.device_put(v) for k, v in stacked.items()}
            self._eval_cache = stacked
        mstate = self._eval_scan(params, mstate, self._eval_cache)
        result = metrics_lib.finalize(jax.device_get(mstate))
        result = {k: float(v) for k, v in result.items()}
        if self.config.eval_auc == "exact":
            # works sharded too (round 4): the probabilities/labels gather
            # through the same collective host-copy path checkpoints use
            # (_gather_for_save allgathers non-addressable shards; the AUC
            # rank statistic is invariant to the row order of the union, so
            # per-process stride sharding of the eval set doesn't matter)
            tree = {
                "probs": self._eval_probs_scan(params, self._eval_cache),
                "labels": self._eval_cache["labels"],
            }
            w = self._eval_cache.get("weights")
            if w is not None:
                tree["weights"] = w
            host = self._gather_for_save(tree)
            probs = np.asarray(host["probs"]).ravel()
            labels = np.asarray(host["labels"]).ravel()
            valid = (
                np.asarray(host["weights"]).ravel() > 0
                if w is not None
                else slice(None)
            )
            result["auc_streaming"] = result["auc"]
            result["auc"] = metrics_lib.exact_auc(probs[valid], labels[valid])
        return result

    def _log_histograms(self, params, step: int, max_elems: int = 65536) -> None:
        """Per-parameter histograms + zero-fraction scalars (layer_summary
        parity, ref trainers/model_utils.py:4-6); large leaves are sampled."""
        if not self.events:
            return
        for path, leaf in jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            arr = np.asarray(leaf).ravel()
            if arr.size == 0:
                continue
            if arr.size > max_elems:
                arr = arr[:: max(arr.size // max_elems, 1)]
            self.events.add_histogram(f"params/{name}", arr, step)
            self.events.add_scalar(
                f"params/{name}/fraction_of_zero_values",
                float((arr == 0).mean()), step,
            )

    def _export(self, params, step, metrics):
        """Invoke the exporter callback; metric-aware exporters (BestExporter
        parity, serve/export.make_exporter mode='best') receive the latest
        eval metrics, plain (params, step) callbacks keep working."""
        import inspect

        try:
            sig = inspect.signature(self.exporter)
            takes_metrics = "metrics" in sig.parameters or any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values()
            )
        except (TypeError, ValueError):
            takes_metrics = False
        if takes_metrics:
            self.exporter(params, step, metrics=metrics)
        else:
            self.exporter(params, step)

    def _warm_start(self, params):
        """Initialize params from a previous run's artifact (tf.estimator
        WarmStartSettings parity): ``warm_start_from`` may be an export dir,
        a job dir (its newest export wins, else its newest checkpoint), or a
        ckpt-N directory. Leaves are matched by tree path; shape mismatches
        raise; template leaves absent from the artifact keep their fresh
        init (partial warm start, e.g. a new tower on a trained table)."""
        from rectpu.train.checkpoint import Checkpointer, _flatten, _load_flat_npz

        src = Path(self.warm_start_from)
        flat_src = None
        if (src / "model.json").exists():  # an export dir
            import json as _json

            meta = _json.loads((src / "model.json").read_text())
            if meta.get("table_quant"):
                raise ValueError(
                    f"cannot warm-start from a quantized export ({src}); "
                    "use the fp export it was derived from")
            flat_src = _load_flat_npz(src / "arrays.npz")
        elif (src / "arrays.npz").exists():  # a bare ckpt-N directory
            flat_src = {
                k[len("params/"):]: v
                for k, v in _load_flat_npz(src / "arrays.npz").items()
                if k.startswith("params/")
            }
        else:  # a job dir
            from rectpu.serve.export import latest_export

            exp = latest_export(src)
            if exp is not None:
                flat_src = _load_flat_npz(exp / "arrays.npz")
            else:
                snap = Checkpointer(src).restore()
                if snap is None:
                    raise FileNotFoundError(
                        f"warm-start source {src} has neither exports nor checkpoints")
                flat_src = _flatten(jax.device_get(snap[0]["params"]))
        return self._replace_leaves(params, flat_src,
                                    getattr(self, "warm_start_vars", None))

    @staticmethod
    def _replace_leaves(params, flat_src, var_prefixes=None):
        from rectpu.train.checkpoint import _flatten

        if var_prefixes:
            # tf vars_to_warm_start parity: only leaves under the given tree
            # prefixes load; everything else keeps its fresh init
            flat_src = {
                k: v for k, v in flat_src.items()
                if any(k == p or k.startswith(p.rstrip("/") + "/")
                       for p in var_prefixes)
            }
        flat_tpl = _flatten(params)
        missing, used = [], 0
        out = {}
        for key, tpl in flat_tpl.items():
            if key in flat_src:
                got = np.asarray(flat_src[key])
                if got.shape != tpl.shape:
                    raise ValueError(
                        f"warm-start shape mismatch for {key!r}: "
                        f"{got.shape} vs {tpl.shape}")
                out[key] = got.astype(tpl.dtype)
                used += 1
            else:
                missing.append(key)
                out[key] = tpl
        if used == 0:
            raise ValueError("warm-start artifact shares no parameters with the model")
        if missing:
            logger.warning("warm start: %d leaves kept fresh init (%s)",
                           len(missing), ", ".join(missing[:5]))
        logger.info("warm-started %d/%d parameter leaves", used, len(flat_tpl))
        from rectpu.train.checkpoint import _rebuild, _treedef_template

        return _rebuild(_treedef_template(params), out)

    def train_and_evaluate(self, restore: bool = True) -> dict:
        cfg = self.config
        rng = jax.random.PRNGKey(cfg.seed)
        params = self.model.init(rng)
        if getattr(self, "warm_start_from", None):
            # TF semantics: warm start seeds a FRESH run; a restored
            # checkpoint (below) overwrites it, making restarts idempotent
            params = self._warm_start(params)
        if self.fast_step is not None:
            opt_state = self.fast_step[0](params)
        else:
            opt_state = self.optimizer.init(params)
        if getattr(self.optimizer, "prepare", None) is not None:
            # e.g. bf16_param_store: downcast the stored table leaves (the
            # fp32 masters were captured by optimizer.init above). A restored
            # checkpoint overwrites both trees, already in stored form.
            params = self.optimizer.prepare(params)
        step = 0
        data_state = None

        if restore:
            snapshot = self.ckpt.restore()
            if snapshot is not None:
                tree, meta = snapshot
                params, opt_state = tree["params"], tree["opt_state"]
                step = meta["step"]
                from rectpu.io.loader import DataState

                if meta.get("data_state"):
                    data_state = DataState(**meta["data_state"])
                logger.info("restored checkpoint at step %s", step)
            if jax.process_count() > 1:
                # every host must finish (or skip) restore before any host trains
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("rectpu_restore")

        if self.plan is not None:
            params = self.plan.shard_params(params)
            opt_state = self.plan.shard_params(opt_state)

        nproc, pidx = self._proc_info()
        if cfg.batch_size % nproc:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by {nproc} processes")
        resident = self._resolve_data_placement(cfg, nproc)
        if resident is not None:
            # same stride-sharded stream as train_batches: each process
            # contributes its local [B/nproc] index rows per step
            batch_iter = self.train_ds.train_index_batches(
                cfg.batch_size // nproc, state=data_state, seed=cfg.seed,
                shard_id=pidx, num_shards=nproc,
            )
        else:
            batch_iter = self.train_ds.train_batches(
                cfg.batch_size // nproc, state=data_state, seed=cfg.seed,
                shard_id=pidx, num_shards=nproc,
            )
        last_save = time.time()
        t_loop = time.time()
        examples_acc = 0
        last_metrics: dict = {}

        def save(step, params, opt_state, data_state):
            # the gather is collective (EP shards live on other processes);
            # every process reaches it, process 0 owns the disk. Returns the
            # host params so histogram/export consumers don't re-gather.
            tree = self._gather_for_save(
                {"params": params, "opt_state": opt_state}
            )
            if pidx == 0:
                self.ckpt.save(
                    step,
                    tree,
                    extra_meta={
                        "data_state": dataclasses.asdict(data_state) if data_state else None,
                        "model": getattr(self.model, "name", "model"),
                    },
                )
            return tree["params"]

        profiling = False
        pipelined = self._dispatch_mode() == "pipelined"
        while step < cfg.train_steps:
            k = min(cfg.steps_per_loop, cfg.train_steps - step)
            if self.profile_dir and not profiling and step > 0:
                # trace the SECOND loop so compilation isn't in the capture
                jax.profiler.start_trace(self.profile_dir)
                profiling = True
            if pipelined:
                # K async single-step dispatches with depth-2 device prefetch;
                # block only on the last loss
                losses = None
                prefetch: list = []

                def stage():
                    nonlocal data_state
                    b, data_state = next(batch_iter)
                    if resident is not None:
                        # only the [B] row indices cross to the device
                        idx = np.asarray(b, np.int32)
                        if self.plan is not None:
                            return self.plan.put_index_batch(idx)
                        return jax.device_put(idx)
                    if self.plan is not None:
                        return self.plan.shard_batch(b)
                    return {kk: jax.device_put(v) for kk, v in b.items()}

                depth = min(2, k)
                for _ in range(depth):
                    prefetch.append(stage())
                for i in range(k):
                    batch = prefetch.pop(0)
                    if resident is not None:
                        params, opt_state, losses = self._train_one_idx(
                            params, opt_state, rng,
                            jnp.asarray(step + i, jnp.int32), batch, resident,
                        )
                    else:
                        params, opt_state, losses = self._train_one(
                            params, opt_state, rng,
                            jnp.asarray(step + i, jnp.int32), batch,
                        )
                    if i + depth < k:
                        prefetch.append(stage())
            elif resident is not None:
                idxs = []
                for _ in range(k):
                    b, data_state = next(batch_iter)
                    idxs.append(np.asarray(b, np.int32))
                idxs = np.stack(idxs)
                idxs = (
                    self.plan.put_index_batch(idxs)
                    if self.plan is not None
                    else jax.device_put(idxs)
                )
                params, opt_state, step_dev, losses = self._train_chunk_idx(
                    params, opt_state, rng, jnp.asarray(step, jnp.int32),
                    idxs, resident,
                )
            else:
                stacked, data_state = self._stack_batches(batch_iter, k)
                params, opt_state, step_dev, losses = self._train_chunk(
                    params, opt_state, rng, jnp.asarray(step, jnp.int32), stacked
                )
            if profiling:
                jax.block_until_ready(losses)
                jax.profiler.stop_trace()
                logger.info("profile trace written to %s", self.profile_dir)
                self.profile_dir = None
                profiling = False
            step += k
            examples_acc += k * cfg.batch_size

            if cfg.log_every_steps and (step % cfg.log_every_steps < cfg.steps_per_loop):
                losses_h = np.ravel(np.asarray(jax.device_get(losses)))
                dt = time.time() - t_loop
                eps = examples_acc / max(dt, 1e-9)
                logger.info(
                    "step %d: loss = %.5f (%.1f examples/sec)", step, float(losses_h[-1]), eps
                )
                if self.events:
                    self.events.add_scalar("loss", float(losses_h[-1]), step)
                    self.events.add_scalar("examples_per_sec", eps, step)
                t_loop = time.time()
                examples_acc = 0

            due_steps = cfg.save_checkpoints_steps and step % cfg.save_checkpoints_steps == 0
            due_secs = (
                cfg.save_checkpoints_steps is None
                and cfg.save_checkpoints_secs is not None
                and time.time() - last_save >= cfg.save_checkpoints_secs
            )
            if (
                nproc > 1
                and cfg.save_checkpoints_steps is None
                and cfg.save_checkpoints_secs is not None
            ):
                # wall clocks drift across processes and save() is collective
                # (EP allgather): process 0's clock decides for everyone.
                # EVERY process runs the broadcast each loop — gating it on
                # the local clock would deadlock the collective.
                from jax.experimental import multihost_utils

                due_secs = bool(
                    multihost_utils.broadcast_one_to_all(np.asarray(bool(due_secs)))
                )
            if (due_steps or due_secs) and step < cfg.train_steps:
                host_params = save(step, params, opt_state, data_state)
                last_save = time.time()
                last_metrics = self.evaluate(params)
                logger.info("eval at step %d: %s", step, _fmt_metrics(last_metrics))
                if self.events:
                    self.events.add_scalars(
                        {f"eval/{k}": v for k, v in last_metrics.items()}, step
                    )
                self._log_histograms(host_params, step)
                if self.exporter is not None and pidx == 0:
                    self._export(host_params, step, last_metrics)

        host_params = save(step, params, opt_state, data_state)
        if cfg.final_eval:
            last_metrics = self.evaluate(params)
            logger.info("final eval at step %d: %s", step, _fmt_metrics(last_metrics))
            if self.events:
                self.events.add_scalars({f"eval/{k}": v for k, v in last_metrics.items()}, step)
        if self.exporter is not None and pidx == 0:
            self._export(host_params, step, last_metrics)
        if self.events:
            self.events.flush()
        self.ckpt.wait()
        self._final_params = params
        return last_metrics


def _fmt_metrics(m: dict) -> str:
    return ", ".join(f"{k} = {v:.5f}" for k, v in sorted(m.items()))
