"""ParallelPlan: the glue between the Trainer and a device mesh.

Encapsulates every sharding decision so the train/eval step functions stay
mesh-agnostic:
  - batch/superbatch arrays  -> P('data') on the batch dim
  - embedding-table params   -> P('model', None) row-sharding (EP) when the
    'model' axis is >1, plus the matching optimizer-state leaves
  - everything else          -> replicated; DP gradient psum is emitted by
    GSPMD from the shardings (no explicit collectives in the step)
  - lookup_fn                -> the shard_map EP exchange when EP is on
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rectpu.parallel.embedding_ep import (
    make_ep_lookup,
    make_ep_lookup_2d,
    make_ep_lookup_2d_flat,
    make_ep_lookup_dedup,
    make_ep_lookup_dedup_flat,
    make_ep_lookup_flat,
)
from rectpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh


@dataclass
class ParallelPlan:
    mesh: Mesh
    ep: bool  # row-shard embedding tables over 'model'
    lookup_fn: object | None
    table_rows: int | None = None  # padded table row count, the EP key
    # "2d": batch over ALL devices, dense reduce_scatter exchange (DLRM);
    # "dedup": batch over ALL devices, unique-row all_to_all exchange (wide K);
    # "1d": batch over 'data' only, masked gather + psum
    ep_mode: str = "2d"
    # lossy ICI wire format for the activation exchange (PAPERS.md,
    # arXiv:2407.04272): None exact; "bf16" for any mode; "int8" per-row
    # quantization, dedup mode only (rows ride all_to_all un-summed)
    ep_comm_compress: str | None = None
    # static per-peer request slots for the dedup exchange (MoE capacity
    # contract; None = provably-lossless default, see make_ep_lookup_dedup)
    ep_peer_capacity: int | None = None
    # Megatron-style tensor parallelism for the dense towers: MLP kernels
    # alternate column-sharded (even layers, P(None,'model')) and
    # row-sharded (odd layers, P('model',None)) so consecutive layers chain
    # without a resharding collective; GSPMD inserts the one psum per pair.
    # At the reference tower sizes ([1664,256]+[256,128] ~ 1.8 MB of weights)
    # the activation collectives outweigh the compute split — built to close
    # SURVEY §2c's TP row and for wider-tower configs; see docs/distributed.md.
    tp_mlp: bool = False
    # "mxu": the flat EP exchanges build each shard's table cotangent with
    # the sorted one-hot MXU rebuild (parallel/embedding_ep.
    # _mxu_shard_cotangent) instead of autodiff's serial per-shard scatter —
    # the sharded twin of TowerConfig.scatter_impl.
    scatter_impl: str = "xla"

    @classmethod
    def create(
        cls, num_data_shards: int, num_model_shards: int = 1, devices=None,
        table_rows: int | None = None, ep_mode: str = "2d",
        ep_comm_compress: str | None = None, ep_peer_capacity: int | None = None,
        tp_mlp: bool = False, scatter_impl: str = "xla",
    ):
        mesh = make_mesh(num_data_shards, num_model_shards, devices)
        ep = num_model_shards > 1
        cc = ep_comm_compress
        if scatter_impl == "auto":
            # resolve the autotuner's pin once at plan-build time (trainers
            # run --autotune before creating the plan)
            from rectpu.ops.embedding import _FLAT_SCATTER_AUTO, _on_tpu

            scatter_impl = _FLAT_SCATTER_AUTO["tpu" if _on_tpu() else "other"]
        if ep_peer_capacity is not None and ep_mode != "dedup":
            raise ValueError("ep_peer_capacity only applies to ep_mode='dedup'")
        if not ep:
            lookup_fn = None
        elif ep_mode == "2d":
            lookup_fn = make_ep_lookup_2d(mesh, comm_compress=cc)
            # models with flat_layout upgrade to the lane-packed exchange
            # (half the reduce_scatter bytes, flat tower math) through this
            # attribute — the trainer keeps passing one lookup_fn either way
            lookup_fn.flat_variant = make_ep_lookup_2d_flat(
                mesh, comm_compress=cc, scatter_impl=scatter_impl
            )
        elif ep_mode == "dedup":
            lookup_fn = make_ep_lookup_dedup(
                mesh, peer_capacity=ep_peer_capacity, comm_compress=cc,
                scatter_impl=scatter_impl,
            )
            lookup_fn.flat_variant = make_ep_lookup_dedup_flat(
                mesh, peer_capacity=ep_peer_capacity, comm_compress=cc,
                scatter_impl=scatter_impl,
            )
        else:
            if cc is not None:
                raise ValueError("ep_comm_compress requires ep_mode '2d' or 'dedup'")
            lookup_fn = make_ep_lookup(mesh)
            lookup_fn.flat_variant = make_ep_lookup_flat(
                mesh, scatter_impl=scatter_impl
            )
        if tp_mlp and num_model_shards <= 1:
            raise ValueError("tp_mlp requires num_model_shards > 1")
        return cls(mesh=mesh, ep=ep, lookup_fn=lookup_fn, table_rows=table_rows,
                   ep_mode=ep_mode, ep_comm_compress=ep_comm_compress,
                   ep_peer_capacity=ep_peer_capacity, tp_mlp=tp_mlp,
                   scatter_impl=scatter_impl)

    @property
    def _batch_axes(self):
        # with 2D/dedup EP the batch dim spans the whole mesh; otherwise 'data' only
        if self.ep and self.ep_mode in ("2d", "dedup"):
            return (DATA_AXIS, MODEL_AXIS)
        return DATA_AXIS

    # -- shardings ----------------------------------------------------------

    def _sh(self, spec) -> NamedSharding:
        return NamedSharding(self.mesh, spec)

    def _param_spec(self, leaf) -> P:
        # row-shard [table_rows, K] tables over 'model' (opt-state twins share
        # the shape, so they follow the same rule); replicate everything else.
        if (
            self.ep
            and self.table_rows is not None
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[0] == self.table_rows
        ):
            return P(MODEL_AXIS, None)
        return P()

    _TP_TOWER_KEYS = frozenset({"mlp", "top", "bot"})

    def _tp_spec(self, path, leaf) -> P | None:
        """Megatron alternation for `<tower>[i].{kernel,bias}` leaves.

        Even layers column-shard the kernel (output dim on 'model', bias
        sharded alike); odd layers row-shard (input dim on 'model', bias
        replicated — it adds after GSPMD's psum). The final logit layer
        (out_dim 1) row-shards. Non-divisible dims stay replicated. Works on
        both param trees and optimizer-state twins (same path suffixes)."""
        keys = [
            getattr(p, "key", getattr(p, "idx", None)) for p in path
        ]
        leaf_kind = keys[-1] if keys else None
        if leaf_kind not in ("kernel", "bias"):
            return None
        layer = None
        for j in range(len(keys) - 1):
            if keys[j] in self._TP_TOWER_KEYS and isinstance(keys[j + 1], int):
                layer = keys[j + 1]
        if layer is None:
            return None
        n_model = self.mesh.shape[MODEL_AXIS]

        def fits(dim):
            return dim % n_model == 0

        if leaf_kind == "kernel" and getattr(leaf, "ndim", 0) == 2:
            col = layer % 2 == 0 and leaf.shape[1] > 1
            if col and fits(leaf.shape[1]):
                return P(None, MODEL_AXIS)
            if not col and fits(leaf.shape[0]):
                return P(MODEL_AXIS, None)
            return P()
        if leaf_kind == "bias" and getattr(leaf, "ndim", 0) == 1:
            if layer % 2 == 0 and leaf.shape[0] > 1 and fits(leaf.shape[0]):
                return P(MODEL_AXIS)
            return P()
        return None

    def shard_params(self, params):
        def place(path, leaf):
            spec = self._tp_spec(path, leaf) if self.tp_mlp else None
            if spec is None:
                spec = self._param_spec(leaf)
            return jax.device_put(leaf, self._sh(spec))

        return jax.tree_util.tree_map_with_path(place, params)

    def _put_batchlike(self, tree: dict, spec_of) -> dict:
        """Place host arrays with batch-dim sharding. Single-process: a plain
        device_put of the global array. Multi-process: the incoming arrays are
        this host's LOCAL rows (the loader shards by process, see
        CsvDataset.train_batches) and are assembled into one global array."""
        specs = {k: spec_of(v) for k, v in tree.items()}
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.host_local_array_to_global_array(
                tree, self.mesh, specs
            )
        return {k: jax.device_put(v, self._sh(specs[k])) for k, v in tree.items()}

    def shard_batch(self, batch: dict) -> dict:
        return self._put_batchlike(
            batch, lambda v: P(self._batch_axes, *([None] * (np.ndim(v) - 1)))
        )

    # -- device-resident training data (train/loop.py data_placement) --------

    def put_replicated(self, tree: dict) -> dict:
        """Replicate identical host arrays onto every mesh device (the
        device-resident training dataset: per-device HBM cost equals the
        single-chip path, any device can gather any row). Multi-process:
        every host holds the same full arrays (CsvDataset encodes the whole
        file per host), so the replicated global assembles from identical
        local copies."""
        return self._put_batchlike(tree, lambda v: P())

    def put_index_batch(self, idx):
        """Place a [B] (or [k, B] superbatch) row-index array sharded over
        the batch axes — the only per-step host->device transfer of the
        device-resident path. Multi-process: ``idx`` is this host's LOCAL
        index rows (loader stride shard), assembled like any batch."""
        lead = (None,) if np.ndim(idx) == 2 else ()
        return self._put_batchlike(
            {"idx": idx}, lambda v: P(*lead, self._batch_axes)
        )["idx"]

    def constrain_batch(self, batch: dict) -> dict:
        """with_sharding_constraint over a batch pytree INSIDE jit: keeps the
        device-resident gather's output sharded over the batch axes (GSPMD
        would otherwise be free to replicate it before the EP shard_map)."""
        return {
            k: jax.lax.with_sharding_constraint(
                v, self._sh(P(self._batch_axes, *([None] * (v.ndim - 1))))
            )
            for k, v in batch.items()
        }

    def shard_superbatch(self, stacked: dict) -> dict:
        return self._put_batchlike(
            stacked, lambda v: P(None, self._batch_axes, *([None] * (np.ndim(v) - 2)))
        )

    @property
    def process_count(self) -> int:
        return jax.process_count()

    @property
    def process_index(self) -> int:
        return jax.process_index()

    def replicate_metric_state(self, mstate):
        return jax.tree.map(lambda leaf: jax.device_put(leaf, self._sh(P())), mstate)

    # -- jit wrappers --------------------------------------------------------

    def jit_train_chunk(self, train_chunk):
        return jax.jit(train_chunk, donate_argnums=(0, 1))

    def jit_eval_step(self, eval_step):
        return jax.jit(eval_step, donate_argnums=(1,))
