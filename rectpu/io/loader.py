"""Input pipeline: CSV -> encoded device-ready batches.

Replaces the reference's tf.data pipeline (/root/reference/trainers/ml_100k.py:42-61):
TextLineDataset.skip(1).shuffle(16*batch).repeat().map(parse,8).batch(batch).

TPU-first design: the dataset is parsed and feature-encoded ONCE into dense
columnar numpy arrays (global ids per field + float label), then batch
iteration is pure array slicing — zero per-step Python parse work, so the
host never starves the chip. Parsing+encoding runs through the native C++
loader (rectpu.io.native) when built, with a pandas fallback of identical
semantics. The encoded form is ~110 bytes/example, so hundreds of millions
of examples fit resident per host; out-of-core chunked streaming is future
work (the C++ parser is already chunk-structured for it).

Semantics preserved from the reference:
  - label = (rating >= cutoff), cutoff default 5 (trainers/ml_100k.py:48)
  - TRAIN mode shuffles and repeats forever; EVAL is one ordered pass
  - missing values take per-column defaults (0 / "null")
The shuffle is a full per-epoch permutation (seeded, epoch-keyed) rather than
the reference's 16*batch reservoir — strictly more uniform.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from rectpu.features.schema import FeatureSet, column_default, is_string_column
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass
class DataState:
    """Position of the input iterator, checkpointable for exact resume."""

    epoch: int = 0
    index: int = 0  # row offset within the current epoch
    seed: int = 0


def read_csv_columns(csv_path: str | Path, columns: list[str]) -> dict:
    """Read a CSV into {column -> np array}, applying schema defaults."""
    import pandas as pd

    # string columns must stay strings: pandas would otherwise parse "03364"
    # zipcodes as int 3364, losing leading zeros (TF's decode_csv keeps them)
    str_cols = {c: str for c in columns if is_string_column(c)}
    df = pd.read_csv(csv_path, dtype=str_cols)
    out = {}
    for col in columns:
        default = column_default(col)
        if col in df.columns:
            s = df[col]
            if is_string_column(col):
                arr = s.fillna(str(default)).astype(str).to_numpy()
            else:
                arr = (
                    pd.to_numeric(s, errors="coerce").fillna(default).to_numpy(dtype=np.int64)
                )
        else:
            n = len(df)
            if is_string_column(col):
                arr = np.full(n, str(default), dtype=object)
            else:
                arr = np.full(n, default, dtype=np.int64)
        out[col] = arr
    return out


class CsvDataset:
    """A fully-encoded, in-memory dataset ready for batching.

    Attributes:
        cat_ids: [N, F] int32 global embedding-row ids.
        num_vals: [N, D] float32 numeric features (D may be 0).
        labels: [N] float32 binary labels.
    """

    def __init__(
        self,
        csv_path: str | Path,
        feature_set: FeatureSet,
        label_col: str = "rating",
        cutoff: int = 5,
        use_native: bool | None = None,
    ):
        self.feature_set = feature_set
        needed = [f.name for f in feature_set.categorical] + [
            f.name for f in feature_set.numeric
        ]
        native = None
        if use_native is not False:
            try:
                from rectpu.io import native as _native

                native = _native if _native.available() else None
            except Exception:  # pragma: no cover - native build optional
                native = None
            if use_native is True and native is None:
                raise RuntimeError("native loader requested but not built")

        if native is not None:
            enc = native.load_and_encode(str(csv_path), feature_set, label_col, cutoff)
            self.cat_ids = enc["cat_ids"]
            self.num_vals = enc["num_vals"]
            self.labels = enc["labels"]
        else:
            columns = read_csv_columns(csv_path, needed + [label_col])
            batch = feature_set.encode(columns)
            self.cat_ids = batch["cat_ids"]
            self.num_vals = batch.get(
                "num_vals", np.zeros((self.cat_ids.shape[0], 0), dtype=np.float32)
            )
            self.labels = (columns[label_col] >= cutoff).astype(np.float32)
        self.size = self.cat_ids.shape[0]
        logger.debug("dataset loaded: %s rows from %s", self.size, csv_path)

    @classmethod
    def from_arrays(cls, cat_ids, labels, num_vals=None, feature_set=None):
        ds = cls.__new__(cls)
        ds.feature_set = feature_set
        ds.cat_ids = np.asarray(cat_ids, dtype=np.int32)
        ds.labels = np.asarray(labels, dtype=np.float32)
        ds.num_vals = (
            np.asarray(num_vals, dtype=np.float32)
            if num_vals is not None
            else np.zeros((ds.cat_ids.shape[0], 0), dtype=np.float32)
        )
        ds.size = ds.cat_ids.shape[0]
        return ds

    # -- batching ------------------------------------------------------------

    def train_batches(
        self,
        batch_size: int,
        state: DataState | None = None,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        """Infinite shuffled batches of static shape [batch_size, ...].

        Yields (batch_dict, DataState). The state yielded alongside a batch is
        the position AFTER that batch, so checkpointing (state, step) resumes
        exactly. Remainder rows of an epoch fold into the next epoch's head so
        no example is dropped over time.

        Multi-host: every host computes the SAME seeded permutation and takes
        the disjoint slice ``perm[shard_id::num_shards]`` — together the
        shards cover each epoch exactly once (replaces the reference's
        per-worker tf.data sharding).
        """
        state = state or DataState(seed=seed)
        epoch, index = state.epoch, state.index
        perm = self._perm(epoch, state.seed)[shard_id::num_shards]
        carry_ids = np.empty((0, self.cat_ids.shape[1]), dtype=np.int32)
        carry_num = np.empty((0, self.num_vals.shape[1]), dtype=np.float32)
        carry_lab = np.empty((0,), dtype=np.float32)
        while True:
            take = batch_size - carry_lab.shape[0]
            if index + take <= perm.shape[0]:
                sel = perm[index : index + take]
                index += take
                ids = np.concatenate([carry_ids, self.cat_ids[sel]]) if carry_lab.size else self.cat_ids[sel]
                num = np.concatenate([carry_num, self.num_vals[sel]]) if carry_lab.size else self.num_vals[sel]
                lab = np.concatenate([carry_lab, self.labels[sel]]) if carry_lab.size else self.labels[sel]
                carry_ids = np.empty((0, self.cat_ids.shape[1]), dtype=np.int32)
                carry_num = np.empty((0, self.num_vals.shape[1]), dtype=np.float32)
                carry_lab = np.empty((0,), dtype=np.float32)
                batch = {"cat_ids": ids, "num_vals": num, "labels": lab}
                yield batch, DataState(epoch=epoch, index=index, seed=state.seed)
            else:
                sel = perm[index:]
                carry_ids = np.concatenate([carry_ids, self.cat_ids[sel]])
                carry_num = np.concatenate([carry_num, self.num_vals[sel]])
                carry_lab = np.concatenate([carry_lab, self.labels[sel]])
                epoch += 1
                index = 0
                perm = self._perm(epoch, state.seed)[shard_id::num_shards]

    def eval_batches(self, batch_size: int, shard_id: int = 0, num_shards: int = 1):
        """One ordered pass; the last batch is zero-padded with weight=0.

        Every batch has static shape so the jitted eval step compiles once;
        ``weights`` masks padding out of the metrics. Multi-host: each host
        walks the disjoint row slice ``[shard_id::num_shards]``; the metric
        psum across the mesh yields the global numbers.
        """
        rows = np.arange(self.size)[shard_id::num_shards]
        # every shard must emit the SAME number of batches (SPMD eval runs
        # collectives every step); short shards emit trailing all-padding ones
        max_shard_rows = -(-self.size // num_shards)
        n_batches = max(-(-max_shard_rows // batch_size), 1)
        for b in range(n_batches):
            sel = rows[b * batch_size : (b + 1) * batch_size]
            n = sel.shape[0]
            ids = self.cat_ids[sel]
            num = self.num_vals[sel]
            lab = self.labels[sel]
            w = np.ones((n,), dtype=np.float32)
            if n < batch_size:
                pad = batch_size - n
                ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), dtype=np.int32)])
                num = np.concatenate([num, np.zeros((pad, num.shape[1]), dtype=np.float32)])
                lab = np.concatenate([lab, np.zeros((pad,), dtype=np.float32)])
                w = np.concatenate([w, np.zeros((pad,), dtype=np.float32)])
            yield {"cat_ids": ids, "num_vals": num, "labels": lab, "weights": w}

    def _perm(self, epoch: int, seed: int) -> np.ndarray:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        return rng.permutation(self.size)
