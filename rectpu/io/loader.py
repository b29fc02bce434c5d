"""Input pipeline: CSV -> encoded device-ready batches.

Replaces the reference's tf.data pipeline (/root/reference/trainers/ml_100k.py:42-61):
TextLineDataset.skip(1).shuffle(16*batch).repeat().map(parse,8).batch(batch).

TPU-first design: the dataset is parsed and feature-encoded ONCE into dense
columnar numpy arrays (global ids per field + float label), then batch
iteration is pure array slicing — zero per-step Python parse work, so the
host never starves the chip. Parsing+encoding runs through the native C++
loader (rectpu.io.native) when built, with a pandas fallback of identical
semantics. The encoded form is ~110 bytes/example, so hundreds of millions
of examples fit resident per host (``CsvDataset``); datasets beyond RAM use
``StreamingCsvDataset`` — windowed chunk reads + background encode through
the same native parser (rectpu_csv_open_mem), identical iteration contract.

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
    """Position of the input iterator, checkpointable for exact resume.

    ``index`` is the row offset within the current epoch's (sharded) stream
    for both the resident and streaming datasets, so the same state restores
    either."""

    epoch: int = 0
    index: int = 0  # row offset within the current epoch
    seed: int = 0


def read_csv_columns(csv_path: str | Path, columns: list[str],
                     float_cols: set | frozenset = frozenset()) -> dict:
    """Read a CSV into {column -> np array}, applying schema defaults.

    ``float_cols``: columns consumed as raw floats (NumericFeature) — parsed
    float64 so fractional values survive (the int64 default matches TF's
    typed record_defaults for id/bucket columns AND keeps integer hashing
    exact: hash_bucket stringifies ints decimally, so a float dtype would
    hash "3.0" instead of "3"; the native parser strtod's numeric columns
    the same way — see csv_loader.cc)."""
    import pandas as pd

    # string columns must stay strings: pandas would otherwise parse "03364"
    # zipcodes as int 3364, losing leading zeros (TF's decode_csv keeps them)
    str_cols = {c: str for c in columns if is_string_column(c)}
    df = pd.read_csv(csv_path, dtype=str_cols)
    out = {}
    for col in columns:
        default = column_default(col)
        num_dtype = np.float64 if col in float_cols else np.int64
        if col in df.columns:
            s = df[col]
            if is_string_column(col):
                arr = s.fillna(str(default)).astype(str).to_numpy()
            else:
                arr = (
                    pd.to_numeric(s, errors="coerce").fillna(default).to_numpy(dtype=num_dtype)
                )
        else:
            n = len(df)
            if is_string_column(col):
                arr = np.full(n, str(default), dtype=object)
            else:
                arr = np.full(n, default, dtype=num_dtype)
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
            columns = read_csv_columns(
                csv_path, needed + [label_col],
                float_cols={f.name for f in feature_set.numeric},
            )
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

    def apply_row_permutation(self, perm: np.ndarray) -> None:
        """Relabel encoded row ids in place: id -> perm[id] (frequency-aware
        EP placement, parallel/placement.py). Resident dataset: one vectorized
        pass, zero per-batch cost."""
        self.cat_ids = np.asarray(perm, dtype=np.int32)[self.cat_ids]

    # -- batching ------------------------------------------------------------

    def train_index_batches(
        self,
        batch_size: int,
        state: DataState | None = None,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        """Infinite shuffled ROW-INDEX batches of static shape [batch_size].

        Yields (row_indices int64, DataState) — the same batches
        ``train_batches`` materializes, as dataset row numbers. The
        device-resident training path (train/loop.py data_placement) ships
        ONLY these ~32 KB index vectors to the device and gathers the batch
        there; ``train_batches`` gathers on the host. The state machinery is
        shared, so switching placement mid-run (or on restore) reproduces
        the identical batch stream.

        Multi-host: every host walks the SAME epoch-concatenated global
        stream chunked into GLOBAL batches of ``batch_size * num_shards``
        and takes the contiguous block ``[shard_id*batch_size :
        (shard_id+1)*batch_size]`` of each — so the assembled global batch
        matches a single-process run's batch in content AND row order. That
        makes an n-process run compute the same mathematical function as the
        1-process run even for order-sensitive math (dropout masks key on
        the position within the batch). ``DataState.index`` is the global
        row offset within the epoch, identical on every host.
        """
        state = state or DataState(seed=seed)
        epoch, index = state.epoch, state.index
        gbs = batch_size * num_shards
        lo, hi = shard_id * batch_size, (shard_id + 1) * batch_size
        perm = self._perm(epoch, state.seed)
        carry = np.empty((0,), dtype=perm.dtype)
        while True:
            take = gbs - carry.shape[0]
            if index + take <= perm.shape[0]:
                sel = perm[index : index + take]
                index += take
                rows = np.concatenate([carry, sel]) if carry.size else sel
                carry = np.empty((0,), dtype=perm.dtype)
                yield rows[lo:hi], DataState(epoch=epoch, index=index, seed=state.seed)
            else:
                carry = np.concatenate([carry, perm[index:]])
                epoch += 1
                index = 0
                perm = self._perm(epoch, state.seed)

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

        Multi-host: every host takes its contiguous block of each GLOBAL
        batch (see train_index_batches) — together the shards cover each
        epoch exactly once AND the assembled global batch equals the
        single-process batch row-for-row (replaces the reference's
        per-worker tf.data sharding).
        """
        for rows, st in self.train_index_batches(
            batch_size, state=state, seed=seed, shard_id=shard_id,
            num_shards=num_shards,
        ):
            batch = {
                "cat_ids": self.cat_ids[rows],
                "num_vals": self.num_vals[rows],
                "labels": self.labels[rows],
            }
            yield batch, st

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


class StreamingCsvDataset:
    """Out-of-core CSV dataset: windows of chunks are parsed+encoded on
    demand (native C++ when built), so the file is never resident.

    Replaces the resident encode of ``CsvDataset`` for datasets larger than
    host RAM, preserving the same iteration contract (static-shape batches,
    checkpointable ``DataState``, multi-host sharding, padded eval).

    Shuffle model (vs the reference's 16*batch reservoir,
    /root/reference/trainers/ml_100k.py:53-55): per epoch the CHUNK order is
    permuted (seeded, epoch-keyed), chunks are grouped into windows of
    ``window_chunks``, and rows WITHIN a loaded window are fully permuted —
    i.e. a shuffle buffer of window_chunks*chunk_rows rows (~256k default)
    with chunk-level global mixing, strictly stronger than the reference's
    512-row reservoir. A background thread prefetches+encodes the next
    window while the current one is consumed.

    Sharding: each host takes the chunk slice ``chunk_perm[shard::num_shards]``
    — together the shards cover each epoch's chunks exactly once.

    Exact resume: ``DataState.index`` counts rows consumed of this shard's
    epoch stream; restore re-derives the chunk permutation and window
    grouping (both deterministic in (seed, epoch)) and skips to the window
    containing ``index``.
    """

    def __init__(
        self,
        csv_path: str | Path,
        feature_set: FeatureSet,
        label_col: str = "rating",
        cutoff: int = 5,
        chunk_rows: int = 65536,
        window_chunks: int = 4,
        use_native: bool | None = None,
        prefetch: bool = True,
    ):
        self.csv_path = Path(csv_path)
        self.feature_set = feature_set
        self.label_col = label_col
        self.cutoff = cutoff
        self.chunk_rows = chunk_rows
        self.window_chunks = max(1, window_chunks)
        self.prefetch = prefetch
        self._native = None
        if use_native is not False:
            try:
                from rectpu.io import native as _native_mod

                self._native = _native_mod if _native_mod.available() else None
            except Exception:  # pragma: no cover - native build optional
                self._native = None
            if use_native is True and self._native is None:
                raise RuntimeError("native loader requested but not built")
        self._row_perm = None
        self._scan()

    def apply_row_permutation(self, perm: np.ndarray) -> None:
        """Relabel row ids (id -> perm[id]) in every window as it is decoded
        (frequency-aware EP placement, parallel/placement.py)."""
        self._row_perm = np.asarray(perm, dtype=np.int32)

    # -- one cheap indexing pass ------------------------------------------

    def _scan(self, block_size: int = 1 << 24) -> None:
        """Record the byte offset of every chunk_rows-th data line (quote-
        aware: newlines inside quoted fields do not split rows)."""
        offsets = []
        n_rows = 0
        quotes_so_far = 0  # parity tracks the quoted-field state across blocks
        header_end = None
        file_pos = 0
        pending_row_start = None  # byte offset where the next row starts
        with open(self.csv_path, "rb") as f:
            while True:
                block = f.read(block_size)
                if not block:
                    break
                arr = np.frombuffer(block, np.uint8)
                nl_pos = np.flatnonzero(arr == 0x0A)
                if quotes_so_far % 2 == 0 and 0x22 not in arr:
                    row_ends = nl_pos  # fast path: no quotes anywhere
                else:
                    # quote-parity classification, vectorized: a newline ends
                    # a row iff an EVEN number of quotes precede it overall
                    q_pos = np.flatnonzero(arr == 0x22)
                    before = np.searchsorted(q_pos, nl_pos) + quotes_so_far
                    row_ends = nl_pos[before % 2 == 0]
                    quotes_so_far += q_pos.shape[0]
                for nl in row_ends.tolist():
                    pos = file_pos + nl + 1
                    if header_end is None:
                        header_end = pos
                    else:
                        if n_rows % self.chunk_rows == 0:
                            offsets.append(pending_row_start
                                           if pending_row_start is not None
                                           else None)
                        # the row that just ended started at the previous
                        # row boundary; track the NEXT row's start
                        n_rows += 1
                    pending_row_start = pos
                file_pos += len(block)
            file_size = file_pos
        # trailing row without newline
        if pending_row_start is not None and pending_row_start < file_size:
            if n_rows % self.chunk_rows == 0:
                offsets.append(pending_row_start)
            n_rows += 1
        if header_end is None:
            raise ValueError(f"{self.csv_path}: no header line")
        # first chunk starts right after the header
        if offsets and offsets[0] is None:
            offsets[0] = header_end
        with open(self.csv_path, "rb") as f:
            self._header = f.read(header_end)
        self.size = n_rows
        self._chunk_offsets = offsets + [file_size]
        self.num_chunks = len(offsets)
        self._chunk_sizes = [
            min(self.chunk_rows, n_rows - i * self.chunk_rows)
            for i in range(self.num_chunks)
        ]
        logger.debug(
            "streaming dataset indexed: %s rows, %s chunks from %s",
            n_rows, self.num_chunks, self.csv_path,
        )

    # -- window loading ----------------------------------------------------

    def _load_window(self, chunk_ids) -> dict:
        parts = [self._header]
        with open(self.csv_path, "rb") as f:
            for c in chunk_ids:
                f.seek(self._chunk_offsets[c])
                parts.append(f.read(self._chunk_offsets[c + 1] - self._chunk_offsets[c]))
        data = b"".join(parts)
        if self._native is not None:
            from rectpu.io.native.csv_bridge import encode_bytes

            out = encode_bytes(data, self.feature_set, self.label_col, self.cutoff)
            if self._row_perm is not None:
                out["cat_ids"] = self._row_perm[out["cat_ids"]]
            return out
        import io as _io

        needed = [f.name for f in self.feature_set.categorical] + [
            f.name for f in self.feature_set.numeric
        ]
        columns = read_csv_columns(
            _io.BytesIO(data), needed + [self.label_col],
            float_cols={f.name for f in self.feature_set.numeric},
        )
        batch = self.feature_set.encode(columns)
        cat_ids = batch["cat_ids"]
        if self._row_perm is not None:
            cat_ids = self._row_perm[cat_ids]
        return {
            "cat_ids": cat_ids,
            "num_vals": batch.get(
                "num_vals", np.zeros((batch["cat_ids"].shape[0], 0), np.float32)
            ),
            "labels": (columns[self.label_col] >= self.cutoff).astype(np.float32),
        }

    def _epoch_windows(self, epoch: int, seed: int, shard_id: int, num_shards: int):
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, 7]))
        chunk_perm = rng.permutation(self.num_chunks)[shard_id::num_shards]
        wc = self.window_chunks
        windows = [chunk_perm[i:i + wc] for i in range(0, len(chunk_perm), wc)]
        sizes = [int(sum(self._chunk_sizes[c] for c in w)) for w in windows]
        return windows, sizes

    def _window_rows(self, epoch: int, w_idx: int, window, seed: int) -> dict:
        enc = self._load_window(window)
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch, w_idx, 13]))
        perm = rng.permutation(enc["labels"].shape[0])
        return {k: v[perm] for k, v in enc.items()}

    # -- iteration ---------------------------------------------------------

    def train_batches(
        self,
        batch_size: int,
        state: DataState | None = None,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
    ):
        import concurrent.futures

        state = state or DataState(seed=seed)
        epoch, index = state.epoch, state.index
        pool = (
            concurrent.futures.ThreadPoolExecutor(1, thread_name_prefix="rectpu-stream")
            if self.prefetch else None
        )

        def window_plan(ep):
            return self._epoch_windows(ep, state.seed, shard_id, num_shards)

        carry = None
        try:
            while True:
                windows, sizes = window_plan(epoch)
                if not windows:
                    raise ValueError(
                        f"shard {shard_id}/{num_shards} received no chunks "
                        f"({self.num_chunks} total) — lower chunk_rows or shards"
                    )
                starts = np.concatenate([[0], np.cumsum(sizes)])
                # skip directly to the window containing `index` (resume)
                w_idx = int(np.searchsorted(starts, index, side="right") - 1)
                w_idx = min(w_idx, len(windows) - 1)
                fut = None
                while w_idx < len(windows):
                    if fut is not None:
                        rows = fut.result()
                    elif pool is not None:
                        rows = pool.submit(
                            self._window_rows, epoch, w_idx, windows[w_idx], state.seed
                        ).result()
                    else:
                        rows = self._window_rows(epoch, w_idx, windows[w_idx], state.seed)
                    # prefetch the next window (possibly next epoch's first)
                    if pool is not None:
                        if w_idx + 1 < len(windows):
                            fut = pool.submit(
                                self._window_rows, epoch, w_idx + 1,
                                windows[w_idx + 1], state.seed,
                            )
                        else:
                            nw, _ = window_plan(epoch + 1)
                            fut = pool.submit(
                                self._window_rows, epoch + 1, 0, nw[0], state.seed
                            ) if nw else None
                    else:
                        fut = None
                    local = index - int(starts[w_idx])  # offset within window
                    n_w = rows["labels"].shape[0]
                    while local < n_w:
                        have = 0 if carry is None else carry["labels"].shape[0]
                        take = min(batch_size - have, n_w - local)
                        piece = {k: v[local:local + take] for k, v in rows.items()}
                        local += take
                        index += take
                        if carry is not None:
                            piece = {
                                k: np.concatenate([carry[k], piece[k]]) for k in piece
                            }
                            carry = None
                        if piece["labels"].shape[0] == batch_size:
                            piece.setdefault(
                                "num_vals",
                                np.zeros((batch_size, 0), np.float32),
                            )
                            yield piece, DataState(
                                epoch=epoch, index=index, seed=state.seed
                            )
                        else:
                            carry = piece
                    w_idx += 1
                epoch += 1
                index = 0
        finally:
            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)

    def eval_batches(self, batch_size: int, shard_id: int = 0, num_shards: int = 1):
        """One ordered pass; same padding/equal-batch contract as CsvDataset:
        each shard walks the global row stride [shard::num_shards]."""
        max_shard_rows = -(-self.size // num_shards)
        n_batches = max(-(-max_shard_rows // batch_size), 1)
        buf = None
        emitted = 0
        global_row = 0

        def emit(piece):
            n = piece["labels"].shape[0]
            w = np.ones((n,), np.float32)
            if n < batch_size:
                pad = batch_size - n
                piece = {
                    k: np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], v.dtype)]
                    ) for k, v in piece.items()
                }
                w = np.concatenate([w, np.zeros((pad,), np.float32)])
            piece["weights"] = w
            return piece

        for c in range(self.num_chunks):
            enc = self._load_window([c])
            n = enc["labels"].shape[0]
            mask = (np.arange(global_row, global_row + n) % num_shards) == shard_id
            global_row += n
            piece = {k: v[mask] for k, v in enc.items()}
            buf = piece if buf is None else {
                k: np.concatenate([buf[k], piece[k]]) for k in piece
            }
            while buf["labels"].shape[0] >= batch_size:
                out = {k: v[:batch_size] for k, v in buf.items()}
                buf = {k: v[batch_size:] for k, v in buf.items()}
                emitted += 1
                yield emit(out)
        if buf is not None and buf["labels"].shape[0] and emitted < n_batches:
            emitted += 1
            yield emit(buf)
        while emitted < n_batches:
            emitted += 1
            yield emit({
                "cat_ids": np.zeros((0, self.feature_set.num_fields), np.int32),
                "num_vals": np.zeros((0, self.feature_set.num_numeric), np.float32),
                "labels": np.zeros((0,), np.float32),
            })
