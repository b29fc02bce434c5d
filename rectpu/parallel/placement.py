"""Frequency-aware embedding-row placement (RecShard, arXiv:2201.10095).

The reference hosts embedding variables on parameter servers with no
placement policy (SURVEY.md §2c); rectpu row-shards the unified table into
``n_shards`` equal contiguous blocks on the 'model' mesh axis. Real CTR id
traffic is power-law skewed, so the hash-order placement can concentrate the
hot rows of a field on one shard — that shard then owns most of every
batch's unique rows, which costs capacity overflow drops in the dedup EP
exchange (parallel/embedding_ep.py) and load imbalance in any future
per-owner gather schedule.

This module computes a WITHIN-FIELD permutation of row ids that deals each
field's rows, hottest first, round-robin across the table shards the field's
range intersects. Within-field is a hard constraint, not a heuristic: the
split/flat lookup paths (ops/embedding.lookup_split / lookup_flat) and the
MXU scatter backward all rely on every field's rows staying contiguous in
``[offset, offset + size)`` — the permutation therefore only reorders rows
INSIDE each field block, which preserves every layout invariant while still
spreading each large hashed field's hot rows evenly over the shards it spans.

The permutation is a pure relabeling: applied consistently to the ids (at
dataset encode time, once — see CsvDataset.apply_row_permutation) and carried
through checkpoint restore and serving export, training is bitwise identical
to an unpermuted run whose init table rows were relabeled the same way
(tests/test_placement.py pins this).
"""

from __future__ import annotations

import numpy as np


def count_row_frequencies(cat_ids: np.ndarray, total_rows: int) -> np.ndarray:
    """Lookup counts per global row id from encoded [N, F] ids."""
    return np.bincount(
        np.asarray(cat_ids, dtype=np.int64).reshape(-1), minlength=total_rows
    ).astype(np.int64)


def frequency_permutation(
    counts: np.ndarray,
    field_info: tuple[tuple[int, ...], tuple[int, ...]],
    n_shards: int,
    padded_rows: int,
) -> np.ndarray:
    """Build perm with ``perm[old_id] = new_id`` (a bijection on
    [0, padded_rows); identity outside the field ranges, e.g. padding rows).

    Per field: sort the field's rows by descending lookup count, then greedily
    assign each to the LEAST-LOADED intersecting shard that still has free
    slots of this field (longest-processing-time scheduling — near-optimal
    balance even for head-heavy zipf traffic, where round-robin dealing
    leaves the shard holding the #1 row overloaded). Load is tracked across
    fields, so a later field's hot rows avoid the shards earlier fields
    loaded up. Fields contained in a single shard are sorted hottest-first in
    place (harmless; nothing to balance).
    """
    counts = np.asarray(counts, dtype=np.float64)
    offsets, sizes = field_info
    if padded_rows % n_shards != 0:
        raise ValueError(f"padded_rows={padded_rows} not divisible by n_shards={n_shards}")
    shard_size = padded_rows // n_shards
    perm = np.arange(padded_rows, dtype=np.int32)
    load = np.zeros(n_shards, dtype=np.float64)
    for off, size in zip(offsets, sizes):
        off, size = int(off), int(size)
        rows = np.arange(off, off + size, dtype=np.int64)
        row_counts = counts[rows] if off + size <= counts.shape[0] else np.zeros(size)
        order = np.argsort(-row_counts, kind="stable")
        shard_of = rows // shard_size
        shards = np.unique(shard_of)
        # next free slot per intersecting shard, in id order within the field
        slot_lists = {int(s): rows[shard_of == s] for s in shards}
        next_free = {int(s): 0 for s in shards}
        free = {int(s): len(slot_lists[int(s)]) for s in shards}
        for idx in order:
            open_shards = [s for s in slot_lists if free[s] > 0]
            s = min(open_shards, key=lambda s_: load[s_])
            dest = slot_lists[s][next_free[s]]
            next_free[s] += 1
            free[s] -= 1
            load[s] += row_counts[idx]
            perm[rows[idx]] = dest
    return perm


def shard_load(counts: np.ndarray, perm: np.ndarray, n_shards: int) -> np.ndarray:
    """Per-shard total lookup traffic under a placement (diagnostics/tests)."""
    counts = np.asarray(counts, dtype=np.int64)
    padded_rows = perm.shape[0]
    shard_size = padded_rows // n_shards
    new_pos = np.asarray(perm[: counts.shape[0]], dtype=np.int64)
    return np.bincount(new_pos // shard_size, weights=counts, minlength=n_shards)


def suggest_peer_capacity(
    counts: np.ndarray,
    n_shards: int,
    padded_rows: int,
    lookups_per_instance: int,
    safety: float = 1.5,
) -> int:
    """Data-driven peer capacity for the dedup EP exchange (MoE contract,
    embedding_ep.make_ep_lookup_dedup): the expected number of UNIQUE rows a
    batch slice of ``lookups_per_instance`` id draws requests from the
    busiest shard, times a safety factor, rounded up to a multiple of 8.

    E[unique rows of shard s] = sum over rows r in s of 1 - (1 - p_r)^n with
    p_r the row's empirical lookup probability — exact for iid draws, a
    usable upper-ballpark for real batches (within-batch correlation only
    lowers the unique count). ``counts`` must reflect the id labels actually
    used in training (i.e. count AFTER any row placement remap).
    """
    counts = np.asarray(counts, dtype=np.float64)
    if counts.sum() <= 0:
        raise ValueError("counts are empty")
    p = np.zeros(padded_rows)
    p[: counts.shape[0]] = counts / counts.sum()
    shard_size = padded_rows // n_shards
    e_unique = 1.0 - (1.0 - p) ** float(lookups_per_instance)
    per_shard = e_unique.reshape(n_shards, shard_size).sum(axis=1)
    cap = int(np.ceil(per_shard.max() * safety))
    return max(8, -(-cap // 8) * 8)


def relabel_table_rows(table: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """Move row i of ``table`` to row ``perm[i]`` — the table-side relabeling
    that makes a permuted run bitwise-equal to an unpermuted one."""
    out = np.empty_like(np.asarray(table))
    out[np.asarray(perm)] = np.asarray(table)
    return out
