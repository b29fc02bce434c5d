"""Window-RMW DMA scatter (ops/scatter_dma): bitwise equality vs
`.at[].set` on sorted unique rows, sentinel dropping, collision windows.

Runs in Pallas interpret mode on the CPU test mesh; the TPU compile path
is exercised by benchmarks/_ablate_scatter_dma.py on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.ops.scatter_dma import WROWS, scatter_rows_dma


def make_case(rng, v=4096, c=128, n_unique=300, cap=512):
    uniq = np.unique(rng.integers(0, v, size=n_unique).astype(np.int32))
    rows = np.full((cap,), v, np.int32)
    rows[:uniq.shape[0]] = uniq
    vals = rng.standard_normal((cap, c)).astype(np.float32)
    slab = rng.standard_normal((v + 256, c)).astype(np.float32)
    return slab, rows, vals, uniq


def test_matches_at_set():
    rng = np.random.default_rng(0)
    slab, rows, vals, uniq = make_case(rng)
    got = np.asarray(scatter_rows_dma(
        jnp.asarray(slab), jnp.asarray(rows), jnp.asarray(vals),
        interpret=True))
    want = slab.copy()
    want[rows[:uniq.shape[0]]] = vals[:uniq.shape[0]]
    v = slab.shape[0] - 256
    np.testing.assert_array_equal(got[:v], want[:v])


def test_collision_windows_exact():
    """Multiple updates inside one 8-row window each land on their row."""
    rng = np.random.default_rng(1)
    v, c = 1024, 128
    # dense cluster: every row of two windows + scattered singles
    uniq = np.unique(np.concatenate([
        np.arange(16, 24), np.arange(96, 104),
        rng.integers(0, v, size=40)]).astype(np.int32))
    cap = 128
    rows = np.full((cap,), v, np.int32)
    rows[:uniq.shape[0]] = uniq
    vals = rng.standard_normal((cap, c)).astype(np.float32)
    slab = rng.standard_normal((v + 256, c)).astype(np.float32)
    got = np.asarray(scatter_rows_dma(
        jnp.asarray(slab), jnp.asarray(rows), jnp.asarray(vals),
        interpret=True))
    want = slab.copy()
    want[uniq] = vals[:uniq.shape[0]]
    np.testing.assert_array_equal(got[:v], want[:v])


def test_all_sentinels_noop():
    rng = np.random.default_rng(2)
    v, c = 512, 128
    rows = np.full((64,), v, np.int32)
    vals = rng.standard_normal((64, c)).astype(np.float32)
    slab = rng.standard_normal((v + 256, c)).astype(np.float32)
    got = np.asarray(scatter_rows_dma(
        jnp.asarray(slab), jnp.asarray(rows), jnp.asarray(vals),
        interpret=True))
    np.testing.assert_array_equal(got[:v], slab[:v])


def test_full_table_every_row():
    """Every row of a small table updates (all windows full)."""
    rng = np.random.default_rng(3)
    v, c = 256, 128
    rows = np.arange(v, dtype=np.int32)
    vals = rng.standard_normal((v, c)).astype(np.float32)
    slab = np.zeros((v + 256, c), np.float32)
    got = np.asarray(scatter_rows_dma(
        jnp.asarray(slab), jnp.asarray(rows), jnp.asarray(vals),
        interpret=True))
    np.testing.assert_array_equal(got[:v], vals)


def test_rejects_missing_pad_rows():
    slab = jnp.zeros((512, 128), jnp.float32)
    with pytest.raises(AssertionError, match="pad rows"):
        scatter_rows_dma(slab, jnp.zeros((8,), jnp.int32),
                         jnp.zeros((8, 128), jnp.float32),
                         v_valid=510, interpret=True)


def test_odd_column_width_and_v_valid():
    """C=65 (the real packed-table width) and explicit v_valid: windows are
    full-width slices, so no 128-multiple constraint applies."""
    rng = np.random.default_rng(4)
    v, c, vp = 1000, 65, 1024
    uniq = np.unique(rng.integers(0, v, size=80).astype(np.int32))
    rows = np.full((128,), vp, np.int32)
    rows[:uniq.shape[0]] = uniq
    vals = rng.standard_normal((128, c)).astype(np.float32)
    slab = rng.standard_normal((vp, c)).astype(np.float32)
    got = np.asarray(scatter_rows_dma(
        jnp.asarray(slab), jnp.asarray(rows), jnp.asarray(vals),
        v_valid=v, interpret=True))
    want = slab.copy()
    want[uniq] = vals[:uniq.shape[0]]
    np.testing.assert_array_equal(got[:v], want[:v])


def test_chunked_calls_share_boundary_windows():
    """The >24k-window SMEM cap splits big updates into sequential kernel
    calls (scatter_rows_dma does this internally); an 8-row window split
    across two chunks still lands both chunks' rows, because the later
    chunk re-reads the window AFTER the earlier chunk's write. Chunk
    boundaries of 100 rows (not window-aligned) exercise exactly that."""
    rng = np.random.default_rng(5)
    v, c = 2048, 128
    rows = np.arange(0, 600, dtype=np.int32)  # dense: many shared windows
    cap = 640
    rows_p = np.full((cap,), v + 256, np.int32)
    rows_p[:rows.shape[0]] = rows
    vals = rng.standard_normal((cap, c)).astype(np.float32)
    slab = rng.standard_normal((v + 256, c)).astype(np.float32)

    out = jnp.asarray(slab)
    for s in range(0, cap, 100):
        e = min(s + 100, cap)
        out = scatter_rows_dma(
            out, jnp.asarray(rows_p[s:e]), jnp.asarray(vals[s:e]),
            v_valid=v, interpret=True)
    got = np.asarray(out)
    want = slab.copy()
    want[rows] = vals[:rows.shape[0]]
    np.testing.assert_array_equal(got[:v], want[:v])
