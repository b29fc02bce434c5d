"""StreamingCsvDataset: out-of-core pipeline vs the resident CsvDataset.

Contracts: per-epoch coverage (every row exactly once), ordered eval
identical to the resident loader, exact checkpoint/resume, multi-shard
partition, native == pandas window encoding.
"""

import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.io.loader import CsvDataset, DataState, StreamingCsvDataset


@pytest.fixture(scope="module")
def fs():
    return ml_100k_feature_set()


@pytest.fixture(scope="module")
def stream_ds(synthetic_dir, fs):
    # chunk_rows small enough for many chunks; 6000 rows -> 12 chunks
    return StreamingCsvDataset(
        synthetic_dir["train"], fs, chunk_rows=500, window_chunks=3,
        use_native=False,
    )


@pytest.fixture(scope="module")
def resident_ds(synthetic_dir, fs):
    return CsvDataset(synthetic_dir["train"], fs, use_native=False)


def _row_keys(cat_ids, labels):
    """Hashable per-row keys (rows are near-unique in the synthetic data)."""
    a = np.ascontiguousarray(cat_ids).view(
        np.dtype((np.void, cat_ids.dtype.itemsize * cat_ids.shape[1]))
    ).ravel()
    return [(bytes(x), float(l)) for x, l in zip(a, labels)]


def test_index_matches_resident(stream_ds, resident_ds):
    assert stream_ds.size == resident_ds.size
    assert stream_ds.num_chunks == -(-stream_ds.size // 500)
    assert sum(stream_ds._chunk_sizes) == stream_ds.size


def test_epoch_covers_every_row_once(stream_ds, resident_ds):
    batch = 250  # 6000 % 250 == 0: one epoch = exactly 24 batches
    it = stream_ds.train_batches(batch)
    got = []
    for _ in range(stream_ds.size // batch):
        b, state = next(it)
        assert b["cat_ids"].shape == (batch, stream_ds.feature_set.num_fields)
        got.extend(_row_keys(b["cat_ids"], b["labels"]))
    want = _row_keys(resident_ds.cat_ids, resident_ds.labels)
    assert sorted(got) == sorted(want)
    # and the second epoch starts a different permutation
    b2, _ = next(it)
    assert state.epoch == 1 or state.index == stream_ds.size


def test_eval_identical_to_resident(stream_ds, resident_ds):
    for sb, rb in zip(stream_ds.eval_batches(512), resident_ds.eval_batches(512)):
        np.testing.assert_array_equal(sb["cat_ids"], rb["cat_ids"])
        np.testing.assert_array_equal(sb["labels"], rb["labels"])
        np.testing.assert_array_equal(sb["weights"], rb["weights"])


def test_exact_resume(stream_ds):
    it = stream_ds.train_batches(192, seed=3)
    seen = []
    for _ in range(9):
        b, state = next(it)
        seen.append(b)
    resumed = stream_ds.train_batches(192, state=state, seed=3)
    for _ in range(7):
        a, _ = next(it)
        b, _ = next(resumed)
        np.testing.assert_array_equal(a["cat_ids"], b["cat_ids"])
        np.testing.assert_array_equal(a["labels"], b["labels"])


def test_resume_across_epoch_boundary(stream_ds):
    batch = 1000
    it = stream_ds.train_batches(batch, seed=5)
    states = []
    for _ in range(7):  # crosses the 6-batch epoch boundary
        b, state = next(it)
        states.append(state)
    resumed = stream_ds.train_batches(batch, state=states[-1], seed=5)
    a, _ = next(it)
    b, _ = next(resumed)
    np.testing.assert_array_equal(a["cat_ids"], b["cat_ids"])


def test_two_shards_partition_epoch(stream_ds, resident_ds):
    batch = 100
    rows = []
    for shard in (0, 1):
        it = stream_ds.train_batches(batch, shard_id=shard, num_shards=2)
        got = []
        # each shard holds half the chunks; collect one epoch's worth
        shard_rows = sum(
            stream_ds._chunk_sizes[c]
            for c in np.random.default_rng(
                np.random.SeedSequence([0, 0, 7])
            ).permutation(stream_ds.num_chunks)[shard::2]
        )
        for _ in range(shard_rows // batch):
            b, _ = next(it)
            got.extend(_row_keys(b["cat_ids"], b["labels"]))
        rows.append(got)
    union = sorted(rows[0] + rows[1])
    want = sorted(_row_keys(resident_ds.cat_ids, resident_ds.labels))
    assert union == want


def test_native_matches_pandas_windows(synthetic_dir, fs):
    native = pytest.importorskip("rectpu.io.native")
    if not native.available():
        pytest.skip("native library not built")
    a = StreamingCsvDataset(synthetic_dir["train"], fs, chunk_rows=700,
                            window_chunks=2, use_native=True, prefetch=False)
    b = StreamingCsvDataset(synthetic_dir["train"], fs, chunk_rows=700,
                            window_chunks=2, use_native=False, prefetch=False)
    wa, _ = a._epoch_windows(0, 0, 0, 1)
    ra = a._window_rows(0, 0, wa[0], 0)
    rb = b._window_rows(0, 0, wa[0], 0)
    np.testing.assert_array_equal(ra["cat_ids"], rb["cat_ids"])
    np.testing.assert_array_equal(ra["labels"], rb["labels"])


def test_train_e2e_on_streaming(synthetic_dir, fs):
    """A few real train steps consume the streaming pipeline end to end."""
    import jax

    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.loop import TrainConfig, Trainer

    ds = StreamingCsvDataset(synthetic_dir["train"], fs, chunk_rows=1000,
                             window_chunks=2, use_native=False)
    eval_ds = StreamingCsvDataset(synthetic_dir["test"], fs, chunk_rows=1000,
                                  window_chunks=2, use_native=False)
    model = DeepFMModel(TowerConfig(feature_set=fs))
    cfg = TrainConfig(batch_size=64, train_steps=30, steps_per_loop=10,
                      save_checkpoints_steps=30)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tr = Trainer(model, model.default_optimizer(), ds, eval_ds, d, cfg)
        metrics = tr.train_and_evaluate(restore=False)
    assert np.isfinite(metrics["average_loss"])
    assert metrics["count"] == eval_ds.size


def test_scan_quote_aware(tmp_path, fs):
    """Newlines and commas inside quoted fields don't split rows, and the
    vectorized quote-parity scan agrees with pandas across block boundaries."""
    rows = []
    for i in range(50):
        occ = f'"write,er\n{i}"' if i % 7 == 0 else "writer"
        rows.append(
            f"{i},{i * 2},25,M,{occ},85711,1994,4"
        )
    csv = "user_id,item_id,age,gender,occupation,zipcode,release_year,rating\n"
    csv += "\n".join(rows) + "\n"
    p = tmp_path / "quoted.csv"
    p.write_text(csv)
    # tiny block size forces quote state to carry across blocks
    ds = StreamingCsvDataset(p, fs, chunk_rows=8, window_chunks=2, use_native=False)
    ds._scan(block_size=64)
    assert ds.size == 50
    import pandas as pd

    assert len(pd.read_csv(p)) == 50
    # windows decode cleanly through pandas (native parser also quote-aware)
    w, _ = ds._epoch_windows(0, 0, 0, 1)
    enc = ds._load_window(w[0])
    assert enc["labels"].shape[0] == sum(ds._chunk_sizes[c] for c in w[0])
