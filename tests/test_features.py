"""Feature schema + pipeline tests (reference semantics at trainers/ml_100k.py:18-39)."""

import numpy as np
import pytest

from rectpu.features.schema import (
    GENRE,
    BucketizedFeature,
    IdentityFeature,
    VocabFeature,
    ml_100k_feature_set,
)


def test_bucketized_boundaries():
    # TF bucketized_column: value < b[0] -> 0; b[i-1] <= v < b[i] -> i; v >= b[-1] -> len(b)
    f = BucketizedFeature("age", (15, 25, 35, 45, 55, 65))
    vals = np.array([7, 14, 15, 24, 25, 34, 35, 44, 45, 54, 55, 64, 65, 73])
    expect = np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6])
    np.testing.assert_array_equal(f.encode(vals), expect)
    assert f.num_buckets == 7


def test_vocab_with_oov():
    f = VocabFeature("gender", ("F", "M"), num_oov_buckets=1)
    assert f.num_buckets == 3
    out = f.encode(np.array(["F", "M", "null", "X"]))
    assert out[0] == 0 and out[1] == 1
    assert out[2] == 2 and out[3] == 2  # single OOV bucket


def test_identity_clamps():
    f = IdentityFeature("action", 2)
    np.testing.assert_array_equal(f.encode(np.array([0, 1, 1, 5, -1])), [0, 1, 1, 1, 0])


def test_ml100k_feature_set_shape():
    fs = ml_100k_feature_set()
    assert fs.num_fields == 26  # 7 base + 19 genres (ref trainers/ml_100k.py:37)
    # 1000 + 2000 + 7 + 3 + 50 + 1000 + 8 + 19*2 = 4106
    assert fs.total_buckets == 4106
    assert fs.offsets[0] == 0 and fs.offsets[1] == 1000 and fs.offsets[2] == 3000


def test_encode_batch_global_ids():
    fs = ml_100k_feature_set()
    n = 16
    cols = {
        "user_id": np.arange(1, n + 1),
        "item_id": np.arange(1, n + 1) * 3,
        "age": np.full(n, 30),
        "gender": np.array(["F", "M"] * (n // 2)),
        "occupation": np.array(["student"] * n),
        "zipcode": np.array(["85711"] * n),
        "release_year": np.full(n, 1994),
    }
    for g in GENRE:
        cols[g] = np.zeros(n, dtype=np.int64)
    cols["action"] = np.ones(n, dtype=np.int64)
    batch = fs.encode(cols)
    ids = batch["cat_ids"]
    assert ids.shape == (n, 26)
    offs, sizes = fs.offsets, fs.field_sizes
    # every field's ids land in its own offset range
    for f in range(26):
        assert (ids[:, f] >= offs[f]).all() and (ids[:, f] < offs[f] + sizes[f]).all()
    # age 30 -> bucket 2; gender alternates 0/1; action=1 -> 1 within identity field
    assert (ids[:, 2] - offs[2] == 2).all()
    np.testing.assert_array_equal(ids[:, 3] - offs[3], np.array([0, 1] * (n // 2)))
    action_idx = 7 + GENRE.index("action")
    assert (ids[:, action_idx] - offs[action_idx] == 1).all()


def test_numeric_features():
    fs = ml_100k_feature_set(numeric=("age",))
    cols_needed = [f.name for f in fs.categorical]
    n = 4
    cols = {c: np.zeros(n, dtype=np.int64) for c in cols_needed}
    cols["gender"] = np.array(["F"] * n)
    cols["occupation"] = np.array(["o"] * n)
    cols["zipcode"] = np.array(["1"] * n)
    cols["age"] = np.array([10, 20, 30, 40])
    batch = fs.encode(cols)
    assert batch["num_vals"].shape == (n, 1)
    np.testing.assert_allclose(batch["num_vals"][:, 0], [10, 20, 30, 40])


def test_loader_end_to_end(synthetic_dir):
    from rectpu.io.loader import CsvDataset

    fs = ml_100k_feature_set()
    ds = CsvDataset(synthetic_dir["train"], fs, use_native=False)
    assert ds.size == 6000
    assert ds.cat_ids.shape == (6000, 26)
    assert ds.labels.min() >= 0 and ds.labels.max() <= 1
    assert 0.05 < ds.labels.mean() < 0.5  # top-quantile rating -> positive class

    # train batches: static shapes, resumable state
    it = ds.train_batches(512, seed=1)
    b1, s1 = next(it)
    assert b1["cat_ids"].shape == (512, 26) and b1["labels"].shape == (512,)
    # resume from state reproduces the following batch
    b2, s2 = next(it)
    it_resume = ds.train_batches(512, state=s1)
    b2r, _ = next(it_resume)
    np.testing.assert_array_equal(b2["cat_ids"], b2r["cat_ids"])

    # eval batches: one pass, padded tail with zero weights
    total_w = 0.0
    nb = 0
    for eb in ds.eval_batches(512):
        assert eb["cat_ids"].shape == (512, 26)
        total_w += eb["weights"].sum()
        nb += 1
    assert total_w == ds.size
    assert nb == -(-ds.size // 512)


def test_epoch_shuffle_covers_all_rows(synthetic_dir):
    from rectpu.io.loader import CsvDataset

    fs = ml_100k_feature_set()
    ds = CsvDataset(synthetic_dir["test"], fs, use_native=False)
    it = ds.train_batches(100, seed=3)
    seen = []
    for _ in range(ds.size // 100):
        b, _ = next(it)
        seen.append(b["cat_ids"][:, 0])
    # one epoch of batches covers exactly the dataset's user-field multiset
    got = np.sort(np.concatenate(seen))
    expect = np.sort(ds.cat_ids[:, 0])
    np.testing.assert_array_equal(got, expect)
