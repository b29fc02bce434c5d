"""Frequency-aware EP row placement (parallel/placement.py; RecShard,
arXiv:2201.10095): within-field bijection, hot-row shard balance, pure-
relabeling training equivalence, and dedup-capacity relief."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set
from rectpu.parallel.placement import (
    count_row_frequencies,
    frequency_permutation,
    relabel_table_rows,
    shard_load,
)


def _field_info(fs):
    return (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))


def test_permutation_is_within_field_bijection(rng):
    fs = ml_100k_feature_set()
    padded = -(-fs.total_buckets // 8) * 8
    counts = rng.integers(0, 1000, size=padded)
    perm = frequency_permutation(counts, _field_info(fs), 8, padded)
    assert sorted(perm.tolist()) == list(range(padded))  # bijection
    for off, size in zip(*_field_info(fs)):
        block = np.arange(off, off + size)
        assert set(perm[block].tolist()) == set(block.tolist())  # stays in field
    # padding rows (beyond the last field) stay put
    last = fs.offsets[-1] + fs.field_sizes[-1]
    np.testing.assert_array_equal(perm[last:], np.arange(last, padded))


def test_balances_skewed_field():
    """A zipf-hot field spanning all shards: hash order piles the hot rows on
    shard 0; the placement spreads them within 10% of perfectly even."""
    n_shards, field_rows = 4, 4096
    field_info = ((0,), (field_rows,))
    counts = np.zeros(field_rows)
    ranks = np.arange(1, field_rows + 1)
    counts[:] = 1e6 / ranks**1.2  # hottest rows at the LOWEST ids = shard 0
    before = shard_load(counts, np.arange(field_rows, dtype=np.int32), n_shards)
    perm = frequency_permutation(counts, field_info, n_shards, field_rows)
    after = shard_load(counts, perm, n_shards)
    assert before.max() / before.mean() > 2.0  # genuinely skewed input
    assert after.max() / after.mean() < 1.1
    np.testing.assert_allclose(after.sum(), before.sum())  # traffic conserved


def test_training_is_pure_relabeling(rng):
    """perm(ids) on a row-relabeled init table trains BITWISE identically to
    the unpermuted run — placement changes placement, not math."""
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      table_padding=8)
    model = DeepFMModel(cfg)
    params = model.init(jax.random.PRNGKey(0))
    opt = model.default_optimizer()
    counts = rng.integers(0, 50, size=cfg.padded_buckets)
    perm = frequency_permutation(counts, _field_info(fs), 4, cfg.padded_buckets)

    offs, sizes = fs.offsets, fs.field_sizes
    ids = np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=32) for f in range(fs.num_fields)], 1
    ).astype(np.int32)
    labels = (rng.random(32) < 0.3).astype(np.float32)

    def one_step(params, ids_np):
        batch = {
            "cat_ids": jnp.asarray(ids_np),
            "num_vals": jnp.zeros((32, 0), jnp.float32),
            "labels": jnp.asarray(labels),
        }

        def loss_fn(p):
            return sigmoid_xent(
                model.apply(p, batch, train=False), batch["labels"]
            ).mean()

        grads = jax.grad(loss_fn)(params)
        new_params, _ = opt.update(grads, opt.init(params), params)
        return jax.device_get(new_params)

    p_plain = one_step(params, ids)

    # every per-row leaf must be relabeled: the [V, K] emb table AND the
    # [V] linear weight vector (both are indexed by row id)
    def is_row_leaf(v):
        return getattr(v, "ndim", 0) >= 1 and v.shape[0] == cfg.padded_buckets

    params_rl = jax.tree.map(
        lambda v: jnp.asarray(relabel_table_rows(np.asarray(v), perm))
        if is_row_leaf(v) else v,
        params,
    )
    p_perm = one_step(params_rl, perm[ids])

    p_perm_unrelabeled = jax.tree.map(
        lambda v: np.asarray(v)[perm] if is_row_leaf(v) else v, p_perm
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_plain, p_perm_unrelabeled,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dedup_capacity_relief(rng):
    """Skewed lookups whose hot rows all live on one shard overflow a tight
    peer capacity (zero-filled drops); after placement the same capacity
    carries every request."""
    from rectpu.parallel import make_mesh
    from rectpu.parallel.embedding_ep import make_ep_lookup_dedup

    mesh = make_mesh(2, 4)
    v, k, cap = 512, 8, 24
    table = jnp.asarray(rng.normal(size=(v, k)).astype(np.float32) + 1.0)
    # 80 distinct hot rows, ALL inside shard 0's range [0, 128)
    hot = rng.integers(0, 80, size=(16, 26)).astype(np.int32)
    lookup = make_ep_lookup_dedup(mesh, peer_capacity=cap)

    def dropped(ids_np, tbl):
        got = np.asarray(lookup(tbl, jnp.asarray(ids_np)))
        return int((got == 0.0).all(axis=-1).sum())

    assert dropped(hot, table) > 0  # capacity 24/peer can't carry ~80 from one peer

    counts = count_row_frequencies(hot, v)
    perm = frequency_permutation(counts, ((0,), (v,)), 4, v)
    # relabel table rows the same way so the lookup stays semantically equal
    table_rl = jnp.asarray(relabel_table_rows(np.asarray(table), perm))
    assert dropped(perm[hot], table_rl) == 0
    # and the carried rows are the right ones
    got = np.asarray(lookup(table_rl, jnp.asarray(perm[hot])))
    np.testing.assert_allclose(
        got, np.asarray(jnp.take(table, jnp.asarray(hot), axis=0)), rtol=1e-6
    )


def test_suggest_peer_capacity(rng):
    """The suggested capacity carries a real batch without drops and is far
    below the lossless worst case."""
    from rectpu.parallel.placement import suggest_peer_capacity

    v, n_shards = 512, 4
    ids = rng.integers(0, 200, size=(50000, 4)).astype(np.int32)  # uniform over 200 rows
    counts = count_row_frequencies(ids, v)
    n_lookups = 16 * 4
    cap = suggest_peer_capacity(counts, n_shards, v, n_lookups)
    assert cap % 8 == 0
    assert cap < v // n_shards  # tighter than the lossless bound
    # a fresh batch's per-shard unique-row demand fits
    batch = rng.integers(0, 200, size=(16, 4)).astype(np.int32)
    u = np.unique(batch)
    demand = np.bincount(u // (v // n_shards), minlength=n_shards).max()
    assert demand <= cap


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_trainer_flag_e2e(synthetic_dir, tmp_path):
    """--ep-row-placement freq end-to-end: trains sharded, persists
    row_perm.npy, exports it, and the restored ServingModel remaps request
    ids — predictions equal a no-placement run's bit-for-bit is NOT expected
    (different row labels -> same math, different init draw per row), so we
    assert the serving path self-consistency instead: encode_request applies
    the exported perm."""
    from rectpu.serve.export import latest_export, load_model
    from rectpu.trainers.deep_fm import build_parser, train_and_evaluate

    job_dir = tmp_path / "job"
    args = build_parser().parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(job_dir),
        "--train-steps", "30", "--batch-size", "64", "--steps-per-loop", "10",
        "--num-data-shards", "2", "--num-model-shards", "4",
        "--ep-mode", "dedup", "--ep-row-placement", "freq",
        "--ep-peer-capacity", "auto",
    ])
    metrics = train_and_evaluate(args)
    assert "auc" in metrics
    perm = np.load(job_dir / "row_perm.npy")
    export_dir = latest_export(job_dir)
    assert (export_dir / "row_perm.npy").exists()

    served = load_model(export_dir)
    req = {
        "user_id": [3], "item_id": [7], "age": [30], "gender": ["F"],
        "occupation": ["student"], "zipcode": ["85711"], "release_year": [1994],
    }
    batch = served.encode_request(req)
    served_noperm = load_model(export_dir)
    served_noperm.row_perm = None
    raw = served_noperm.encode_request(req)
    np.testing.assert_array_equal(batch["cat_ids"], perm[raw["cat_ids"]])
    out = served.predict(req)
    assert 0.0 <= float(out["probabilities"][0]) <= 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_restore_guards(synthetic_dir, tmp_path):
    """Placement/checkpoint consistency: the flag over a placement-free
    checkpoint fails fast; restoring WITHOUT the flag auto-applies the
    stored perm (ids must never index the permuted table raw)."""
    from rectpu.trainers.common import build_trainer
    from rectpu.trainers.deep_fm import build_parser

    def make_args(*extra):
        return build_parser().parse_args([
            "--train-csv", str(synthetic_dir["train"]),
            "--test-csv", str(synthetic_dir["test"]),
            "--job-dir", str(tmp_path / "job"),
            "--train-steps", "10", "--batch-size", "64", "--steps-per-loop", "5",
            "--num-data-shards", "2", "--num-model-shards", "4",
            "--ep-mode", "dedup", *extra,
        ])

    from rectpu.trainers.deep_fm import train_and_evaluate

    # run 1: no placement; leaves a checkpoint, no row_perm.npy
    train_and_evaluate(make_args())
    assert not (tmp_path / "job" / "row_perm.npy").exists()

    # adding the flag over that checkpoint must fail fast
    with pytest.raises(ValueError, match="trained without placement"):
        build_trainer(
            make_args("--restore", "--ep-row-placement", "freq"),
            _model_for(make_args()),
        )

    # run 2 fresh WITH placement, then restore WITHOUT the flag: the stored
    # perm is auto-applied (the build succeeds and datasets are remapped)
    train_and_evaluate(make_args("--ep-row-placement", "freq"))
    perm = np.load(tmp_path / "job" / "row_perm.npy")
    trainer = build_trainer(make_args("--restore"), _model_for(make_args()))
    # spot-check: the train dataset's ids live in the permuted label space
    from rectpu.io.loader import CsvDataset
    fs = ml_100k_feature_set()
    raw_ds = CsvDataset(synthetic_dir["train"], fs)
    np.testing.assert_array_equal(trainer.train_ds.cat_ids, perm[raw_ds.cat_ids])


def _model_for(args):
    from rectpu.features.schema import ml_100k_feature_set as _fs
    from rectpu.models import DeepFMModel, TowerConfig

    return DeepFMModel(TowerConfig(
        feature_set=_fs(), embedding_size=args.embedding_size,
        hidden_units=tuple(args.hidden_units), table_padding=128,
    ))
