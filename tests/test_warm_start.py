"""Warm start (tf.estimator WarmStartSettings parity): --warm-start-from."""

import importlib

import numpy as np
import pytest


def _args(synthetic_dir, tmp_path, job, **over):
    mod = importlib.import_module("rectpu.trainers.deep_fm")
    argv = [
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / job),
        "--train-steps", str(over.pop("train_steps", 300)),
        "--batch-size", "64",
        "--steps-per-loop", "50",
        "--save-checkpoints-steps", "1000000",
    ]
    for k, v in over.items():
        argv += [f"--{k.replace('_', '-')}", str(v)]
    return mod, mod.build_parser().parse_args(argv)


@pytest.fixture(scope="module")
def trained(synthetic_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ws_src")
    mod, args = _args(synthetic_dir, tmp, "src", train_steps=400)
    metrics = mod.train_and_evaluate(args)
    return {"job": tmp / "src", "metrics": metrics, "mod": mod}


def test_warm_start_from_job_dir_continues_quality(trained, synthetic_dir, tmp_path):
    """A 1-step warm-started run evaluates like the source's final model
    (fresh init at 1 step would be near-chance)."""
    mod, args = _args(synthetic_dir, tmp_path, "ws", train_steps=1,
                      warm_start_from=str(trained["job"]))
    metrics = mod.train_and_evaluate(args)
    assert abs(metrics["auc"] - trained["metrics"]["auc"]) < 0.02, (
        metrics["auc"], trained["metrics"]["auc"])


def test_warm_start_from_export_dir(trained, synthetic_dir, tmp_path):
    from rectpu.serve.export import latest_export

    exp = latest_export(trained["job"])
    mod, args = _args(synthetic_dir, tmp_path, "ws_exp", train_steps=1,
                      warm_start_from=str(exp))
    metrics = mod.train_and_evaluate(args)
    assert abs(metrics["auc"] - trained["metrics"]["auc"]) < 0.02


def test_warm_start_loses_to_checkpoint_restore(trained, synthetic_dir, tmp_path):
    """TF semantics: an existing checkpoint in the job dir wins over warm
    start, keeping restarts idempotent."""
    mod, args = _args(synthetic_dir, tmp_path, "ws_restore", train_steps=100,
                      save_checkpoints_steps=50)
    m1 = mod.train_and_evaluate(args)
    # restart the SAME job dir with --restore and a warm-start source: the
    # checkpoint at step 100 must win (metrics reproduce m1 exactly)
    mod, args2 = _args(synthetic_dir, tmp_path, "ws_restore", train_steps=100,
                       save_checkpoints_steps=50,
                       warm_start_from=str(trained["job"]))
    args2.restore = True
    m2 = mod.train_and_evaluate(args2)
    assert np.isclose(m1["auc"], m2["auc"], atol=1e-6), (m1, m2)


def test_warm_start_partial_and_mismatch(trained, synthetic_dir, tmp_path):
    """A model variant with a different tower keeps its fresh tower init
    (partial warm start); a different table shape raises."""
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.loader import CsvDataset
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.train.loop import TrainConfig, Trainer

    fs = ml_100k_feature_set()
    # bigger hidden tower: warm-start ONLY the embedding/linear leaves
    # (vars_to_warm_start parity), the mismatched MLP stays fresh
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(32, 16))
    model = DeepFMModel(cfg)
    tr = Trainer(model, model.default_optimizer(),
                 CsvDataset(synthetic_dir["train"], fs),
                 CsvDataset(synthetic_dir["test"], fs),
                 tmp_path / "partial",
                 TrainConfig(batch_size=64, train_steps=1, steps_per_loop=1,
                             save_checkpoints_steps=10**6))
    tr.warm_start_from = str(trained["job"])
    tr.warm_start_vars = ("emb", "linear")
    # the selected leaves really load from the source export; the mismatched
    # MLP stays fresh (a raise here would mean the prefix filter failed)
    import jax as _jax

    from rectpu.serve.export import latest_export
    from rectpu.train.checkpoint import _load_flat_npz

    fresh = model.init(_jax.random.PRNGKey(42))
    warmed = tr._warm_start(fresh)
    src_flat = _load_flat_npz(latest_export(trained["job"]) / "arrays.npz")
    np.testing.assert_array_equal(np.asarray(warmed["emb"]), src_flat["emb"])
    np.testing.assert_array_equal(
        np.asarray(warmed["mlp"][0]["kernel"]), np.asarray(fresh["mlp"][0]["kernel"]))
    m = tr.train_and_evaluate(restore=False)
    assert np.isfinite(m["auc"])

    # different embedding size -> shape mismatch must raise
    cfg2 = TowerConfig(feature_set=fs, embedding_size=8)
    model2 = DeepFMModel(cfg2)
    tr2 = Trainer(model2, model2.default_optimizer(),
                  CsvDataset(synthetic_dir["train"], fs),
                  CsvDataset(synthetic_dir["test"], fs),
                  tmp_path / "mismatch",
                  TrainConfig(batch_size=64, train_steps=1, steps_per_loop=1,
                              save_checkpoints_steps=10**6))
    tr2.warm_start_from = str(trained["job"])
    with pytest.raises(ValueError, match="shape mismatch"):
        tr2.train_and_evaluate(restore=False)


def test_warm_start_rejects_quantized_export(trained, tmp_path):
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.loader import CsvDataset
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import latest_export
    from rectpu.serve.quant import quantize_export
    from rectpu.train.loop import TrainConfig, Trainer

    q = quantize_export(latest_export(trained["job"]), tmp_path / "q")
    fs = ml_100k_feature_set()
    model = DeepFMModel(TowerConfig(feature_set=fs))
    tr = Trainer(model, model.default_optimizer(), None, None,
                 tmp_path / "j",
                 TrainConfig(batch_size=64, train_steps=1, steps_per_loop=1))
    tr.warm_start_from = str(q)
    with pytest.raises(ValueError, match="quantized"):
        tr._warm_start(model.init(jax.random.PRNGKey(0)))
