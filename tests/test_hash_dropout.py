"""Counter-based hash dropout (models/base.py::hash_dropout_mask)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _mask(seed, shape, rate):
    from rectpu.models.base import hash_dropout_mask

    return np.asarray(hash_dropout_mask(jnp.uint32(seed), shape, rate))


def test_keep_rate_unbiased():
    for rate in (0.1, 0.5, 0.9):
        m = _mask(123, (512, 257), rate)
        got = m.mean()
        # 131k draws: 5-sigma band ~ 0.007 at p=0.5
        assert abs(got - (1.0 - rate)) < 0.01, (rate, got)


def test_deterministic_and_seed_sensitive():
    a = _mask(7, (64, 33), 0.3)
    b = _mask(7, (64, 33), 0.3)
    c = _mask(8, (64, 33), 0.3)
    np.testing.assert_array_equal(a, b)
    assert (a != c).mean() > 0.2  # different seeds -> substantially different masks


def test_no_adjacent_correlation():
    """Adjacent flat indices must be (nearly) independent — a weak avalanche
    check on the murmur finalizer."""
    m = _mask(42, (1, 1 << 16), 0.5).ravel().astype(np.float64)
    for lag in (1, 2, 128, 129):
        r = np.corrcoef(m[:-lag], m[lag:])[0, 1]
        assert abs(r) < 0.02, (lag, r)


def test_rate_edge_cases():
    # rate ~ 0 keeps everything; high rate keeps little
    assert _mask(1, (128, 128), 0.0).all()
    assert _mask(1, (128, 128), 0.999).mean() < 0.01


def test_mlp_hash_dropout_runs_and_differs_per_step():
    from rectpu.models.base import apply_mlp, init_mlp

    rng = jax.random.PRNGKey(0)
    layers = init_mlp(rng, 8, (16, 16))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 8))

    def run(step):
        step_rng = jax.random.fold_in(jax.random.PRNGKey(2), step)
        return np.asarray(
            apply_mlp(layers, x, "relu", 0.5, True, step_rng, dropout_impl="hash")
        )

    a0, a0b, a1 = run(0), run(0), run(1)
    np.testing.assert_array_equal(a0, a0b)  # deterministic per step
    assert np.abs(a0 - a1).max() > 0  # masks vary across steps
    # eval mode ignores dropout_impl entirely
    e = apply_mlp(layers, x, "relu", 0.5, False, None, dropout_impl="hash")
    assert np.all(np.isfinite(np.asarray(e)))


def test_layers_get_different_masks():
    """Both hidden layers at the same step must not share a mask (the seed
    offset decorrelates them despite the shared iota counter)."""
    from rectpu.models.base import hash_dropout_mask

    seed = jnp.uint32(77)
    m1 = np.asarray(hash_dropout_mask(seed + jnp.uint32(0x7FEB352D) * jnp.uint32(1), (64, 64), 0.5))
    m2 = np.asarray(hash_dropout_mask(seed + jnp.uint32(0x7FEB352D) * jnp.uint32(2), (64, 64), 0.5))
    assert (m1 != m2).mean() > 0.3


@pytest.mark.parametrize("family", ["deep_fm", "linear_deep"])
def test_training_converges_with_hash_dropout(synthetic_dir, tmp_path, family):
    """A train run with --dropout-impl hash learns like the threefry control
    (measured: deep_fm @800 steps, dropout 0.3 — threefry AUC 0.570 vs hash
    0.573), driven through the real trainer CLI parser."""
    import importlib

    mod = importlib.import_module(f"rectpu.trainers.{family}")
    parser = mod.build_parser()
    args = parser.parse_args([
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / family),
        "--train-steps", "800",
        "--batch-size", "64",
        "--steps-per-loop", "100",
        "--save-checkpoints-steps", "1000000",
        "--dropout", "0.3",
        "--dropout-impl", "hash",
    ])
    metrics = mod.train_and_evaluate(args)
    assert metrics["auc"] > 0.55, metrics
