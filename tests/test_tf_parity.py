"""Parity tests against TensorFlow's own kernels (the reference's substrate).

The image ships TF 2.21, whose compat.v1 surface still contains the exact
kernels the TF-1.12 reference ran on: Fingerprint64 hashing, Bucketize,
StaticVocabularyTable OOV assignment, the v1 optimizers, and the
200-threshold AUC. These tests pin OUR implementations directly to them —
far stronger than re-derived closed forms. Skipped wholesale if TF is absent.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from rectpu.features.hashing import hash_bucket  # noqa: E402
from rectpu.features.schema import BucketizedFeature, VocabFeature  # noqa: E402
from rectpu.train import optimizers as opt_lib  # noqa: E402
from rectpu.train.metrics import finalize, init_state, update_state  # noqa: E402


def test_hash_bucket_parity_random(rng):
    ints = rng.integers(-(2**31), 2**31, size=500)
    tf_buckets = tf.strings.to_hash_bucket_fast(tf.strings.as_string(ints), 1000).numpy()
    np.testing.assert_array_equal(hash_bucket(ints, 1000), tf_buckets)

    words = np.array([f"w{v}_{'x' * (v % 90)}" for v in rng.integers(0, 10**6, size=300)])
    tf_buckets = tf.strings.to_hash_bucket_fast(words, 50).numpy()
    np.testing.assert_array_equal(hash_bucket(words, 50), tf_buckets)


def test_bucketize_parity(rng):
    for boundaries in [tuple(range(15, 66, 10)), tuple(range(1930, 1991, 10))]:
        vals = rng.integers(0, 2100, size=1000)
        ours = BucketizedFeature("x", boundaries).encode(vals)
        tf_out = tf.raw_ops.Bucketize(
            input=tf.constant(vals, tf.float32), boundaries=[float(b) for b in boundaries]
        ).numpy()
        np.testing.assert_array_equal(ours, tf_out)


def test_vocab_oov_parity():
    """OOV bucket assignment must match TF's StaticVocabularyTable
    (vocab_size + Fingerprint64(key) % num_oov), which backs
    categorical_column_with_vocabulary_list."""
    vocab = ("F", "M")
    for num_oov in (1, 3):
        table = tf.lookup.StaticVocabularyTable(
            tf.lookup.KeyValueTensorInitializer(
                tf.constant(list(vocab)), tf.constant([0, 1], tf.int64)
            ),
            num_oov_buckets=num_oov,
        )
        keys = np.array(["F", "M", "null", "X", "unknown", "??"])
        tf_ids = table.lookup(tf.constant(keys)).numpy()
        ours = VocabFeature("gender", vocab, num_oov_buckets=num_oov).encode(keys)
        np.testing.assert_array_equal(ours, tf_ids)


@pytest.mark.parametrize(
    "name,make_tf",
    [
        ("SGD", lambda: tf.compat.v1.train.GradientDescentOptimizer(0.05)),
        ("Adam", lambda: tf.compat.v1.train.AdamOptimizer(0.01)),
        ("Adagrad", lambda: tf.compat.v1.train.AdagradOptimizer(0.05)),
        ("RMSProp", lambda: tf.compat.v1.train.RMSPropOptimizer(0.02)),
        ("Ftrl", lambda: tf.compat.v1.train.FtrlOptimizer(0.1)),
    ],
)
def test_optimizer_parity_vs_tf_v1(name, make_tf, rng):
    """Five update steps on a real variable must match tf.compat.v1.train.*
    elementwise (the exact optimizers the reference's estimators ran)."""
    lr = {"SGD": 0.05, "Adam": 0.01, "Adagrad": 0.05, "RMSProp": 0.02, "Ftrl": 0.1}[name]
    init_val = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(5)]

    var = tf.Variable(init_val)
    tf_opt = make_tf()
    for g in grads:
        tf_opt.apply_gradients([(tf.constant(g), var)])
    tf_final = var.numpy()

    ours = opt_lib.get_optimizer(name, lr)
    params = {"w": jnp.asarray(init_val)}
    state = ours.init(params)
    for g in grads:
        params, state = ours.update({"w": jnp.asarray(g)}, state, params)
    np.testing.assert_allclose(np.asarray(params["w"]), tf_final, rtol=2e-5, atol=1e-7)


def test_streaming_auc_parity_vs_keras(rng):
    """Our 200-threshold confusion-bucket AUC (ROC and PR) must match
    tf.keras.metrics.AUC, the same estimator tf.metrics.auc used."""
    n = 3000
    labels = (rng.random(n) < 0.35).astype(np.float32)
    probs = np.clip(0.3 * labels + 0.5 * rng.random(n), 0, 1).astype(np.float32)

    state = init_state()
    for lo in range(0, n, 700):
        state = update_state(
            state, jnp.asarray(probs[lo : lo + 700]), jnp.asarray(labels[lo : lo + 700])
        )
    ours = finalize(state)

    m_roc = tf.keras.metrics.AUC(num_thresholds=200, curve="ROC")
    m_roc.update_state(labels, probs)
    m_pr = tf.keras.metrics.AUC(num_thresholds=200, curve="PR",
                                summation_method="minoring")
    # trapezoidal PR to mirror tf.metrics.auc's default
    m_pr2 = tf.keras.metrics.AUC(num_thresholds=200, curve="PR",
                                 summation_method="interpolation")
    m_pr.update_state(labels, probs)
    m_pr2.update_state(labels, probs)

    assert abs(float(ours["auc"]) - float(m_roc.result())) < 2e-4
    # PR differs by summation method; ours (trapezoid) sits between the
    # minoring and interpolated keras estimates
    lo = min(float(m_pr.result()), float(m_pr2.result())) - 0.01
    hi = max(float(m_pr.result()), float(m_pr2.result())) + 0.01
    assert lo <= float(ours["auc_precision_recall"]) <= hi
