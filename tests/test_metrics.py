"""Streaming-metric tests: AUC vs sklearn/exact oracle, accuracy, loss."""

import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.train.metrics import (
    binary_predictions,
    exact_auc,
    finalize,
    init_state,
    merge_states,
    sigmoid_xent,
    update_state,
)


def _stream_auc(probs, labels, weights=None, batches=7):
    state = init_state()
    for p, l, w in zip(
        np.array_split(probs, batches),
        np.array_split(labels, batches),
        np.array_split(weights if weights is not None else np.ones_like(probs), batches),
    ):
        state = update_state(state, jnp.asarray(p), jnp.asarray(l), weights=jnp.asarray(w))
    return finalize(state)


def test_auc_matches_sklearn(rng):
    from sklearn.metrics import average_precision_score, roc_auc_score

    n = 4000
    labels = (rng.random(n) < 0.3).astype(np.float32)
    # informative but noisy scores
    probs = np.clip(0.25 * labels + 0.4 * rng.random(n), 0, 1).astype(np.float32)
    m = _stream_auc(probs, labels)
    sk_auc = roc_auc_score(labels, probs)
    assert abs(float(m["auc"]) - sk_auc) < 0.005  # 200-bucket estimator tolerance
    assert abs(float(m["auc"]) - exact_auc(probs, labels)) < 0.005
    # PR-AUC close to AP (different estimators; loose tolerance)
    assert abs(float(m["auc_precision_recall"]) - average_precision_score(labels, probs)) < 0.03


def test_auc_perfect_and_random(rng):
    n = 1000
    labels = (rng.random(n) < 0.5).astype(np.float32)
    perfect = labels * 0.9 + 0.05
    m = _stream_auc(perfect, labels)
    assert float(m["auc"]) > 0.995
    const = np.full(n, 0.5, dtype=np.float32)
    m2 = _stream_auc(const, labels)
    assert abs(float(m2["auc"]) - 0.5) < 0.01


def test_weighted_padding_ignored(rng):
    n = 500
    labels = (rng.random(n) < 0.4).astype(np.float32)
    probs = np.clip(0.3 * labels + 0.4 * rng.random(n), 0, 1).astype(np.float32)
    m_ref = _stream_auc(probs, labels)
    # append garbage rows with weight 0 — metrics must not move
    probs2 = np.concatenate([probs, np.ones(100, np.float32)])
    labels2 = np.concatenate([labels, np.zeros(100, np.float32)])
    w2 = np.concatenate([np.ones(n, np.float32), np.zeros(100, np.float32)])
    m_pad = _stream_auc(probs2, labels2, weights=w2)
    assert np.isclose(float(m_ref["auc"]), float(m_pad["auc"]), atol=1e-6)
    assert float(m_pad["count"]) == n


def test_accuracy_and_loss(rng):
    labels = np.array([1, 0, 1, 0], np.float32)
    logits = np.array([2.0, -2.0, -1.0, 3.0], np.float32)
    preds = binary_predictions(jnp.asarray(logits))
    losses = sigmoid_xent(jnp.asarray(logits), jnp.asarray(labels))
    state = update_state(init_state(), preds["probabilities"], jnp.asarray(labels), losses=losses)
    m = finalize(state)
    assert np.isclose(float(m["accuracy"]), 0.5)
    expect_loss = np.mean(np.maximum(logits, 0) - logits * labels + np.log1p(np.exp(-np.abs(logits))))
    assert np.isclose(float(m["average_loss"]), expect_loss, rtol=1e-6)


def test_merge_states_equals_single_stream(rng):
    n = 600
    labels = (rng.random(n) < 0.4).astype(np.float32)
    probs = rng.random(n).astype(np.float32)
    s1 = update_state(init_state(), jnp.asarray(probs[:300]), jnp.asarray(labels[:300]))
    s2 = update_state(init_state(), jnp.asarray(probs[300:]), jnp.asarray(labels[300:]))
    merged = finalize(merge_states(s1, s2))
    single = finalize(update_state(init_state(), jnp.asarray(probs), jnp.asarray(labels)))
    assert np.isclose(float(merged["auc"]), float(single["auc"]), atol=1e-7)


def test_sigmoid_xent_stable_extremes():
    big = jnp.asarray([100.0, -100.0])
    lab = jnp.asarray([1.0, 0.0])
    out = sigmoid_xent(big, lab)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.allclose(np.asarray(out), 0.0, atol=1e-6)
