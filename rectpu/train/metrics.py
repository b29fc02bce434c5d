"""Streaming binary-classification metrics as jittable accumulators.

Replaces the reference's TF metric ops
(/root/reference/trainers/model_utils.py:39-54): streaming accuracy, ROC-AUC,
PR-AUC (TF's 200-threshold confusion-bucket estimator, trapezoidal
summation — tf.metrics.auc defaults) and average loss. The state is a small
pytree of counters, so it
  - updates inside jit (one fused pass per eval batch),
  - reduces across a device mesh with a single psum,
  - checkpoints like any other pytree.

``exact_auc`` provides the O(N log N) rank-based ROC-AUC used by tests to
validate the streaming estimator against sklearn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NUM_THRESHOLDS = 200  # tf.metrics.auc default
_KEPSILON = 1e-7


def auc_thresholds(num_thresholds: int = NUM_THRESHOLDS) -> np.ndarray:
    """TF's threshold grid: [-eps, 1/(T-1), ..., (T-2)/(T-1), 1+eps]."""
    inner = [(i + 1) * 1.0 / (num_thresholds - 1) for i in range(num_thresholds - 2)]
    return np.array([-_KEPSILON] + inner + [1.0 + _KEPSILON], dtype=np.float32)


def init_state(num_thresholds: int = NUM_THRESHOLDS) -> dict:
    def z():
        # distinct buffers: a shared zeros array breaks donate_argnums
        return jnp.zeros((num_thresholds,), jnp.float32)

    return {
        "tp": z(),
        "fp": z(),
        "tn": z(),
        "fn": z(),
        "correct": jnp.zeros((), jnp.float32),
        "loss_sum": jnp.zeros((), jnp.float32),
        "count": jnp.zeros((), jnp.float32),
    }


def update_state(
    state: dict,
    probs: jax.Array,
    labels: jax.Array,
    losses: jax.Array | None = None,
    weights: jax.Array | None = None,
) -> dict:
    """Accumulate one batch. probs/labels/losses/weights: [B]."""
    num_thresholds = state["tp"].shape[0]
    thr = jnp.asarray(auc_thresholds(num_thresholds))
    probs = probs.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    w = jnp.ones_like(probs) if weights is None else weights.astype(jnp.float32)

    # confusion counts at each threshold: positive prediction iff prob > thr
    pred_pos = probs[None, :] > thr[:, None]  # [T, B]
    lab_pos = labels[None, :] > 0.5
    wb = w[None, :]
    tp = jnp.sum(jnp.where(pred_pos & lab_pos, wb, 0.0), axis=1)
    fp = jnp.sum(jnp.where(pred_pos & ~lab_pos, wb, 0.0), axis=1)
    fn = jnp.sum(jnp.where(~pred_pos & lab_pos, wb, 0.0), axis=1)
    tn = jnp.sum(jnp.where(~pred_pos & ~lab_pos, wb, 0.0), axis=1)

    class_id = (probs > 0.5).astype(jnp.float32)
    correct = jnp.sum(w * (class_id == labels))
    loss_sum = jnp.zeros(()) if losses is None else jnp.sum(w * losses)

    return {
        "tp": state["tp"] + tp,
        "fp": state["fp"] + fp,
        "tn": state["tn"] + tn,
        "fn": state["fn"] + fn,
        "correct": state["correct"] + correct,
        "loss_sum": state["loss_sum"] + loss_sum,
        "count": state["count"] + jnp.sum(w),
    }


def merge_states(a: dict, b: dict) -> dict:
    return jax.tree.map(lambda x, y: x + y, a, b)


def psum_state(state: dict, axis_name: str) -> dict:
    """Reduce a metric state across a mesh axis (distributed eval)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), state)


def _trapezoid(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.sum((x[:-1] - x[1:]) * (y[:-1] + y[1:]) / 2.0)


def finalize(state: dict, epsilon: float = 1e-7) -> dict:
    """Compute the metric dict from accumulated state (TF formulas)."""
    tp, fp, tn, fn = state["tp"], state["fp"], state["tn"], state["fn"]
    tpr = tp / (tp + fn + epsilon)
    fpr = fp / (fp + tn + epsilon)
    precision = tp / (tp + fp + epsilon)
    auc_roc = _trapezoid(fpr, tpr)
    auc_pr = _trapezoid(tpr, precision)
    count = jnp.maximum(state["count"], 1.0)
    return {
        "accuracy": state["correct"] / count,
        "auc": auc_roc,
        "auc_precision_recall": auc_pr,
        "average_loss": state["loss_sum"] / count,
        "count": state["count"],
    }


# --- losses / head ----------------------------------------------------------


def sigmoid_xent(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-example sigmoid cross-entropy (ref model_utils.py:23-36),
    numerically stable: max(x,0) - x*z + log(1+exp(-|x|))."""
    x = logits.astype(jnp.float32)
    z = labels.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))


def binary_predictions(logits: jax.Array) -> dict:
    """Prediction dict of the binary head (ref model_utils.py:9-20)."""
    logistic = jax.nn.sigmoid(logits)
    return {
        "logits": logits,
        "logistic": logistic,
        "probabilities": logistic,
        "class_id": (logistic > 0.5).astype(jnp.int32),
    }


# --- exact AUC (test oracle) --------------------------------------------------


def exact_auc(probs: np.ndarray, labels: np.ndarray) -> float:
    """Rank-based exact ROC-AUC (ties averaged), used as the test oracle."""
    probs = np.asarray(probs, dtype=np.float64)
    labels = np.asarray(labels).astype(bool)
    n_pos = labels.sum()
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(probs, kind="mergesort")
    ranks = np.empty_like(order, dtype=np.float64)
    sorted_p = probs[order]
    # average ranks over ties
    i = 0
    while i < len(sorted_p):
        j = i
        while j + 1 < len(sorted_p) and sorted_p[j + 1] == sorted_p[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    rank_sum = ranks[labels].sum()
    return float((rank_sum - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))
