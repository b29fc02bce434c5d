"""End-to-end AUC oracle: the reference's DeepFM math on TF's OWN kernels.

The image has no tf.estimator, so the TF-1.12 reference trainers
(/root/reference/trainers/deep_fm.py) can't run verbatim — but TF 2.21's
compat surface has every kernel they delegate to: v1 feature columns
(hash/vocab/bucketize/identity + embedding_column + linear_model +
input_layer), graph sessions, and v1 AdamOptimizer. This test hand-assembles
the reference model_fn (ref deep_fm.py:11-125: linear_model + shared
input_layer + the 0.5*((Σv)²−Σv²) FM identity + dense stack + sigmoid CE +
Adam) from exactly those pieces, trains it on the synthetic ml-100k data,
and pins rectpu's DeepFM to the same test AUC — the closest possible
stand-in for "run the reference and compare" in this egress-less image.

Both sides: K=4, hidden (16,16), dropout 0, Adam(1e-3), batch 32, 2000
steps. Inits and data order differ (different RNGs), so the pin is on
converged ranking quality, not bitwise values.
"""

import numpy as np

from rectpu.features.schema import GENRE

STR_COLS = ("gender", "occupation", "zipcode")
INT_COLS = ("user_id", "item_id", "age", "release_year")


def _load_raw(csv_path):
    import pandas as pd

    df = pd.read_csv(csv_path)
    feats = {}
    for c in INT_COLS:
        feats[c] = df[c].to_numpy(np.int64)
    for c in STR_COLS:
        feats[c] = df[c].astype(str).to_numpy()
    for g in GENRE:
        feats[g] = df[g].to_numpy(np.int64)
    labels = (df["rating"].to_numpy() >= 5).astype(np.float32)
    return feats, labels


def exact_auc(scores, labels):
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    for s in np.unique(scores):
        m = scores == s
        ranks[m] = ranks[m].mean()
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def _tf_reference_columns(tf):
    """The 26 columns of ref trainers/ml_100k.py:18-39, on TF's kernels."""
    fc = tf.feature_column
    cols = [
        fc.categorical_column_with_hash_bucket("user_id", 1000, dtype=tf.int64),
        fc.categorical_column_with_hash_bucket("item_id", 2000, dtype=tf.int64),
        fc.bucketized_column(fc.numeric_column("age"),
                             list(range(15, 66, 10))),
        fc.categorical_column_with_vocabulary_list(
            "gender", ["F", "M"], num_oov_buckets=1),
        fc.categorical_column_with_hash_bucket("occupation", 50),
        fc.categorical_column_with_hash_bucket("zipcode", 1000),
        fc.bucketized_column(fc.numeric_column("release_year"),
                             list(range(1930, 1991, 10))),
    ]
    cols.extend(
        fc.categorical_column_with_identity(g, num_buckets=2) for g in GENRE
    )
    return cols


def _tf_oracle_probs(train_csv, test_csv, arch="deep_fm", steps=2000, batch=32,
                     k=4, hidden=(16, 16), seed=0):
    """Train a reference model assembled from TF kernels; return test probs.

    arch selects the estimator being mirrored:
      - "linear":      LinearClassifier = linear_model + FTRL(min(0.2, 1/sqrt(26)))
      - "deep":        DNNClassifier = input_layer + dense stack + Adagrad(0.05)
      - "linear_deep": DNNLinearCombinedClassifier = both towers, per-tower
                       FTRL + Adagrad (canned defaults)
      - "deep_fm":     the custom model_fn = linear + FM + DNN, Adam(1e-3)
    """
    import math

    import tensorflow as tf

    v1 = tf.compat.v1
    tr_feats, tr_labels = _load_raw(train_csv)
    te_feats, te_labels = _load_raw(test_csv)

    with tf.Graph().as_default():
        v1.set_random_seed(seed)
        ph = {}
        for c in INT_COLS:
            ph[c] = v1.placeholder(tf.int64, [None], name=c)
        for c in STR_COLS:
            ph[c] = v1.placeholder(tf.string, [None], name=c)
        for g in GENRE:
            ph[g] = v1.placeholder(tf.int64, [None], name=g)
        labels_ph = v1.placeholder(tf.float32, [None])
        # feature columns want [B, 1] dense inputs (serving_input_fn shape,
        # ref trainers/ml_100k.py:84-87)
        feats2d = {name: tf.expand_dims(t, -1) for name, t in ph.items()}
        # age/release_year reach bucketized numeric columns as floats
        feats2d["age"] = tf.cast(feats2d["age"], tf.float32)
        feats2d["release_year"] = tf.cast(feats2d["release_year"], tf.float32)

        cat_cols = _tf_reference_columns(tf)
        lr_ftrl = min(0.2, 1.0 / math.sqrt(len(cat_cols)))
        use_linear = arch in ("linear", "linear_deep", "deep_fm")
        use_deep = arch in ("deep", "linear_deep", "deep_fm")

        logits_parts = []
        linear_vars_before = len(v1.global_variables())
        if use_linear:
            # linear tower (ref deep_fm.py:37-44 / LinearClassifier)
            logits_parts.append(v1.feature_column.linear_model(dict(feats2d), cat_cols))
        linear_vars = v1.global_variables()[linear_vars_before:]

        dnn_vars_before = len(v1.global_variables())
        if use_deep:
            # shared embedding input layer (ref :52-73 / DNNClassifier)
            deep_cols = [tf.feature_column.embedding_column(c, k) for c in cat_cols]
            inp = v1.feature_column.input_layer(dict(feats2d), deep_cols)  # [B, 26k]
            if arch == "deep_fm":
                # FM second order (ref :76-91)
                e = tf.reshape(inp, [-1, len(cat_cols), k])
                s = tf.reduce_sum(e, 1)
                logits_parts.append(0.5 * tf.reduce_sum(
                    tf.square(s) - tf.reduce_sum(tf.square(e), 1), 1, keepdims=True))
            # DNN tower (ref :93-111; dropout 0 here)
            x = inp
            dims = [int(inp.shape[-1])] + list(hidden)
            for i in range(len(hidden)):
                w = v1.get_variable(f"dnn_w{i}", [dims[i], dims[i + 1]],
                                    initializer=v1.glorot_uniform_initializer(seed=seed + i))
                b = v1.get_variable(f"dnn_b{i}", [dims[i + 1]],
                                    initializer=v1.zeros_initializer())
                x = tf.nn.relu(tf.matmul(x, w) + b)
            w_out = v1.get_variable("dnn_out_w", [dims[-1], 1],
                                    initializer=v1.glorot_uniform_initializer(seed=seed + 99))
            b_out = v1.get_variable("dnn_out_b", [1], initializer=v1.zeros_initializer())
            logits_parts.append(tf.matmul(x, w_out) + b_out)
        dnn_vars = v1.global_variables()[dnn_vars_before:]

        logits = tf.squeeze(tf.add_n(logits_parts), -1)
        probs = tf.sigmoid(logits)
        loss = tf.reduce_mean(
            tf.nn.sigmoid_cross_entropy_with_logits(labels=labels_ph, logits=logits))
        if arch == "deep_fm":
            train_op = v1.train.AdamOptimizer(1e-3).minimize(loss)
        elif arch == "linear":
            train_op = v1.train.FtrlOptimizer(lr_ftrl).minimize(loss)
        elif arch == "deep":
            train_op = v1.train.AdagradOptimizer(0.05).minimize(loss)
        else:  # linear_deep: canned per-tower optimizers
            train_op = tf.group(
                v1.train.FtrlOptimizer(lr_ftrl).minimize(loss, var_list=linear_vars),
                v1.train.AdagradOptimizer(0.05).minimize(loss, var_list=dnn_vars),
            )

        def feed(feats, idx, labels=None):
            fd = {ph[c]: feats[c][idx] for c in ph}
            if labels is not None:
                fd[labels_ph] = labels[idx]
            return fd

        rng = np.random.default_rng(seed)
        n = len(tr_labels)
        with v1.Session() as sess:
            sess.run([v1.global_variables_initializer(), v1.tables_initializer()])
            for _ in range(steps):
                idx = rng.integers(0, n, batch)
                sess.run(train_op, feed(tr_feats, idx, tr_labels))
            out = []
            for lo in range(0, len(te_labels), 4096):
                idx = np.arange(lo, min(lo + 4096, len(te_labels)))
                out.append(sess.run(probs, feed(te_feats, idx)))
    return np.concatenate(out), te_labels


import pytest


@pytest.mark.parametrize("family,steps,tol", [
    ("linear", 2000, 0.02),
    # DNN-only is a high-variance family: the TF oracle's own AUC across
    # seeds at 8000 steps spans 0.574-0.633 (measured; no wide memorization
    # path, small hidden units, hashed collisions), and ours spans
    # 0.569-0.595 — overlapping distributions. A single-seed pin needs the
    # wider tolerance; the mean-level agreement is what matters.
    ("deep", 3000, 0.06),
    ("linear_deep", 2000, 0.02),
    ("deep_fm", 2000, 0.02),
])
def test_auc_matches_tf_kernel_oracle(synthetic_dir, tmp_path, family, steps, tol):
    import importlib

    # ours: identical config through the real trainer CLI
    mod = importlib.import_module(f"rectpu.trainers.{family}")
    argv = [
        "--train-csv", str(synthetic_dir["train"]),
        "--test-csv", str(synthetic_dir["test"]),
        "--job-dir", str(tmp_path / family),
        "--train-steps", str(steps), "--batch-size", "32",
        "--steps-per-loop", "200", "--save-checkpoints-steps", "1000000",
    ]
    if family != "linear":  # the linear trainer has no dropout flag
        argv += ["--dropout", "0.0"]
    ours = mod.train_and_evaluate(mod.build_parser().parse_args(argv))

    tf_probs, te_labels = _tf_oracle_probs(
        synthetic_dir["train"], synthetic_dir["test"], arch=family, steps=steps)
    tf_auc = exact_auc(tf_probs, te_labels)

    # different inits/data order: pin converged ranking quality, and require
    # the TF side to have actually learned
    assert tf_auc > 0.55, tf_auc
    assert abs(ours["auc"] - tf_auc) < tol, (family, ours["auc"], tf_auc)
