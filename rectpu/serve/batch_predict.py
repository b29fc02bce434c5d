"""Offline batch prediction over an export — ML Engine batch-job parity.

The reference's deployment story includes batch prediction jobs
(``gcloud ml-engine jobs submit prediction`` against the same SavedModel the
online service uses, implied by /root/reference/scripts/mle_deploy.sh +
distributed.md). Equivalent here:

    python -m rectpu.serve.batch_predict --job-dir checkpoints/deep_fm \
        --input-csv data/ml-100k/test.csv --output predictions.jsonl

Reads the input CSV in large chunks (the TPU-efficient path: one big padded
apply per chunk instead of per-row requests), encodes through the same
serving schema as the online server (genre flags optional, defaulting to 0),
and writes ML-Engine-style JSON lines:

    {"probabilities": p, "logits": l, "class_id": c}

Extra columns in the input (rating, timestamp, ...) are ignored, so the ETL
output CSVs are directly scorable. ``--table-quant int8`` and
``--serialized`` mirror the online server's flags.
"""

from __future__ import annotations

import json
from argparse import ArgumentParser

import numpy as np

from rectpu.serve.export import SERVING_REQUIRED, latest_export, load_model
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


def batch_predict(served, input_csv, output_path, batch_size: int = 8192,
                  include_inputs: tuple = (), label_col: str | None = None,
                  cutoff: float = 5.0):
    """Score every row of ``input_csv``; returns ``(rows_written, metrics)``.

    ``label_col`` additionally evaluates against the labels (binarized as
    ``value >= cutoff``, the training rule): exact rank AUC, accuracy, and
    mean log-loss — the offline counterpart of the trainer's eval pass."""
    import pandas as pd

    from rectpu.features.schema import GENRE

    n_total = 0
    all_probs, all_labels = [], []
    with open(output_path, "w") as out:
        for chunk in pd.read_csv(input_csv, chunksize=batch_size):
            cols = {}
            for c in SERVING_REQUIRED:
                if c not in chunk.columns:
                    raise ValueError(f"input csv missing required column {c!r}")
                cols[c] = chunk[c].to_numpy()
            for g in GENRE:
                if g in chunk.columns:
                    cols[g] = chunk[g].to_numpy()
            for f in served.feature_set.numeric:
                if f.name not in cols:
                    cols[f.name] = chunk[f.name].to_numpy()
            preds = served.predict(cols)
            n = len(chunk)
            for i in range(n):
                rec = {
                    "probabilities": float(preds["probabilities"][i]),
                    "logits": float(preds["logits"][i]),
                    "class_id": int(preds["class_id"][i]),
                }
                for c in include_inputs:
                    v = chunk[c].iloc[i]
                    rec[c] = v.item() if isinstance(v, np.generic) else v
                out.write(json.dumps(rec) + "\n")
            if label_col is not None:
                if label_col not in chunk.columns:
                    raise ValueError(f"input csv missing label column {label_col!r}")
                all_probs.append(np.asarray(preds["probabilities"], np.float64))
                all_labels.append(
                    (chunk[label_col].to_numpy(np.float64) >= cutoff).astype(np.float64))
            n_total += n
            logger.info("scored %d rows (total %d)", n, n_total)
    metrics = None
    if label_col is not None and n_total:
        p = np.concatenate(all_probs)
        y = np.concatenate(all_labels)
        metrics = {
            "auc": _exact_auc(p, y),
            "accuracy": float(((p > 0.5) == (y > 0.5)).mean()),
            "average_loss": float(-np.mean(
                y * np.log(np.clip(p, 1e-12, 1.0))
                + (1 - y) * np.log(np.clip(1 - p, 1e-12, 1.0)))),
            "count": float(n_total),
        }
        logger.info("offline eval: %s", metrics)
    return n_total, metrics


def _exact_auc(scores, labels) -> float:
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    for s in np.unique(scores):
        m = scores == s
        ranks[m] = ranks[m].mean()
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def main(argv=None):
    ap = ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--job-dir", default=None,
                    help="job dir whose newest export to score with")
    ap.add_argument("--export-dir", default=None, help="explicit export directory")
    ap.add_argument("--input-csv", required=True,
                    help="rows to score (serving schema; extra columns ignored)")
    ap.add_argument("--output", required=True, help="output JSONL path")
    ap.add_argument("--batch-size", type=int, default=8192,
                    help="rows per device apply (default: %(default)s)")
    ap.add_argument("--serialized", action="store_true",
                    help="execute the export's StableHLO graph")
    ap.add_argument("--table-quant", choices=["int8"], default=None,
                    help="quantize the embedding table at load time")
    ap.add_argument("--include-inputs", nargs="*", default=[],
                    help="input columns to copy into each output record "
                         "(e.g. user_id item_id for joining)")
    ap.add_argument("--label-col", default=None,
                    help="also evaluate offline against this label column "
                         "(binarized as value >= --cutoff): exact AUC, "
                         "accuracy, log-loss")
    ap.add_argument("--cutoff", type=float, default=5.0,
                    help="label binarization threshold (default: %(default)s, "
                         "the training rule rating >= 5)")
    ap.add_argument("--metrics-output", default=None,
                    help="write the offline eval metrics to this JSON path")
    ap.add_argument("--compilation-cache-dir", default="/tmp/jax_cache")
    a = ap.parse_args(argv)

    if a.compilation_cache_dir:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir", a.compilation_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
    if a.serialized and a.table_quant:
        raise ValueError("--serialized and --table-quant are mutually exclusive")
    export_dir = a.export_dir or latest_export(a.job_dir)
    if export_dir is None:
        raise FileNotFoundError(f"no export under {a.job_dir}/export/exporter")
    served = load_model(export_dir, use_serialized=a.serialized)
    served.max_batch = a.batch_size
    if a.table_quant == "int8":
        from rectpu.serve.quant import quantize_serving

        served = quantize_serving(served)
    logger.info("scoring %s with %s", a.input_csv, export_dir)
    n, metrics = batch_predict(served, a.input_csv, a.output, a.batch_size,
                               include_inputs=tuple(a.include_inputs),
                               label_col=a.label_col, cutoff=a.cutoff)
    logger.info("wrote %d predictions to %s", n, a.output)
    if metrics is not None and a.metrics_output:
        with open(a.metrics_output, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
