"""Offline batch prediction (rectpu/serve/batch_predict.py)."""

import json

import numpy as np
import pytest


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    import jax

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DeepFMModel, TowerConfig
    from rectpu.serve.export import export_model

    tmp = tmp_path_factory.mktemp("bp")
    model = DeepFMModel(TowerConfig(feature_set=ml_100k_feature_set()))
    params = model.init(jax.random.PRNGKey(1))
    return export_model(params, model, tmp, step=1)


def test_batch_predict_scores_etl_csv(export_dir, synthetic_dir, tmp_path):
    """The ETL output CSV (42 cols) scores directly; predictions match the
    online path row-for-row."""
    from rectpu.serve.batch_predict import batch_predict
    from rectpu.serve.export import load_model

    served = load_model(export_dir)
    out = tmp_path / "preds.jsonl"
    n, _ = batch_predict(served, synthetic_dir["test"], out, batch_size=512,
                         include_inputs=("user_id", "item_id"))
    lines = [json.loads(line) for line in out.read_text().splitlines()]
    assert n == len(lines) == 1200
    p = np.asarray([r["probabilities"] for r in lines])
    assert np.all((p >= 0) & (p <= 1))
    assert all("user_id" in r and "item_id" in r for r in lines)

    # online parity on the first rows
    import pandas as pd

    head = pd.read_csv(synthetic_dir["test"], nrows=5)
    req = {c: head[c].to_numpy() for c in
           ["user_id", "item_id", "age", "gender", "occupation", "zipcode",
            "release_year"]}
    from rectpu.features.schema import GENRE

    for g in GENRE:
        req[g] = head[g].to_numpy()
    online = served.predict(req)
    np.testing.assert_allclose(p[:5], online["probabilities"], rtol=1e-5, atol=1e-6)


def test_batch_predict_cli(export_dir, synthetic_dir, tmp_path):
    """The __main__ surface end-to-end, including --table-quant int8."""
    from rectpu.serve.batch_predict import main

    out = tmp_path / "q.jsonl"
    main([
        "--export-dir", str(export_dir),
        "--input-csv", str(synthetic_dir["test"]),
        "--output", str(out),
        "--batch-size", "640",
        "--table-quant", "int8",
        "--compilation-cache-dir", "",
    ])
    lines = out.read_text().splitlines()
    assert len(lines) == 1200
    rec = json.loads(lines[0])
    assert set(rec) == {"probabilities", "logits", "class_id"}


def test_batch_predict_missing_column_errors(export_dir, tmp_path):
    import pandas as pd

    from rectpu.serve.batch_predict import batch_predict
    from rectpu.serve.export import load_model

    bad = tmp_path / "bad.csv"
    pd.DataFrame({"user_id": [1], "item_id": [2]}).to_csv(bad, index=False)
    with pytest.raises(ValueError, match="missing required column"):
        batch_predict(load_model(export_dir), bad, tmp_path / "o.jsonl")


def test_batch_predict_offline_eval(export_dir, synthetic_dir, tmp_path):
    """--label-col computes exact AUC/accuracy/log-loss in the same pass,
    matching the trainer's eval on the same export."""
    import json as _json

    from rectpu.serve.batch_predict import main

    mpath = tmp_path / "metrics.json"
    main([
        "--export-dir", str(export_dir),
        "--input-csv", str(synthetic_dir["test"]),
        "--output", str(tmp_path / "p.jsonl"),
        "--label-col", "rating",
        "--metrics-output", str(mpath),
        "--compilation-cache-dir", "",
    ])
    m = _json.loads(mpath.read_text())
    assert m["count"] == 1200
    assert 0.0 <= m["auc"] <= 1.0
    assert m["average_loss"] > 0
    # the export is untrained (random init): AUC near chance
    assert abs(m["auc"] - 0.5) < 0.1
