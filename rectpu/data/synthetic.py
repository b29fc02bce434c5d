"""Synthetic ml-100k-schema data generator.

Produces CSV files with the exact 42-column schema the trainers consume
(/root/reference/trainers/ml_100k.py:3-7), so every downstream component
(feature pipeline, models, benchmarks, tests) can run in environments where
the MovieLens download is unreachable. Ratings are sampled from a planted
user/item latent-factor model so the learning task is non-trivial: models
that actually learn reach a clearly-above-chance AUC.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from rectpu.features.schema import COLUMNS, GENRE

_OCCUPATIONS = [
    "administrator", "artist", "doctor", "educator", "engineer", "entertainment",
    "executive", "healthcare", "homemaker", "lawyer", "librarian", "marketing",
    "none", "other", "programmer", "retired", "salesman", "scientist", "student",
    "technician", "writer",
]


def generate_frame(
    num_rows: int = 10000,
    num_users: int = 943,
    num_items: int = 1682,
    seed: int = 0,
    latent_dim: int = 6,
):
    """Return a pandas DataFrame with the full 42-column trainer schema."""
    import pandas as pd

    rng = np.random.default_rng(seed)

    # planted structure: biases (learnable by linear models) + latent factors
    # (learnable only by embedding interactions, e.g. FM/DNN towers)
    u_fac = rng.normal(scale=0.7, size=(num_users, latent_dim))
    i_fac = rng.normal(scale=0.7, size=(num_items, latent_dim))
    u_bias = rng.normal(scale=1.0, size=num_users)
    i_bias = rng.normal(scale=1.0, size=num_items)
    u_age = rng.integers(7, 74, size=num_users)
    u_gender = rng.choice(["F", "M"], size=num_users, p=[0.3, 0.7])
    u_occ = rng.choice(_OCCUPATIONS, size=num_users)
    u_zip = np.array([f"{z:05d}" for z in rng.integers(0, 99999, size=num_users)])
    i_year = rng.integers(1922, 1999, size=num_items)
    i_genres = (rng.random((num_items, len(GENRE))) < 0.12).astype(np.int64)
    i_genres[:, 0] = 0  # "unknown" genre is rare
    i_title = np.array([f"movie_{i}" for i in range(num_items)])

    user = rng.integers(0, num_users, size=num_rows)
    item = rng.integers(0, num_items, size=num_rows)
    score = (u_fac[user] * i_fac[item]).sum(axis=1)
    score = score + u_bias[user] + i_bias[item]
    score = score + 0.15 * (u_age[user] - 33) / 10.0 + 0.1 * (i_year[item] - 1960) / 10.0
    score = score + 0.2 * (u_gender[user] == "M") + 0.1 * i_genres[item, :].sum(axis=1)
    score += rng.normal(scale=0.8, size=num_rows)
    # map scores to 1..5 ratings by quantile so the label prior resembles ml-100k
    qs = np.quantile(score, [0.10, 0.30, 0.60, 0.82])
    rating = 1 + (score[:, None] >= qs[None, :]).sum(axis=1)

    ts = rng.integers(874724710, 893286638, size=num_rows)  # ml-100k's time range
    dt = pd.to_datetime(ts, unit="s")

    df = pd.DataFrame(
        {
            "user_id": user + 1,
            "item_id": item + 1,
            "rating": rating,
            "timestamp": ts,
            "datetime": dt.astype(str),
            "year": dt.year,
            "month": dt.month,
            "day": dt.day,
            "week": dt.isocalendar().week.astype(np.int64),
            "dayofweek": dt.dayofweek + 1,
            "age": u_age[user],
            "gender": u_gender[user],
            "occupation": u_occ[user],
            "zipcode": u_zip[user],
            "zipcode1": np.array([z[0] for z in u_zip[user]]),
            "zipcode2": np.array([z[:2] for z in u_zip[user]]),
            "zipcode3": np.array([z[:3] for z in u_zip[user]]),
            "title": i_title[item],
            "release": [f"01-Jan-{y}" for y in i_year[item]],
            "video_release": "null",
            "imdb": "null",
        }
    )
    for gi, g in enumerate(GENRE):
        df[g] = i_genres[item, gi]
    df["release_date"] = [f"{y}-01-01" for y in i_year[item]]
    df["release_year"] = i_year[item]
    return df[COLUMNS]


def write_synthetic_dataset(
    dest_dir: str | Path,
    train_rows: int = 20000,
    test_rows: int = 4000,
    seed: int = 0,
    **kwargs,
) -> dict:
    """Write train.csv/test.csv (+all.csv) with the trainer schema; returns paths."""
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    # one planted model for both splits (a per-split model would make
    # generalization impossible); rows are iid so a head/tail split is clean
    full = generate_frame(train_rows + test_rows, seed=seed, **kwargs)
    train = full.iloc[:train_rows]
    test = full.iloc[train_rows:]
    paths = {
        "train": dest / "train.csv",
        "test": dest / "test.csv",
        "all": dest / "all.csv",
    }
    train.to_csv(paths["train"], index=False)
    test.to_csv(paths["test"], index=False)
    import pandas as pd

    pd.concat([train, test]).to_csv(paths["all"], index=False)
    return {k: str(v) for k, v in paths.items()}
