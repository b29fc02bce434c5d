"""ETL tests: process_data semantics on fabricated raw ml-100k tables
(reference behavior at src/data/ml_100k.py:58-96)."""

import numpy as np
import pandas as pd
import pytest

from rectpu.data.ml_100k import DATA_CONFIG, load_data, process_data, save_data


@pytest.fixture
def raw_dir(tmp_path):
    """Write tiny raw ml-100k-format files (u.user, u.item, u.data...)."""
    users = "1|24|M|technician|85711\n2|53|F|other|94043\n3|23|M|writer|32067\n"
    (tmp_path / "u.user").write_text(users)
    items = (
        '1|Toy Story (1995)|01-Jan-1995||http://imdb/1|0|0|0|1|1|1|0|0|0|0|0|0|0|0|0|0|0|0|0\n'
        '2|GoldenEye (1995)|01-Jan-1995||http://imdb/2|0|1|1|0|0|0|0|0|0|0|0|0|0|0|0|0|1|0|0\n'
        '3|unknown||||1|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0|0\n'
    )
    (tmp_path / "u.item").write_text(items)
    ratings = "1\t1\t5\t874965758\n2\t2\t3\t888550871\n3\t1\t4\t889237482\n1\t2\t2\t878542960\n"
    (tmp_path / "u.data").write_text(ratings)
    (tmp_path / "ua.base").write_text(ratings)
    (tmp_path / "ua.test").write_text("1\t1\t5\t874965758\n")
    return tmp_path


def test_load_and_process(raw_dir):
    data = load_data(raw_dir)
    assert set(data) == {"users", "items", "all", "train", "test"}
    assert list(data["users"].columns) == DATA_CONFIG["users"]["columns"]

    dfs = process_data(data)

    users = dfs["users"]
    # zipcode prefixes (ref :61-64)
    assert users.loc[users.user_id == 1, "zipcode1"].item() == "8"
    assert users.loc[users.user_id == 1, "zipcode2"].item() == "85"
    assert users.loc[users.user_id == 1, "zipcode3"].item() == "857"

    items = dfs["items"]
    # the "unknown" movie is dropped (ref :70); release_year extracted (ref :71-72)
    assert set(items.item_id) == {1, 2}
    assert (items.release_year == 1995).all()

    train = dfs["train"]
    # inner joins: only rows whose user AND item survive
    assert len(train) == 4
    # timestamp-derived fields (ref :76-85)
    row = train[(train.user_id == 1) & (train.item_id == 1)].iloc[0]
    ts = pd.to_datetime(874965758, unit="s")
    assert row["year"] == ts.year and row["month"] == ts.month and row["day"] == ts.day
    assert row["dayofweek"] == ts.dayofweek + 1
    assert row["week"] == ts.isocalendar().week
    # joined user/item attributes present
    assert row["occupation"] == "technician" and row["title"] == "Toy Story (1995)"


def test_save_then_trainable(raw_dir, tmp_path):
    """The ETL output feeds the feature pipeline end-to-end."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.loader import CsvDataset

    data = load_data(raw_dir)
    dfs = process_data(data)
    out = tmp_path / "out"
    out.mkdir()
    save_data(dfs, out)
    ds = CsvDataset(out / "train.csv", ml_100k_feature_set(), use_native=False)
    assert ds.size == 4
    assert ds.cat_ids.shape == (4, 26)
    np.testing.assert_array_equal(np.sort(np.unique(ds.labels)), [0.0, 1.0])
