"""BigQuery ETL variant, exercised end-to-end against a fake client
(reference flow at src/data/ml_100k.py:171-195 + src/gcp_utils.py).

No credentials or cloud libraries needed: a stub ``google.cloud.bigquery``
module is injected and a recording client captures every load / query /
extract job, so the full pipeline (upload x5, enrichment x5, export x5)
runs and its artifacts are asserted."""

import sys
import types
from argparse import Namespace

import pytest

from rectpu.data.bigquery import (
    bigquery_process_data,
    context_enrichment_sql,
    items_enrichment_sql,
    run_gcp_pipeline,
    users_enrichment_sql,
)
from rectpu.data.ml_100k import GENRE_FLAGS, RAW_TABLES


class _Job:
    def result(self):
        return None


class _TableRef:
    def __init__(self, dataset, name):
        self.dataset, self.name = dataset, name


class _DatasetRef:
    def __init__(self, name):
        self.name = name

    def table(self, table_name):
        return _TableRef(self.name, table_name)


class FakeClient:
    """Records every BigQuery interaction instead of performing it."""

    def __init__(self):
        self.created_datasets = []
        self.loads = []      # (dataset, table, n_rows, write_disposition)
        self.queries = []    # (dataset, table, sql, write_disposition)
        self.extracts = []   # (dataset, table, destination_uri)

    def dataset(self, name):
        return _DatasetRef(name)

    def create_dataset(self, ref, exists_ok=False):
        self.created_datasets.append(ref.name)

    def load_table_from_dataframe(self, df, table_ref, job_config=None):
        self.loads.append(
            (table_ref.dataset, table_ref.name, len(df), job_config.write_disposition)
        )
        return _Job()

    def query(self, sql, job_config=None):
        dest = job_config.destination
        self.queries.append((dest.dataset, dest.name, sql, job_config.write_disposition))
        return _Job()

    def extract_table(self, table_ref, destination_uri):
        self.extracts.append((table_ref.dataset, table_ref.name, destination_uri))
        return _Job()


@pytest.fixture
def fake_bigquery_module(monkeypatch):
    """Install a stub google.cloud.bigquery so the lazy imports resolve."""
    bq = types.ModuleType("google.cloud.bigquery")
    bq.LoadJobConfig = lambda write_disposition=None: types.SimpleNamespace(
        write_disposition=write_disposition
    )
    bq.QueryJobConfig = lambda destination=None, write_disposition=None: types.SimpleNamespace(
        destination=destination, write_disposition=write_disposition
    )
    google = types.ModuleType("google")
    cloud = types.ModuleType("google.cloud")
    cloud.bigquery = bq
    google.cloud = cloud
    for name, mod in [("google", google), ("google.cloud", cloud),
                      ("google.cloud.bigquery", bq)]:
        monkeypatch.setitem(sys.modules, name, mod)
    return bq


@pytest.fixture
def raw_data_dir(tmp_path):
    """Pre-populated dest dir so download_data's existence checks all pass."""
    (tmp_path / "ml-100k.zip").write_bytes(b"")
    raw = tmp_path / "ml-100k"
    raw.mkdir()
    (raw / "README").write_text("ml-100k")
    (raw / "u.user").write_text("1|24|M|technician|85711\n2|53|F|other|94043\n")
    genre_cols = "|".join(["0"] * 19)
    (raw / "u.item").write_text(
        f"1|Toy Story (1995)|01-Jan-1995||http://imdb/1|{genre_cols}\n"
    )
    ratings = "1\t1\t5\t874965758\n2\t1\t3\t888550871\n"
    (raw / "u.data").write_text(ratings)
    (raw / "ua.base").write_text(ratings)
    (raw / "ua.test").write_text("1\t1\t5\t874965758\n")
    return tmp_path


def test_generated_sql_covers_reference_semantics():
    """The generated queries carry the reference's columns and expressions
    (src/data/ml_100k.py:99-150) with the join-name bug fixed."""
    users_sql = users_enrichment_sql("ds")
    for col in RAW_TABLES["users"].columns:
        assert col in users_sql
    for width in (1, 2, 3):
        assert f"SUBSTR(zipcode, 0, {width}) AS zipcode{width}" in users_sql
    assert users_sql.endswith("FROM ds.users")

    items_sql = items_enrichment_sql("ds")
    for genre in GENRE_FLAGS:
        assert genre in items_sql
    assert "PARSE_DATE('%d-%b-%Y', release) AS release_date" in items_sql
    assert "EXTRACT(YEAR FROM PARSE_DATE('%d-%b-%Y', release)) AS release_year" in items_sql
    assert items_sql.endswith("WHERE title != 'unknown'")

    ctx_sql = context_enrichment_sql("ds", "train")
    assert "TIMESTAMP_SECONDS(timestamp) AS datetime" in ctx_sql
    for field, alias in [("YEAR", "year"), ("MONTH", "month"), ("DAY", "day"),
                         ("ISOWEEK", "week"), ("DAYOFWEEK", "dayofweek")]:
        assert f"EXTRACT({field} FROM TIMESTAMP_SECONDS(timestamp)) AS {alias}" in ctx_sql
    # the reference's broken join names (users_features/items_features) must
    # NOT appear; the fixed ones must
    assert "users_features" not in ctx_sql and "items_features" not in ctx_sql
    assert "JOIN ds.users_full USING (user_id)" in ctx_sql
    assert "JOIN ds.items_full USING (item_id)" in ctx_sql


def test_process_data_materializes_all_enriched_tables(fake_bigquery_module):
    client = FakeClient()
    bigquery_process_data("ml", client)
    assert [(d, t) for d, t, _, _ in client.queries] == [
        ("ml", "users_full"), ("ml", "items_full"),
        ("ml", "all_full"), ("ml", "train_full"), ("ml", "test_full"),
    ]
    assert all(wd == "WRITE_TRUNCATE" for _, _, _, wd in client.queries)


def test_full_pipeline_with_fake_client(fake_bigquery_module, raw_data_dir):
    client = FakeClient()
    args = Namespace(
        url="http://files.grouplens.org/datasets/movielens/ml-100k.zip",
        dest=str(raw_data_dir), dataset="ml_100k",
        gcs_bucket="bkt", credentials="does-not-exist.json",
    )
    run_gcp_pipeline(args, client=client)

    # all five raw tables uploaded with WRITE_TRUNCATE
    assert {(t, wd) for _, t, _, wd in client.loads} == {
        (name, "WRITE_TRUNCATE") for name in RAW_TABLES
    }
    # row counts flow from the parsed files
    loads = {t: n for _, t, n, _ in client.loads}
    assert loads["users"] == 2 and loads["items"] == 1 and loads["test"] == 1

    # five enrichment queries, then five GCS extracts of the *_full tables
    assert len(client.queries) == 5
    extract_targets = {t for _, t, _ in client.extracts}
    assert extract_targets == {f"{n}_full" for n in RAW_TABLES}
    uris = {u for _, _, u in client.extracts}
    assert f"gs://bkt/{raw_data_dir}/ml-100k/train.csv" in uris
