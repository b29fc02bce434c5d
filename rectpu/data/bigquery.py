"""GCP/BigQuery ETL variant.

Capability parity with /root/reference/src/gcp_utils.py and the gcp path of
/root/reference/src/data/ml_100k.py:99-195: upload the raw tables to BigQuery,
run the enrichment/join SQL there, and extract the processed tables to GCS.

Fixes a reference bug: the context queries joined ``users_features`` /
``items_features`` while the created tables are ``users_full`` / ``items_full``
(ref src/data/ml_100k.py:145-146 vs :109,:124); the intended table names are
used here. All imports are lazy so the framework works without GCP libraries.
"""

from __future__ import annotations

from pathlib import Path

from rectpu.utils.logging import get_logger

logger = get_logger(__name__)


def get_credentials(credentials_path: str):
    from google.oauth2 import service_account

    return service_account.Credentials.from_service_account_file(credentials_path)


def get_bigquery_client(credentials_path: str = "credentials.json"):
    """Create a BigQuery client from a service-account json (ref gcp_utils.py:18)."""
    from google.cloud import bigquery

    if Path(credentials_path).exists():
        credentials = get_credentials(credentials_path)
        return bigquery.Client(project=credentials.project_id, credentials=credentials)
    return bigquery.Client()


def df_to_bigquery(df, table_name: str, dataset: str, client):
    """Load a DataFrame into <dataset>.<table_name> (WRITE_TRUNCATE)."""
    from google.cloud import bigquery

    dataset_ref = client.dataset(dataset)
    client.create_dataset(dataset_ref, exists_ok=True)
    job_config = bigquery.LoadJobConfig(write_disposition="WRITE_TRUNCATE")
    job = client.load_table_from_dataframe(df, dataset_ref.table(table_name), job_config=job_config)
    job.result()
    logger.info("table loaded: %s.%s.", dataset, table_name)


def bigquery_to_table(query: str, table_name: str, dataset: str, client):
    """Materialize a query into <dataset>.<table_name> (ref gcp_utils.py:61)."""
    from google.cloud import bigquery

    job_config = bigquery.QueryJobConfig(
        destination=client.dataset(dataset).table(table_name),
        write_disposition="WRITE_TRUNCATE",
    )
    job = client.query(query, job_config=job_config)
    job.result()
    logger.info("query table created: %s.%s.", dataset, table_name)


def bigquery_to_gcs(table_name: str, dataset: str, path: str, bucket: str, client):
    """Extract <dataset>.<table_name> to gs://<bucket>/<path> (ref gcp_utils.py:77)."""
    destination_uri = "gs://{bucket}/{path}".format(bucket=bucket, path=path)
    table_ref = client.dataset(dataset).table(table_name)
    job = client.extract_table(table_ref, destination_uri)
    job.result()
    logger.info("table extracted: %s -> %s.", table_name, destination_uri)


def bigquery_process_data(dataset: str, client) -> None:
    """Run the enrichment SQL (ref src/data/ml_100k.py:99-150, join names fixed)."""
    users_query = (
        "SELECT "
        "   user_id, age, gender, occupation, zipcode, "
        "   SUBSTR(zipcode, 0, 1) AS zipcode1,"
        "   SUBSTR(zipcode, 0, 2) AS zipcode2,"
        "   SUBSTR(zipcode, 0, 3) AS zipcode3 "
        "FROM {dataset}.users"
    ).format(dataset=dataset)
    bigquery_to_table(users_query, "users_full", dataset, client)
    logger.info("users processed.")

    items_query = (
        "SELECT "
        "   item_id, title, release, video_release, imdb, "
        "   unknown, action, adventure, animation, children, comedy, "
        "   crime, documentary, drama, fantasy, filmnoir, horror, "
        "   musical, mystery, romance, scifi, thriller, war, western, "
        "   PARSE_DATE('%d-%b-%Y', release) AS release_date, "
        "   EXTRACT(YEAR FROM PARSE_DATE('%d-%b-%Y', release)) AS release_year "
        "FROM {dataset}.items "
        "WHERE title != 'unknown'"
    ).format(dataset=dataset)
    bigquery_to_table(items_query, "items_full", dataset, client)
    logger.info("items processed.")

    for table in ["all", "train", "test"]:
        context_query = (
            "SELECT "
            "   user_id, item_id, rating, timestamp, "
            "   TIMESTAMP_SECONDS(timestamp) AS datetime, "
            "   EXTRACT(YEAR FROM TIMESTAMP_SECONDS(timestamp)) as year, "
            "   EXTRACT(MONTH FROM TIMESTAMP_SECONDS(timestamp)) as month, "
            "   EXTRACT(DAY FROM TIMESTAMP_SECONDS(timestamp)) as day, "
            "   EXTRACT(ISOWEEK FROM TIMESTAMP_SECONDS(timestamp)) as week, "
            "   EXTRACT(DAYOFWEEK FROM TIMESTAMP_SECONDS(timestamp)) as dayofweek, "
            "   age, gender, occupation, zipcode, zipcode1, zipcode2, zipcode3, "
            "   title, release, video_release, imdb, "
            "   unknown, action, adventure, animation, children, comedy, "
            "   crime, documentary, drama, fantasy, filmnoir, horror, "
            "   musical, mystery, romance, scifi, thriller, war, western, "
            "   release_date, release_year "
            "FROM {dataset}.{table} "
            "JOIN {dataset}.users_full USING (user_id) "
            "JOIN {dataset}.items_full USING (item_id)"
        ).format(dataset=dataset, table=table)
        bigquery_to_table(context_query, table + "_full", dataset, client)
        logger.info("%s processed.", table)


def run_gcp_pipeline(args) -> None:
    """download -> BigQuery upload -> SQL enrichment -> GCS export
    (ref src/data/ml_100k.py:171-195)."""
    from rectpu.data.ml_100k import download_data, load_data

    download_data(args.url, args.dest)
    data_dir = str(Path(args.dest, "ml-100k"))
    data = load_data(data_dir)

    client = get_bigquery_client(args.credentials)
    for name, df in data.items():
        df_to_bigquery(df, name, args.dataset, client)
    bigquery_process_data(args.dataset, client)
    for name in data:
        path = "{dest}/ml-100k/{table}.csv".format(dest=args.dest, table=name)
        bigquery_to_gcs(name + "_full", args.dataset, path, args.gcs_bucket, client)
