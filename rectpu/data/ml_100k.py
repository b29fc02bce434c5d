"""MovieLens-100K ETL: raw GroupLens files -> enriched train/test/all/users/items CSVs.

Output-schema parity with the reference ETL (/root/reference/src/data/ml_100k.py:
zipcode prefixes :61-64, unknown-title drop + release_year :69-72, timestamp
calendar fields :76-85, inner joins :88-93, CSV layout :152-157), organized
rectpu's way: one pure enrichment function per table, composed by
``process_data``; plain pandas (no dask — 100k rows fit in memory thousands
of times over).

The GCP/BigQuery variant lives in rectpu.data.bigquery. Download is gated:
in zero-egress environments use ``--synthetic`` to emit schema-identical
synthetic data (rectpu.data.synthetic) instead.
"""

from __future__ import annotations

from argparse import ArgumentParser
from dataclasses import dataclass
from pathlib import Path
from zipfile import ZipFile

from rectpu.utils.logging import get_logger

logger = get_logger(__name__)

DEFAULT_URL = "http://files.grouplens.org/datasets/movielens/ml-100k.zip"

# Interaction tables share one layout; "all" is the full log, train/test are
# MovieLens' predefined ua.base/ua.test split (10 held-out ratings per user).
RATING_COLUMNS = ("user_id", "item_id", "rating", "timestamp")
RATING_TABLES = ("all", "train", "test")

GENRE_FLAGS = (
    "unknown", "action", "adventure", "animation", "children", "comedy", "crime",
    "documentary", "drama", "fantasy", "filmnoir", "horror", "musical", "mystery",
    "romance", "scifi", "thriller", "war", "western",
)


@dataclass(frozen=True)
class RawTable:
    """One raw GroupLens file: where it lives and how to parse it."""

    filename: str
    sep: str
    columns: tuple


RAW_TABLES = {
    "users": RawTable("u.user", "|", ("user_id", "age", "gender", "occupation", "zipcode")),
    "items": RawTable("u.item", "|", ("item_id", "title", "release", "video_release", "imdb") + GENRE_FLAGS),
    "all": RawTable("u.data", "\t", RATING_COLUMNS),
    "train": RawTable("ua.base", "\t", RATING_COLUMNS),
    "test": RawTable("ua.test", "\t", RATING_COLUMNS),
}

# Back-compat mapping shape (name -> {filename, sep, columns}).
DATA_CONFIG = {
    name: {"filename": t.filename, "sep": t.sep, "columns": list(t.columns)}
    for name, t in RAW_TABLES.items()
}


def download_data(url: str = DEFAULT_URL, dest_dir: str = "data") -> None:
    """Fetch and unpack the ml-100k archive; no-op for pieces already present."""
    import requests

    archive = Path(dest_dir) / Path(url).name
    archive.parent.mkdir(parents=True, exist_ok=True)

    if not archive.exists():
        logger.info("etl: fetching %s", url)
        response = requests.get(url, stream=True, timeout=60)
        response.raise_for_status()
        with archive.open("wb") as out:
            for chunk in response.iter_content(chunk_size=1 << 20):
                out.write(chunk)
        logger.info("etl: archive at %s (%d bytes)", archive, archive.stat().st_size)

    if not Path(dest_dir, "ml-100k", "README").exists():
        with archive.open("rb") as f, ZipFile(f, "r") as zf:
            zf.extractall(dest_dir)
        logger.info("etl: archive unpacked under %s", dest_dir)


def load_data(src_dir: str = "data/ml-100k") -> dict:
    """Parse the five raw tables into DataFrames keyed by table name."""
    import pandas as pd

    tables = {}
    for name, spec in RAW_TABLES.items():
        tables[name] = pd.read_csv(
            Path(src_dir, spec.filename),
            sep=spec.sep,
            header=None,
            names=list(spec.columns),
            encoding="latin-1",
        )
        logger.debug("etl: parsed %s (%d rows) from %s", name, len(tables[name]), spec.filename)
    logger.info("etl: %d raw tables parsed from %s", len(tables), src_dir)
    return tables


def enrich_users(users):
    """Add zipcode1/2/3 prefix columns (region granularity ladder)."""
    out = users.copy()
    zipcode = out["zipcode"].astype(str)
    for width in (1, 2, 3):
        out[f"zipcode{width}"] = zipcode.str[:width]
    return out


def enrich_items(items):
    """Drop the placeholder 'unknown' title; derive release_date/release_year."""
    import pandas as pd

    out = items[items["title"] != "unknown"].copy()
    out["release_date"] = pd.to_datetime(out["release"], format="%d-%b-%Y", errors="coerce")
    out["release_year"] = out["release_date"].dt.year
    return out


def enrich_interactions(ratings, users, items):
    """Expand the unix timestamp into calendar fields, then attach user and
    item attributes by inner join (rows whose user or item was dropped
    upstream disappear here too)."""
    import pandas as pd

    out = ratings.copy()
    when = pd.to_datetime(out["timestamp"], unit="s")
    out["datetime"] = when
    out["year"] = when.dt.year
    out["month"] = when.dt.month
    out["day"] = when.dt.day
    out["week"] = when.dt.isocalendar().week.astype("int64")
    out["dayofweek"] = when.dt.dayofweek + 1
    return out.merge(users, "inner", "user_id").merge(items, "inner", "item_id")


def process_data(data: dict) -> dict:
    """Enrich every table; returns {all,train,test,users,items} DataFrames."""
    users = enrich_users(data["users"])
    items = enrich_items(data["items"])
    enriched = {
        name: enrich_interactions(data[name], users, items) for name in RATING_TABLES
    }
    enriched["users"] = users
    enriched["items"] = items
    for name, df in enriched.items():
        logger.debug("etl: %s enriched -> %d rows x %d cols", name, len(df), df.shape[1])
    logger.info("etl: enrichment + joins complete")
    return enriched


def save_data(dfs: dict, save_dir: str = "data/ml-100k") -> None:
    for name, df in dfs.items():
        target = Path(save_dir, name + ".csv")
        df.to_csv(str(target), index=False, encoding="utf-8")
        logger.info("etl: wrote %s (%d rows)", target, len(df))


def local_main(args) -> None:
    if getattr(args, "synthetic", False):
        from rectpu.data.synthetic import write_synthetic_dataset

        paths = write_synthetic_dataset(
            Path(args.dest, "ml-100k"),
            train_rows=args.synthetic_rows,
            test_rows=max(args.synthetic_rows // 10, 100),
        )
        logger.info("etl: synthetic dataset at %s", paths)
        return
    download_data(args.url, args.dest)
    data_dir = str(Path(args.dest, "ml-100k"))
    save_data(process_data(load_data(data_dir)), data_dir)


def gcp_main(args) -> None:
    from rectpu.data.bigquery import run_gcp_pipeline

    run_gcp_pipeline(args)


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="Download, extract and prepare MovieLens 100k data.")
    subparsers = parser.add_subparsers(title="subcommands")

    local_parser = subparsers.add_parser("local")
    local_parser.add_argument("--url", default=DEFAULT_URL,
                              help="where to fetch the MovieLens 100k archive "
                                   "(default: %(default)s)")
    local_parser.add_argument("--dest", default="data",
                              help="directory the extracted + processed CSVs "
                                   "land in (default: %(default)s)")
    local_parser.add_argument("--log-path", default="main.log",
                              help="rotating debug-log file (default: %(default)s)")
    local_parser.add_argument("--synthetic", action="store_true",
                              help="generate schema-identical synthetic data instead of downloading")
    local_parser.add_argument("--synthetic-rows", type=int, default=90570,
                              help="synthetic train rows (default: %(default)s)")
    local_parser.set_defaults(main=local_main)

    gcp_parser = subparsers.add_parser("gcp")
    gcp_parser.add_argument("--url", default=DEFAULT_URL)
    gcp_parser.add_argument("--dest", default="data")
    gcp_parser.add_argument("--dataset", default="ml_100k",
                            help="BigQuery dataset that receives the raw + "
                                 "enriched tables")
    gcp_parser.add_argument("--gcs-bucket", default="recommender-tensorflow",
                            help="GCS bucket the processed CSV extracts are "
                                 "written to")
    gcp_parser.add_argument("--credentials", default="credentials.json",
                            help="service-account key file used to build the "
                                 "BigQuery client")
    gcp_parser.add_argument("--log-path", default="main.log")
    gcp_parser.set_defaults(main=gcp_main)
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    log = get_logger(__name__, log_path=args.log_path, console=True)
    log.debug("etl: invoked with %s", vars(args))
    if not hasattr(args, "main"):
        build_parser().error("a subcommand is required: local | gcp")
    args.main(args)


if __name__ == "__main__":
    main()
