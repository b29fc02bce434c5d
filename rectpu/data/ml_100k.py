"""MovieLens-100K ETL: download -> process -> train/test/all/users/items CSVs.

Capability parity with /root/reference/src/data/ml_100k.py (dask version) with
the same output schema, implemented on plain pandas:
  - users: zipcode1/2/3 prefixes (ref :61-64)
  - items: drop title=="unknown"; release_date + release_year (ref :69-72)
  - contexts (all/train/test): timestamp -> datetime, year, month, day,
    ISO week, dayofweek+1 (ref :76-85)
  - inner-join each context x users x items (ref :88-93)
Outputs {train,test,all,users,items}.csv under <dest>/ml-100k/ (ref :152-157).

The GCP/BigQuery variant lives in rectpu.data.bigquery. Download is gated:
in zero-egress environments use ``--synthetic`` to emit schema-identical
synthetic data (rectpu.data.synthetic) instead.
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path
from zipfile import ZipFile

from rectpu.utils.logging import get_logger

logger = get_logger(__name__)

DATA_CONFIG = {
    "users": {
        "filename": "u.user",
        "sep": "|",
        "columns": ["user_id", "age", "gender", "occupation", "zipcode"],
    },
    "items": {
        "filename": "u.item",
        "sep": "|",
        "columns": [
            "item_id", "title", "release", "video_release", "imdb", "unknown", "action",
            "adventure", "animation", "children", "comedy", "crime", "documentary", "drama",
            "fantasy", "filmnoir", "horror", "musical", "mystery", "romance", "scifi",
            "thriller", "war", "western",
        ],
    },
    "all": {"filename": "u.data", "sep": "\t", "columns": ["user_id", "item_id", "rating", "timestamp"]},
    "train": {"filename": "ua.base", "sep": "\t", "columns": ["user_id", "item_id", "rating", "timestamp"]},
    "test": {"filename": "ua.test", "sep": "\t", "columns": ["user_id", "item_id", "rating", "timestamp"]},
}

DEFAULT_URL = "http://files.grouplens.org/datasets/movielens/ml-100k.zip"


def download_data(url: str = DEFAULT_URL, dest_dir: str = "data") -> None:
    """Download and extract the ml-100k zip (idempotent)."""
    import requests

    dest = Path(dest_dir) / Path(url).name
    dest.parent.mkdir(parents=True, exist_ok=True)

    if not dest.exists():
        logger.info("downloading file: %s.", url)
        r = requests.get(url, stream=True, timeout=60)
        r.raise_for_status()
        with dest.open("wb") as f:
            for chunk in r.iter_content(chunk_size=1 << 20):
                f.write(chunk)
        logger.info("file downloaded: %s.", dest)

    if not Path(dest_dir, "ml-100k", "README").exists():
        with dest.open("rb") as f, ZipFile(f, "r") as zf:
            zf.extractall(dest_dir)
        logger.info("file extracted.")


def load_data(src_dir: str = "data/ml-100k") -> dict:
    """Load the 5 raw tables into pandas DataFrames."""
    import pandas as pd

    data = {
        item: pd.read_csv(
            Path(src_dir, conf["filename"]),
            sep=conf["sep"],
            header=None,
            names=conf["columns"],
            encoding="latin-1",
        )
        for item, conf in DATA_CONFIG.items()
    }
    logger.info("data loaded.")
    return data


def process_data(data: dict) -> dict:
    """Feature-enrich and join the raw tables (pandas equivalent of ref :58-96)."""
    import pandas as pd

    users = data["users"].copy()
    zc = users["zipcode"].astype(str)
    users["zipcode1"] = zc.str[0]
    users["zipcode2"] = zc.str[:2]
    users["zipcode3"] = zc.str[:3]
    logger.debug("users data processed.")

    items = data["items"].copy()
    items = items[items["title"] != "unknown"]
    items["release_date"] = pd.to_datetime(items["release"], format="%d-%b-%Y", errors="coerce")
    items["release_year"] = items["release_date"].dt.year
    logger.debug("items data processed.")

    dfs = {}
    for el in ["all", "train", "test"]:
        context = data[el].copy()
        dt = pd.to_datetime(context["timestamp"], unit="s")
        context["datetime"] = dt
        context["year"] = dt.dt.year
        context["month"] = dt.dt.month
        context["day"] = dt.dt.day
        context["week"] = dt.dt.isocalendar().week.astype("int64")
        context["dayofweek"] = dt.dt.dayofweek + 1
        dfs[el] = context.merge(users, "inner", "user_id").merge(items, "inner", "item_id")
    logger.debug("context data processed.")

    dfs["users"] = users
    dfs["items"] = items
    logger.info("data merged.")
    return dfs


def save_data(dfs: dict, save_dir: str = "data/ml-100k") -> None:
    for name, df in dfs.items():
        save_path = str(Path(save_dir, name + ".csv"))
        df.to_csv(save_path, index=False, encoding="utf-8")
        logger.info("data saved: %s.", save_path)


def local_main(args) -> None:
    if getattr(args, "synthetic", False):
        from rectpu.data.synthetic import write_synthetic_dataset

        paths = write_synthetic_dataset(
            Path(args.dest, "ml-100k"),
            train_rows=args.synthetic_rows,
            test_rows=max(args.synthetic_rows // 10, 100),
        )
        logger.info("synthetic data written: %s", paths)
        return
    download_data(args.url, args.dest)
    data_dir = str(Path(args.dest, "ml-100k"))
    data = load_data(data_dir)
    dfs = process_data(data)
    save_data(dfs, data_dir)


def gcp_main(args) -> None:
    from rectpu.data.bigquery import run_gcp_pipeline

    run_gcp_pipeline(args)


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="Download, extract and prepare MovieLens 100k data.")
    subparsers = parser.add_subparsers(title="subcommands")

    local_parser = subparsers.add_parser("local")
    local_parser.add_argument("--url", default=DEFAULT_URL,
                              help="url of MovieLens 100k data (default: %(default)s)")
    local_parser.add_argument("--dest", default="data",
                              help="destination directory (default: %(default)s)")
    local_parser.add_argument("--log-path", default="main.log",
                              help="path of log file (default: %(default)s)")
    local_parser.add_argument("--synthetic", action="store_true",
                              help="generate schema-identical synthetic data instead of downloading")
    local_parser.add_argument("--synthetic-rows", type=int, default=90570,
                              help="synthetic train rows (default: %(default)s)")
    local_parser.set_defaults(main=local_main)

    gcp_parser = subparsers.add_parser("gcp")
    gcp_parser.add_argument("--url", default=DEFAULT_URL)
    gcp_parser.add_argument("--dest", default="data")
    gcp_parser.add_argument("--dataset", default="ml_100k",
                            help="dataset name to save datatables")
    gcp_parser.add_argument("--gcs-bucket", default="recommender-tensorflow",
                            help="google cloud storage bucket for processed files")
    gcp_parser.add_argument("--credentials", default="credentials.json",
                            help="json file containing google cloud credentials")
    gcp_parser.add_argument("--log-path", default="main.log")
    gcp_parser.set_defaults(main=gcp_main)
    return parser


if __name__ == "__main__":
    parser = build_parser()
    args = parser.parse_args()
    logger = get_logger(__name__, log_path=args.log_path, console=True)
    logger.debug("call: %s.", " ".join(sys.argv))
    logger.debug("ArgumentParser: %s.", args)
    try:
        args.main(args)
    except Exception as e:
        logger.exception(e)
        raise
