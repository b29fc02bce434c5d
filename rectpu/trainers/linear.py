"""Linear trainer CLI — parity with /root/reference/trainers/linear.py.

Usage: python -m rectpu.trainers.linear [--train-csv ...] [--batch-size 32] ...
Canned-estimator equivalence: LinearClassifier over the 26 sparse columns,
FTRL default optimizer (lr = min(0.2, 1/sqrt(26))).
"""

from argparse import ArgumentParser

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import LinearModel, TowerConfig
from rectpu.trainers.common import add_common_args, run


def train_and_evaluate(args):
    cfg = TowerConfig(
        feature_set=ml_100k_feature_set(),
        embedding_size=args.embedding_size,
        embedding_impl=args.embedding_impl,
        compute_dtype=args.compute_dtype,
        table_grad_dtype=args.table_grad_dtype,
        table_dtype=args.table_dtype,
    )
    return run(args, LinearModel(cfg))


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    add_common_args(parser, job_dir_default="checkpoints/linear")
    # kept for reference-CLI compatibility (linear ignores embeddings)
    parser.add_argument("--embedding-size", type=int, default=4,
                        help="embedding size (default: %(default)s)")
    return parser


if __name__ == "__main__":
    train_and_evaluate(build_parser().parse_args())
