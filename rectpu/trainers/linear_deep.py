"""Wide&Deep trainer CLI — parity with /root/reference/trainers/linear_deep.py.

Canned-estimator equivalence: DNNLinearCombinedClassifier — linear tower over
sparse columns (FTRL) + DNN tower over embedding columns (Adagrad), joint
training with per-tower optimizers.
"""

from argparse import ArgumentParser

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import TowerConfig, WideDeepModel
from rectpu.trainers.common import add_common_args, add_deep_args, run


def train_and_evaluate(args):
    from rectpu.trainers.common import apply_preset

    args = apply_preset(args)
    cfg = TowerConfig(
        feature_set=ml_100k_feature_set(),
        embedding_size=args.embedding_size,
        hidden_units=tuple(args.hidden_units),
        dropout=args.dropout,
        dropout_impl=args.dropout_impl,
        embedding_impl=args.embedding_impl,
        compute_dtype=args.compute_dtype,
        table_grad_dtype=args.table_grad_dtype,
        table_dtype=args.table_dtype,
        flat_layout=args.flat_layout,
        packed_linear=args.packed_linear,
        packed_col_pad=args.packed_col_pad,
        scatter_impl=args.scatter_impl,
        table_padding=2048 if args.scatter_impl in ("mxu", "auto") else 128,
    )
    return run(args, WideDeepModel(cfg))


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    add_common_args(parser, job_dir_default="checkpoints/linear_deep")
    add_deep_args(parser)
    parser.add_argument("--packed-linear", action="store_true",
                        help="store the fused [V, K+1] embedding+wide table as ONE "
                             "parameter (skips the per-step concat; per-tower "
                             "FTRL/Adagrad updates apply column-wise)")
    parser.add_argument("--packed-col-pad", type=int, default=0,
                        help="lane-pad the packed table width to this "
                             "multiple (128 recommended for big sparse-"
                             "step tables: per-row XLA scatters need "
                             "128-multiple widths; default: %(default)s)")
    return parser


if __name__ == "__main__":
    train_and_evaluate(build_parser().parse_args())
