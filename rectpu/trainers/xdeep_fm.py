"""xDeepFM trainer CLI (beyond-reference model family).

No reference counterpart — the reference zoo stops at DeepFM
(/root/reference/trainers/). Flags follow the zoo's conventions plus the
CIN-specific --cin-units (compressed-interaction layer widths,
arXiv:1803.05170) and the DeepFM-style component toggles.
"""

from argparse import ArgumentParser

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import TowerConfig, XDeepFMModel
from rectpu.trainers.common import add_common_args, add_deep_args, run
from rectpu.train.optimizers import get_optimizer


def train_and_evaluate(args):
    from rectpu.trainers.common import apply_preset

    args = apply_preset(args)
    cfg = TowerConfig(
        feature_set=ml_100k_feature_set(numeric=tuple(args.numeric_columns or ())),
        embedding_size=args.embedding_size,
        hidden_units=tuple(args.hidden_units),
        dropout=args.dropout,
        dropout_impl=args.dropout_impl,
        embedding_impl=args.embedding_impl,
        compute_dtype=args.compute_dtype,
        table_grad_dtype=args.table_grad_dtype,
        table_dtype=args.table_dtype,
        flat_layout=args.flat_layout,
        packed_linear=args.flat_layout or args.packed_linear,
        packed_col_pad=args.packed_col_pad,
        scatter_impl=args.scatter_impl,
        table_padding=2048 if args.scatter_impl in ("mxu", "auto") else 128,
    )
    model = XDeepFMModel(
        cfg,
        use_linear=not args.exclude_linear,
        use_cin=not args.exclude_cin,
        use_dnn=not args.exclude_dnn,
        cin_units=tuple(args.cin_units),
        cin_layout=args.cin_layout,
    )
    optimizer = get_optimizer(args.optimizer, args.learning_rate)
    return run(args, model, optimizer)


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    add_common_args(parser, job_dir_default="checkpoints/xdeep_fm")
    add_deep_args(parser)
    parser.add_argument("--cin-units", nargs="+", type=int, default=[64, 64],
                        help="CIN layer widths (default: %(default)s)")
    parser.add_argument("--cin-layout", choices=["legacy", "kmajor"],
                        default="legacy",
                        help="CIN tensor layout: kmajor removes the "
                             "per-call output relayouts (round-5; "
                             "default: %(default)s)")
    parser.add_argument("--exclude-linear", action="store_true",
                        help="drop the linear component")
    parser.add_argument("--exclude-cin", action="store_true",
                        help="drop the CIN component")
    parser.add_argument("--exclude-dnn", action="store_true",
                        help="drop the DNN component")
    parser.add_argument("--packed-linear", action="store_true",
                        help="store the fused [V, K+1] table as one parameter")
    parser.add_argument("--packed-col-pad", type=int, default=0,
                        help="lane-pad the packed table width to this "
                             "multiple (128 recommended for big sparse-"
                             "step tables: per-row XLA scatters need "
                             "128-multiple widths; default: %(default)s)")
    parser.add_argument("--optimizer", default="Adam",
                        choices=["Adagrad", "Adam", "Ftrl", "RMSProp", "SGD"],
                        help="optimizer (default: %(default)s)")
    parser.add_argument("--learning-rate", type=float, default=0.001,
                        help="learning rate (default: %(default)s)")
    parser.add_argument("--numeric-columns", nargs="*", default=[],
                        help="numeric feature columns fed via the value*vector "
                             "embedding trick")
    return parser


if __name__ == "__main__":
    train_and_evaluate(build_parser().parse_args())
