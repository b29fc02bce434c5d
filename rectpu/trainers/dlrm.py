"""DLRM trainer CLI (beyond-reference model family).

No reference counterpart — the reference zoo stops at DeepFM
(/root/reference/trainers/). Flags follow the zoo's conventions
(rectpu.trainers.deep_fm) plus the DLRM-specific --bot-hidden-units and
--arch-interaction-itself; dense features enter through --numeric-columns
exactly as in the DeepFM trainer.
"""

from argparse import ArgumentParser

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DLRMModel, TowerConfig
from rectpu.trainers.common import add_common_args, add_deep_args, run
from rectpu.train.optimizers import get_optimizer


def train_and_evaluate(args):
    if args.flat_layout or args.scatter_impl != "xla":
        # the shared deep-args parser advertises these, but DLRM's
        # interaction block consumes [B, F, K] — silently ignoring the flags
        # would misreport what the run actually did
        raise ValueError(
            "DLRM does not support --flat-layout/--scatter-impl mxu: the "
            "pairwise-dot interaction block consumes the [B, F, K] tensor"
        )
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
    )
    model = DLRMModel(
        cfg,
        bot_hidden_units=tuple(args.bot_hidden_units),
        arch_interaction_itself=args.arch_interaction_itself,
    )
    optimizer = get_optimizer(args.optimizer, args.learning_rate)
    return run(args, model, optimizer)


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    add_common_args(parser, job_dir_default="checkpoints/dlrm")
    add_deep_args(parser)
    parser.add_argument("--bot-hidden-units", type=int, nargs="+", default=[64],
                        help="bottom-MLP hidden layers mapping dense features "
                             "into the embedding space (default: %(default)s)")
    parser.add_argument("--arch-interaction-itself", action="store_true",
                        help="include self-interactions (the diagonal) in the "
                             "pairwise-dot block")
    parser.add_argument("--optimizer", default="Adam",
                        choices=["Adagrad", "Adam", "Ftrl", "RMSProp", "SGD"],
                        help="optimizer (default: %(default)s)")
    parser.add_argument("--learning-rate", type=float, default=0.001,
                        help="learning rate (default: %(default)s)")
    parser.add_argument("--numeric-columns", nargs="*", default=[],
                        help="numeric feature columns fed to the bottom MLP")
    return parser


if __name__ == "__main__":
    train_and_evaluate(build_parser().parse_args())
