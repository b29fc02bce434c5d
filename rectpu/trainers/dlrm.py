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
        scatter_impl=args.scatter_impl,
        table_padding=2048 if args.scatter_impl in ("mxu", "auto") else 128,
    )
    model = DLRMModel(
        cfg,
        bot_hidden_units=tuple(args.bot_hidden_units),
        arch_interaction_itself=args.arch_interaction_itself,
        interaction_impl=args.interaction_impl,
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
    parser.add_argument("--interaction-impl", default="auto",
                        choices=["auto", "xla", "pallas", "pallas-mxu",
                                 "xla-autodiff"],
                        help="pairwise-dot implementation (ops/interaction.py): "
                             "auto = the autotuner's pin (xla until tuned); "
                             "xla = batched-matmul forward + the fast "
                             "gather-C backward; pallas = fused VPU pair-dot "
                             "forward; pallas-mxu = relayout-free forward with "
                             "block-ones MXU reductions; xla-autodiff = plain "
                             "autodiff oracle (default: %(default)s)")
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
