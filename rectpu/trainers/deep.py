"""DNN trainer CLI — parity with /root/reference/trainers/deep.py.

Canned-estimator equivalence: DNNClassifier over 26 embedding columns,
hidden [16,16], dropout 0.1, Adagrad(0.05) default optimizer.
"""

from argparse import ArgumentParser

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DNNModel, TowerConfig
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
        scatter_impl=args.scatter_impl,
        table_padding=2048 if args.scatter_impl in ("mxu", "auto") else 128,
    )
    optimizer = None
    if args.acc_dtype:
        from rectpu.train.optimizers import BF16_SR, adagrad

        optimizer = adagrad(
            learning_rate=0.05,
            slot_dtype=BF16_SR if args.acc_dtype == "bfloat16-sr" else None,
        )
    return run(args, DNNModel(cfg), optimizer)


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    add_common_args(parser, job_dir_default="checkpoints/deep")
    add_deep_args(parser)
    parser.add_argument("--acc-dtype", default=None, choices=[None, "bfloat16-sr"],
                        help="Adagrad accumulator storage: bfloat16-sr halves its "
                             "memory traffic via stochastic rounding (plain bf16 "
                             "would stall the accumulator); default float32 = "
                             "exact TF semantics")
    return parser


if __name__ == "__main__":
    train_and_evaluate(build_parser().parse_args())
