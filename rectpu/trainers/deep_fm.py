"""DeepFM trainer CLI — parity with /root/reference/trainers/deep_fm.py.

logits = linear + FM + DNN over a shared embedding input layer; Adam(1e-3).
The reference's --exclude-* flags are honored as INTENDED (the reference
builds always-truthy 1-tuples at deep_fm.py:135-137, silently disabling the
flags; that bug is not reproduced).

Extra flags beyond the reference: --optimizer/--learning-rate (the reference
model_fn accepts these via params but never exposes them on the CLI) and
--numeric-columns to exercise the numeric-embedding path (ref deep_fm.py:60-69,
likewise unreachable from the reference CLI).
"""

from argparse import ArgumentParser

from rectpu.features.schema import ml_100k_feature_set
from rectpu.models import DeepFMModel, TowerConfig
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
        fm_impl=args.fm_impl,
        compute_dtype=args.compute_dtype,
        table_grad_dtype=args.table_grad_dtype,
        table_dtype=args.table_dtype,
        packed_linear=args.packed_linear or args.flat_layout,
        packed_col_pad=args.packed_col_pad,
        flat_layout=args.flat_layout,
        scatter_impl=args.scatter_impl,
        table_padding=2048 if args.scatter_impl in ("mxu", "auto") else 128,
    )
    model = DeepFMModel(
        cfg,
        use_linear=not args.exclude_linear,
        use_mf=not args.exclude_mf,
        use_dnn=not args.exclude_dnn,
        fm_order=args.fm_order,
    )
    slot_dtype = None
    if args.optimizer_slot_dtype:
        import jax.numpy as jnp

        from rectpu.train.optimizers import BF16_SR

        slot_dtype = {
            "bfloat16": jnp.bfloat16,
            "bfloat16-m": {"m": jnp.bfloat16},
            "bfloat16-sr": {"m": jnp.bfloat16, "v": BF16_SR},
        }[args.optimizer_slot_dtype]
    optimizer = get_optimizer(args.optimizer, args.learning_rate, slot_dtype=slot_dtype)
    return run(args, model, optimizer)


def build_parser() -> ArgumentParser:
    parser = ArgumentParser()
    add_common_args(parser, job_dir_default="checkpoints/deep_fm")
    add_deep_args(parser)
    parser.add_argument("--exclude-linear", action="store_true",
                        help="flag to exclude linear component (default: %(default)s)")
    parser.add_argument("--exclude-mf", action="store_true",
                        help="flag to exclude mf component (default: %(default)s)")
    parser.add_argument("--exclude-dnn", action="store_true",
                        help="flag to exclude dnn component (default: %(default)s)")
    parser.add_argument("--optimizer", default="Adam",
                        choices=["Adagrad", "Adam", "Ftrl", "RMSProp", "SGD"],
                        help="optimizer (default: %(default)s)")
    parser.add_argument("--learning-rate", type=float, default=0.001,
                        help="learning rate (default: %(default)s)")
    parser.add_argument("--optimizer-slot-dtype", default=None,
                        choices=[None, "bfloat16", "bfloat16-m", "bfloat16-sr"],
                        help="reduced-precision Adam slots (fp32 math). 'bfloat16-m': "
                             "first moment in bf16 (AUC-neutral); 'bfloat16-sr': both "
                             "moments bf16, v stochastically rounded (unbiased); "
                             "'bfloat16': both plain bf16 (measured -0.02 AUC at "
                             "reference config — v increments underflow). "
                             "default: float32")
    parser.add_argument("--fm-order", type=int, default=2, choices=[2, 3],
                        help="highest FM interaction order: 2 = reference parity; "
                             "3 adds the third-order elementary-symmetric term over "
                             "the shared embeddings (beyond-reference; "
                             "default: %(default)s)")
    parser.add_argument("--numeric-columns", nargs="*", default=[],
                        help="numeric feature columns fed via the value*vector embedding trick")
    parser.add_argument("--packed-linear", action="store_true",
                        help="store the fused [V, K+1] embedding+linear table as one "
                             "parameter (skips the per-step concat)")
    parser.add_argument("--packed-col-pad", type=int, default=0,
                        help="lane-pad the packed table width to this "
                             "multiple (128 recommended for big sparse-"
                             "step tables: per-row XLA scatters need "
                             "128-multiple widths; default: %(default)s)")
    return parser


if __name__ == "__main__":
    train_and_evaluate(build_parser().parse_args())
