from rectpu.train.checkpoint import Checkpointer
from rectpu.train.metrics import (
    binary_predictions,
    exact_auc,
    finalize,
    init_state,
    sigmoid_xent,
    update_state,
)
from rectpu.train.optimizers import adagrad, adam, ftrl, get_optimizer, per_subtree, rmsprop, sgd

__all__ = [
    "Checkpointer",
    "binary_predictions",
    "exact_auc",
    "finalize",
    "init_state",
    "sigmoid_xent",
    "update_state",
    "adagrad",
    "adam",
    "ftrl",
    "get_optimizer",
    "per_subtree",
    "rmsprop",
    "sgd",
]
