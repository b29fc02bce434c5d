"""Linear (wide) CTR model.

Equivalent of ``tf.estimator.LinearClassifier`` over the 26 sparse columns
(/root/reference/trainers/linear.py:30-34): a single weight per feature
bucket plus a bias, trained with FTRL by default (TF canned default).
"""

from __future__ import annotations

from rectpu.models.base import TowerConfig, apply_linear_tower, init_linear_tower


class LinearModel:
    name = "linear"

    def __init__(self, cfg: TowerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        del rng  # zero-init
        return {"linear": init_linear_tower(self.cfg)}

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        del train, rng, lookup_fn
        return apply_linear_tower(params["linear"], batch)

    def default_optimizer(self):
        """TF LinearClassifier default: FTRL, lr = min(0.2, 1/sqrt(#columns))."""
        import math

        from rectpu.train.optimizers import ftrl

        lr = min(0.2, 1.0 / math.sqrt(self.cfg.num_fields + self.cfg.num_numeric))
        return ftrl(learning_rate=lr)
