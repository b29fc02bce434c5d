"""DNN CTR model.

Equivalent of ``tf.estimator.DNNClassifier`` over embedding columns
(/root/reference/trainers/deep.py:32-38): per-field embeddings are
concatenated and fed through a dense stack with dropout, Adagrad-trained by
default (TF canned default, lr=0.05).
"""

from __future__ import annotations

import jax.numpy as jnp

from rectpu.models.base import (
    TowerConfig,
    apply_mlp,
    init_embedding_table,
    init_mlp,
    lookup_fields,
    numeric_field_embeddings,
)


class DNNModel:
    name = "deep"

    def __init__(self, cfg: TowerConfig):
        self.cfg = cfg

    def init(self, rng) -> dict:
        import jax

        k_emb, k_mlp, k_num = jax.random.split(rng, 3)
        cfg = self.cfg
        params = {
            "emb": init_embedding_table(k_emb, cfg),
            "mlp": init_mlp(
                k_mlp,
                (cfg.num_fields + cfg.num_numeric) * cfg.embedding_size,
                cfg.hidden_units,
            ),
        }
        if cfg.num_numeric:
            from rectpu.models.base import truncated_normal

            params["num_emb"] = truncated_normal(
                k_num, (1, cfg.num_numeric, cfg.embedding_size), 1.0 / cfg.embedding_size**0.5
            )
        return params

    def input_layer(self, params, batch, lookup_fn=None):
        cfg = self.cfg
        emb = lookup_fields(params["emb"], batch, cfg, lookup_fn)  # [B, F, K]
        if cfg.num_numeric:
            num = numeric_field_embeddings(params["num_emb"], batch, cfg)
            emb = jnp.concatenate([emb, num.astype(emb.dtype)], axis=1)
        return emb

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        emb = self.input_layer(params, batch, lookup_fn)
        flat = emb.reshape(emb.shape[0], -1)
        logit = apply_mlp(
            params["mlp"], flat, cfg.activation, cfg.dropout, train, rng,
            compute_dtype=cfg.jnp_compute_dtype,
        )
        return logit[:, 0]

    def default_optimizer(self):
        """TF DNNClassifier default: Adagrad(lr=0.05)."""
        from rectpu.train.optimizers import adagrad

        return adagrad(learning_rate=0.05)
