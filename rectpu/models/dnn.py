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

    def apply_looked(self, params, looked, batch, train: bool = False, rng=None):
        """Tower math from pre-gathered [B, F, K] rows (the sparse fast-step
        hook, train/fast_step.py — table rows enter only through ``looked``)."""
        cfg = self.cfg
        emb = looked
        if cfg.num_numeric:
            num = numeric_field_embeddings(params["num_emb"], batch, cfg)
            emb = jnp.concatenate([emb, num.astype(emb.dtype)], axis=1)
        logit = apply_mlp(
            params["mlp"], emb.reshape(emb.shape[0], -1), cfg.activation,
            cfg.dropout, train, rng, compute_dtype=cfg.jnp_compute_dtype,
            dropout_impl=cfg.dropout_impl,
        )
        return logit[:, 0]

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        if (
            cfg.flat_layout
            and cfg.num_numeric == 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            # lane-packed input: [B, F*K] IS the MLP input — no [B, F, K]
            # tile padding, no flatten relayout (same trick as DeepFM's
            # flat path; the [V, K] table has no linear column)
            from rectpu.ops.embedding import lookup_flat

            fs = cfg.feature_set
            field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
            flat_fn = getattr(lookup_fn, "flat_variant", None)
            if flat_fn is not None:
                flat, _ = flat_fn(params["emb"], batch["cat_ids"], has_lin=False)
            else:
                flat, _ = lookup_flat(
                    params["emb"], batch["cat_ids"], field_info,
                    cfg.embedding_size,
                    small_threshold=cfg.split_threshold,
                    gather_dtype=cfg.jnp_compute_dtype,
                    grad_dtype=cfg.jnp_table_grad_dtype,
                    scatter_impl=cfg.scatter_impl,
                    dense_threshold=cfg.mxu_dense_threshold,
                )
        else:
            emb = self.input_layer(params, batch, lookup_fn)
            flat = emb.reshape(emb.shape[0], -1)
        logit = apply_mlp(
            params["mlp"], flat, cfg.activation, cfg.dropout, train, rng,
            compute_dtype=cfg.jnp_compute_dtype,
            dropout_impl=cfg.dropout_impl,
        )
        return logit[:, 0]

    def default_optimizer(self):
        """TF DNNClassifier default: Adagrad(lr=0.05)."""
        from rectpu.train.optimizers import adagrad

        return adagrad(learning_rate=0.05)
