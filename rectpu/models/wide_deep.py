"""Wide & Deep CTR model.

Equivalent of ``tf.estimator.DNNLinearCombinedClassifier``
(/root/reference/trainers/linear_deep.py:32-39): a linear tower over the
sparse columns plus a DNN tower over embedding columns, with summed logits.
TF canned defaults: linear side FTRL(min(0.2, 1/sqrt(#cols))), DNN side
Adagrad(0.05) — expressed here as a per-subtree optimizer mapping.
"""

from __future__ import annotations

from rectpu.models.base import TowerConfig, apply_linear_tower, init_linear_tower
from rectpu.models.dnn import DNNModel


class WideDeepModel:
    name = "linear_deep"

    def __init__(self, cfg: TowerConfig):
        self.cfg = cfg
        self._dnn = DNNModel(cfg)
        # packed mode (cfg.packed_linear): ONE [V, K+1] table parameter fuses
        # the deep embeddings and the wide per-bucket weights, so the fused
        # forward reads it directly instead of concatenating two params every
        # step (~a table-sized copy); the per-tower TF update rules move into
        # optimizers.packed_wide_deep (column-split on the single leaf)
        self.packed = cfg.packed_linear and cfg.fuse_linear_lookup

    def init(self, rng) -> dict:
        from rectpu.models.base import pack_fused_table

        params = self._dnn.init(rng)
        params["linear"] = init_linear_tower(self.cfg)
        if self.packed:
            emb = params.pop("emb")
            w = params["linear"].pop("w")
            params["table"] = pack_fused_table(emb, w, self.cfg.packed_col_pad)
        return params

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        import jax.numpy as jnp

        from rectpu.models.base import apply_mlp, lookup_fields, numeric_field_embeddings

        cfg = self.cfg
        if not cfg.fuse_linear_lookup:
            wide = apply_linear_tower(params["linear"], batch)
            deep = self._dnn.apply(params, batch, train=train, rng=rng, lookup_fn=lookup_fn)
            return wide + deep

        # fused gather: [V, K+1] = [emb | linear w] (see TowerConfig.fuse_linear_lookup);
        # in packed mode the fused table IS the parameter — no per-step concat
        if self.packed:
            aug = params["table"]
        else:
            from rectpu.models.base import pack_fused_table

            aug = pack_fused_table(params["emb"], params["linear"]["w"])
        if (
            cfg.flat_layout
            and cfg.num_numeric == 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            # lane-packed: one lookup yields the MLP input [B, F*K] AND the
            # summed wide logit (the packed linear column) — same flat path
            # as DeepFM's, minus the FM tower
            from rectpu.ops.embedding import lookup_flat

            fs = cfg.feature_set
            field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
            flat_fn = getattr(lookup_fn, "flat_variant", None)
            if flat_fn is not None:
                flat, wide = flat_fn(aug, batch["cat_ids"])
            else:
                flat, wide = lookup_flat(
                    aug, batch["cat_ids"], field_info, cfg.embedding_size,
                    small_threshold=cfg.split_threshold,
                    gather_dtype=cfg.jnp_compute_dtype,
                    grad_dtype=cfg.jnp_table_grad_dtype,
                    scatter_impl=cfg.scatter_impl,
                    dense_threshold=cfg.mxu_dense_threshold,
                )
            wide = wide + params["linear"]["b"]
        else:
            looked = lookup_fields(aug, batch, cfg, lookup_fn)  # [B, F, K+1]
            emb = looked[..., : cfg.embedding_size]
            wide = looked[..., cfg.embedding_size].astype(jnp.float32).sum(axis=-1)
            wide = wide + params["linear"]["b"]
            tower = params["linear"]
            if "w_num" in tower and batch.get("num_vals") is not None:
                wide = wide + batch["num_vals"].astype(jnp.float32) @ tower["w_num"]
            if cfg.num_numeric:
                num = numeric_field_embeddings(params["num_emb"], batch, cfg)
                emb = jnp.concatenate([emb, num.astype(emb.dtype)], axis=1)
            flat = emb.reshape(emb.shape[0], -1)
        deep = apply_mlp(
            params["mlp"], flat, cfg.activation, cfg.dropout, train, rng,
            compute_dtype=cfg.jnp_compute_dtype,
            dropout_impl=cfg.dropout_impl,
        )[:, 0]
        return wide + deep

    def default_optimizer(self):
        """Joint training with per-tower optimizers, like the canned estimator."""
        import math

        from rectpu.train.optimizers import adagrad, ftrl, packed_wide_deep, per_subtree

        lr_linear = min(0.2, 1.0 / math.sqrt(self.cfg.num_fields + self.cfg.num_numeric))
        if self.packed:
            return packed_wide_deep(self.cfg.embedding_size, lr_linear)
        return per_subtree(
            {"linear": ftrl(learning_rate=lr_linear)},
            default=adagrad(learning_rate=0.05),
        )
