"""DCN-v2 CTR model (beyond-reference family).

Deep & Cross Network v2 (Wang et al., arXiv:2008.13535) — with DLRM, the
other dominant production CTR architecture; no reference counterpart
(/root/reference stops at DeepFM). Explicit bounded-degree feature crosses:

    x0   = flat embedding vector                    [B, D], D = (F+N)*K
    x_{l+1} = x0 * (W_l x_l + b_l) + x_l            (cross layers)
    logit   = top MLP(x_L)                          (stacked structure)

TPU mapping: each cross layer is ONE [B, D] x [D, D] MXU matmul (bf16 under
compute_dtype, fp32 accumulation) plus VPU elementwise multiply/add — no
feature-pair enumeration, static shapes throughout. The ``low_rank`` option
factors W_l = U_l V_l^T (two [D, r] matmuls, O(D r) instead of O(D^2) — the
paper's production-cost variant).

Rides the zoo machinery unchanged: shared feature pipeline, lookup_fn hook
(EP table sharding via the shape-keyed rules), trainer loop, export/serving
and int8 quantization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rectpu.models.base import (
    TowerConfig,
    apply_mlp,
    glorot_uniform,
    init_embedding_table,
    init_mlp,
    lookup_fields,
    numeric_field_embeddings,
)


class DCNModel:
    name = "dcn"
    EXPORT_KWARGS = ("num_cross_layers", "low_rank")

    def __init__(self, cfg: TowerConfig, num_cross_layers: int = 3,
                 low_rank: int | None = None):
        if cfg.num_fields + cfg.num_numeric == 0:
            raise ValueError("DCN needs at least one feature column")
        if num_cross_layers < 1:
            raise ValueError("num_cross_layers must be >= 1")
        self.cfg = cfg
        self.num_cross_layers = int(num_cross_layers)
        self.low_rank = None if low_rank is None else int(low_rank)

    @property
    def _d(self) -> int:
        return (self.cfg.num_fields + self.cfg.num_numeric) * self.cfg.embedding_size

    def init(self, rng) -> dict:
        cfg = self.cfg
        k_emb, k_cross, k_top, k_num = jax.random.split(rng, 4)
        d = self._d
        cross = []
        for i in range(self.num_cross_layers):
            k_i = jax.random.fold_in(k_cross, i)
            if self.low_rank is None:
                layer = {"w": glorot_uniform(k_i, (d, d))}
            else:
                k_u, k_v = jax.random.split(k_i)
                layer = {
                    "u": glorot_uniform(k_u, (d, self.low_rank)),
                    "v": glorot_uniform(k_v, (d, self.low_rank)),
                }
            layer["b"] = jnp.zeros((d,))
            cross.append(layer)
        params = {
            "emb": init_embedding_table(k_emb, cfg),
            "cross": cross,
            "top": init_mlp(k_top, d, cfg.hidden_units),
        }
        if cfg.num_numeric:
            from rectpu.models.base import truncated_normal

            params["num_emb"] = truncated_normal(
                k_num, (1, cfg.num_numeric, cfg.embedding_size),
                1.0 / cfg.embedding_size**0.5,
            )
        return params

    def _cross(self, layer, x0, x):
        """x0 * (W x + b) + x — one MXU matmul + VPU elementwise."""
        if "w" in layer:
            w = layer["w"].astype(x.dtype)
            xw = jnp.dot(x, w, preferred_element_type=jnp.float32)
        else:  # low-rank: (x V) U^T, O(D r)
            v = layer["v"].astype(x.dtype)
            u = layer["u"].astype(x.dtype)
            xv = jnp.dot(x, v, preferred_element_type=jnp.float32).astype(x.dtype)
            xw = jnp.dot(xv, u.T, preferred_element_type=jnp.float32)
        xw = (xw + layer["b"]).astype(x.dtype)
        return x0 * xw + x

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        if (
            cfg.flat_layout
            and cfg.num_numeric == 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            # lane-packed lookup: [B, F*K] IS x0 — no [B, F, K] tile padding,
            # no flatten relayout (the DNN flat path, feeding cross layers)
            from rectpu.ops.embedding import lookup_flat

            fs = cfg.feature_set
            field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
            flat_fn = getattr(lookup_fn, "flat_variant", None)
            if flat_fn is not None:
                x0, _ = flat_fn(params["emb"], batch["cat_ids"], has_lin=False)
            else:
                x0, _ = lookup_flat(
                    params["emb"], batch["cat_ids"], field_info,
                    cfg.embedding_size,
                    small_threshold=cfg.split_threshold,
                    gather_dtype=cfg.jnp_compute_dtype,
                    grad_dtype=cfg.jnp_table_grad_dtype,
                    scatter_impl=cfg.scatter_impl,
                    dense_threshold=cfg.mxu_dense_threshold,
                )
        else:
            emb = lookup_fields(params["emb"], batch, cfg, lookup_fn)  # [B, F, K]
            return self.apply_looked(params, emb, batch, train=train, rng=rng)
        return self._apply_x0(params, x0, train=train, rng=rng)

    def apply_looked(self, params, emb, batch, train: bool = False, rng=None):
        """Tower math from pre-gathered [B, F, K] rows (the sparse fast-step
        hook, train/fast_step.py)."""
        cfg = self.cfg
        if cfg.num_numeric:
            num = numeric_field_embeddings(params["num_emb"], batch, cfg)
            emb = jnp.concatenate([emb, num.astype(emb.dtype)], axis=1)
        return self._apply_x0(params, emb.reshape(emb.shape[0], -1),
                              train=train, rng=rng)

    def _apply_x0(self, params, x0, train: bool = False, rng=None):
        cfg = self.cfg
        if cfg.jnp_compute_dtype is not None:
            x0 = x0.astype(cfg.jnp_compute_dtype)
        x = x0
        for layer in params["cross"]:
            x = self._cross(layer, x0, x)
        logit = apply_mlp(
            params["top"], x, cfg.activation, cfg.dropout, train, rng,
            compute_dtype=cfg.jnp_compute_dtype, dropout_impl=cfg.dropout_impl,
        )
        return logit[:, 0]

    def default_optimizer(self):
        """Adam(1e-3), matching the zoo's deep-model convention."""
        from rectpu.train.optimizers import adam

        return adam(learning_rate=0.001)
