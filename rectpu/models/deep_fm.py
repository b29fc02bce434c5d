"""DeepFM CTR model — the reference's centerpiece.

Equivalent of the custom model_fn at /root/reference/trainers/deep_fm.py:11-125:
    logits = linear + FM-second-order + DNN
over a SHARED per-field embedding input layer. Components are individually
toggleable (use_linear / use_mf / use_dnn); numeric features enter the shared
input layer via the value-times-learned-vector trick (ref :60-69).

Note: the reference CLI's --exclude-* flags are silently broken by trailing
commas (ref :135-137 builds 1-tuples, always truthy); this implementation
honors the intended semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rectpu.models.base import (
    TowerConfig,
    apply_linear_tower,
    apply_mlp,
    init_embedding_table,
    init_linear_tower,
    init_mlp,
    lookup_fields,
    numeric_field_embeddings,
    pack_fused_table,
    truncated_normal,
)
from rectpu.ops.fm import fm_cross


class DeepFMModel:
    name = "deep_fm"
    EXPORT_KWARGS = ("use_linear", "use_mf", "use_dnn", "fm_order")

    def __init__(
        self,
        cfg: TowerConfig,
        use_linear: bool = True,
        use_mf: bool = True,
        use_dnn: bool = True,
        fm_order: int = 2,
    ):
        if cfg.num_fields + cfg.num_numeric == 0:
            raise ValueError(
                "At least 1 feature column of categorical_columns or numeric_columns "
                "must be specified."
            )
        if not (use_linear or use_mf or use_dnn):
            raise ValueError("At least 1 of linear, mf or dnn component must be used.")
        if fm_order not in (2, 3):
            raise ValueError(f"fm_order must be 2 or 3, got {fm_order}")
        self.cfg = cfg
        self.use_linear = use_linear
        self.use_mf = use_mf
        self.use_dnn = use_dnn
        # 3 adds the order-3 elementary-symmetric term over the SAME shared
        # embeddings (ops/fm.fm_cross3_*; beyond-reference, PAPERS.md tensorFM
        # lead) — default 2 is exact reference parity (ref deep_fm.py:81-90).
        self.fm_order = fm_order

    @property
    def packed(self) -> bool:
        """Single [V, K+1] table parameter (emb columns + linear weight)."""
        return (
            self.cfg.packed_linear
            and self.cfg.fuse_linear_lookup
            and self.use_linear
            and (self.use_mf or self.use_dnn)
        )

    def init(self, rng) -> dict:
        cfg = self.cfg
        k_emb, k_mlp, k_num = jax.random.split(rng, 3)
        params = {}
        if self.use_linear:
            params["linear"] = init_linear_tower(cfg)
        if self.use_mf or self.use_dnn:
            if self.packed:
                emb = init_embedding_table(k_emb, cfg)
                w = params["linear"].pop("w")  # folded into the table's last column
                params["table"] = pack_fused_table(emb, w, cfg.packed_col_pad)
            else:
                params["emb"] = init_embedding_table(k_emb, cfg)
            if cfg.num_numeric:
                # [1, N, K] numeric embedding vectors (ref deep_fm.py:63-65)
                params["num_emb"] = truncated_normal(
                    k_num, (1, cfg.num_numeric, cfg.embedding_size),
                    1.0 / cfg.embedding_size**0.5,
                )
        if self.use_dnn:
            params["mlp"] = init_mlp(
                k_mlp,
                (cfg.num_fields + cfg.num_numeric) * cfg.embedding_size,
                cfg.hidden_units,
            )
        return params

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        if (
            cfg.flat_layout
            and self.packed
            and cfg.num_numeric == 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            # sharded lookups upgrade to their lane-packed exchange when the
            # plan provides one (parallel/plan: 2D EP attaches .flat_variant)
            flat_fn = getattr(lookup_fn, "flat_variant", None)
            return self._apply_flat(params, batch, train=train, rng=rng,
                                    flat_lookup_fn=flat_fn)
        logits = jnp.zeros((batch["cat_ids"].shape[0],), dtype=jnp.float32)

        fuse = (
            cfg.fuse_linear_lookup and self.use_linear and (self.use_mf or self.use_dnn)
        )
        if self.use_linear and not fuse:
            logits = logits + apply_linear_tower(params["linear"], batch)

        if self.use_mf or self.use_dnn:
            if fuse:
                looked = lookup_fields(self.augmented_table(params), batch, cfg, lookup_fn)
            else:
                looked = lookup_fields(params["emb"], batch, cfg, lookup_fn)  # [B, F, K]
            logits = logits + self.apply_looked(params, looked, batch, train=train, rng=rng)

        return logits

    def _apply_flat(self, params, batch, train: bool = False, rng=None,
                    flat_lookup_fn=None):
        """Lane-packed tower math: the looked activations stay [B, F*K].

        Numerically the same model as ``apply`` (same gather values, same FM
        identity, same MLP weights — the flat tensor IS looked[..., :K]
        .reshape(B, F*K)); only the reduction orders differ. Avoids the
        [B, F, K+1] tile padding and the DNN flatten relayout entirely.
        ``flat_lookup_fn`` (from a ParallelPlan) replaces the local lookup
        with a sharded lane-packed exchange.
        """
        from rectpu.ops.embedding import lookup_flat
        from rectpu.ops.fm import fm_cross_flat

        cfg = self.cfg
        fs = cfg.feature_set
        field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
        k = cfg.embedding_size
        if flat_lookup_fn is not None:
            emb_flat, lin = flat_lookup_fn(params["table"], batch["cat_ids"])
        else:
            emb_flat, lin = lookup_flat(
                params["table"], batch["cat_ids"], field_info, k,
                small_threshold=cfg.split_threshold,
                gather_dtype=cfg.jnp_compute_dtype,
                grad_dtype=cfg.jnp_table_grad_dtype,
                scatter_impl=cfg.scatter_impl,
                dense_threshold=cfg.mxu_dense_threshold,
            )
        logits = lin + params["linear"]["b"]
        if self.use_mf:
            logits = logits + fm_cross_flat(emb_flat, cfg.num_fields, k)
            if self.fm_order >= 3:
                from rectpu.ops.fm import fm_cross3_flat

                logits = logits + fm_cross3_flat(emb_flat, cfg.num_fields, k)
        if self.use_dnn:
            dnn_logit = apply_mlp(
                params["mlp"], emb_flat, cfg.activation, cfg.dropout, train, rng,
                compute_dtype=cfg.jnp_compute_dtype,
                dropout_impl=cfg.dropout_impl,
            )
            logits = logits + dnn_logit[:, 0]
        return logits

    def augmented_table(self, params):
        """[V, K+1] = [embedding | linear weight] — one gather feeds all towers.

        With packed_linear the fused table IS the parameter; otherwise it is
        assembled per call (XLA fuses the concat, but it still costs a pass
        over the table — see TowerConfig.packed_linear)."""
        if self.packed:
            return params["table"]
        return pack_fused_table(params["emb"], params["linear"]["w"])

    def apply_looked(self, params, looked, batch, train: bool = False, rng=None):
        """Tower math from pre-gathered rows.

        ``looked`` is [B, F, K+1] when the linear tower is fused
        (last column = linear weights), else [B, F, K]. Shared by ``apply``
        and the sparse-update fast step (rectpu/train/fast_step.py), so the
        model math lives in exactly one place.
        """
        cfg = self.cfg
        fused = self.use_linear and cfg.fuse_linear_lookup
        logits = jnp.zeros((looked.shape[0],), dtype=jnp.float32)
        if fused:
            emb = looked[..., : cfg.embedding_size]
            lin = looked[..., cfg.embedding_size].astype(jnp.float32)
            logits = logits + lin.sum(axis=-1) + params["linear"]["b"]
            tower = params["linear"]
            if "w_num" in tower and batch.get("num_vals") is not None:
                logits = logits + batch["num_vals"].astype(jnp.float32) @ tower["w_num"]
        else:
            emb = looked

        if cfg.num_numeric:
            num = numeric_field_embeddings(params["num_emb"], batch, cfg)
            emb = jnp.concatenate([emb, num.astype(emb.dtype)], axis=1)  # [B, F+N, K]

        if self.use_mf:
            logits = logits + fm_cross(emb, impl=cfg.fm_impl).astype(jnp.float32)
            if self.fm_order >= 3:
                from rectpu.ops.fm import fm_cross3_xla

                logits = logits + fm_cross3_xla(emb)

        if self.use_dnn:
            flat = emb.reshape(emb.shape[0], -1)
            dnn_logit = apply_mlp(
                params["mlp"], flat, cfg.activation, cfg.dropout, train, rng,
                compute_dtype=cfg.jnp_compute_dtype,
                dropout_impl=cfg.dropout_impl,
            )
            logits = logits + dnn_logit[:, 0]

        return logits

    def default_optimizer(self):
        """Reference default: Adam(lr=1e-3) (ref deep_fm.py:24-26)."""
        from rectpu.train.optimizers import adam

        return adam(learning_rate=0.001)
