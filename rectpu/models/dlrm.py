"""DLRM CTR model (beyond-reference family).

The canonical production recommendation architecture (Naumov et al.,
arXiv:1906.00091) the reference repo's papers trail leads to — no reference
counterpart (/root/reference has Linear/DNN/Wide&Deep/DeepFM only), added
because the framework's EP table sharding IS the DLRM-paper parallelism
pattern and the model slots straight into the existing zoo machinery
(shared feature pipeline, lookup_fn hook, trainer loop, export/serving).

Architecture:
    dense features --bottom MLP--> d0            [B, K]
    sparse fields  --embedding---> e1..eF        [B, F, K]
    interactions   = pairwise dots of {d0, e1..eF}   (upper triangle)
    logit          = top MLP(concat[d0, interactions])

TPU mapping: the pairwise-dot block is ONE batched [B, n, K] x [B, K, n]
matmul on the MXU (bf16 under compute_dtype, fp32 accumulation) followed by
a static upper-triangle gather — no per-pair loops, no dynamic shapes.
Without numeric features the dense vector is dropped and the top MLP sees
the F-choose-2 interactions only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rectpu.models.base import (
    TowerConfig,
    apply_mlp,
    get_activation,
    init_embedding_table,
    init_mlp,
    lookup_fields,
)


class DLRMModel:
    name = "dlrm"
    # arch kwargs recorded in exports (serve/export.model_toggle_kwargs)
    EXPORT_KWARGS = ("bot_hidden_units", "arch_interaction_itself",
                     "interaction_impl")

    def __init__(self, cfg: TowerConfig, bot_hidden_units=(64,),
                 arch_interaction_itself: bool = False,
                 interaction_impl: str = "auto"):
        if cfg.num_fields + cfg.num_numeric == 0:
            raise ValueError("DLRM needs at least one sparse or dense feature")
        if interaction_impl not in ("auto", "xla", "pallas", "pallas-mxu",
                                    "xla-autodiff"):
            raise ValueError(f"unknown interaction_impl: {interaction_impl}")
        self.cfg = cfg
        self.bot_hidden_units = tuple(bot_hidden_units)
        self.arch_interaction_itself = bool(arch_interaction_itself)
        self.interaction_impl = interaction_impl

    @property
    def _n_vectors(self) -> int:
        return self.cfg.num_fields + (1 if self.cfg.num_numeric else 0)

    @property
    def _num_interactions(self) -> int:
        n = self._n_vectors
        pairs = n * (n - 1) // 2
        return pairs + (n if self.arch_interaction_itself else 0)

    @property
    def _top_in_dim(self) -> int:
        dense_dim = self.cfg.embedding_size if self.cfg.num_numeric else 0
        return dense_dim + self._num_interactions

    def init(self, rng) -> dict:
        cfg = self.cfg
        k_emb, k_bot, k_top = jax.random.split(rng, 3)
        params = {
            "emb": init_embedding_table(k_emb, cfg),
            "top": init_mlp(k_top, self._top_in_dim, cfg.hidden_units),
        }
        if cfg.num_numeric:
            # bottom MLP maps dense features into the embedding space; its
            # output vector joins the feature interactions (paper §2.1)
            params["bot"] = init_mlp(
                k_bot, cfg.num_numeric, self.bot_hidden_units, out_dim=cfg.embedding_size
            )
        return params

    def _interact(self, vectors):
        """Pairwise dot products: [B, n, K] -> [B, n*(n-1)/2] (upper tri).

        One batched matmul (MXU) + a static flat gather; fp32 accumulation
        regardless of the vectors' dtype."""
        z = jnp.einsum(
            "bik,bjk->bij", vectors, vectors, preferred_element_type=jnp.float32
        )
        n = vectors.shape[1]
        offset = 0 if self.arch_interaction_itself else 1
        iu, ju = np.triu_indices(n, k=offset)
        flat_idx = jnp.asarray(iu * n + ju)
        return z.reshape(z.shape[0], n * n)[:, flat_idx]

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        if (
            cfg.flat_layout
            and cfg.num_fields > 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            # lane-packed lookup: the flat [B, F*K] machinery (blockdiag MXU
            # forward + merged mxu-scatter backward — the DeepFM headline
            # path) does the table work; the interaction block is the ONLY
            # consumer that needs [B, F, K], so exactly one reshape relayout
            # is paid right before the pairwise-dot matmul. Numeric features
            # are unaffected (they ride the bottom MLP, not the lookup).
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
            return self._apply_from_flat(params, flat, batch, train=train,
                                         rng=rng)
        emb = lookup_fields(params["emb"], batch, self.cfg, lookup_fn)  # [B, F, K]
        return self.apply_looked(params, emb, batch, train=train, rng=rng)

    def _apply_from_flat(self, params, flat, batch, train=False, rng=None):
        """Tower math on the lane-packed [B, F*K] activation: interactions
        straight off the flat layout (ops/interaction.interact_flat — the
        fused Pallas pair-dot kernel on TPU), no [B, F, K] tensor, no z.
        A numeric bottom-MLP vector is appended as one more K-wide block."""
        from rectpu.ops.interaction import interact_flat

        cfg = self.cfg
        n_vec = cfg.num_fields
        top_parts = []
        if cfg.num_numeric:
            bot_rng = None if rng is None else jax.random.fold_in(rng, 1)
            d0 = apply_mlp(
                params["bot"], batch["num_vals"], cfg.activation, 0.0, train,
                bot_rng, compute_dtype=cfg.jnp_compute_dtype,
            )
            d0 = get_activation(cfg.activation)(d0)
            top_parts.append(d0)
            flat = jnp.concatenate([flat, d0.astype(flat.dtype)], axis=1)
            n_vec += 1
        top_parts.append(
            interact_flat(flat, n_vec, cfg.embedding_size,
                          itself=self.arch_interaction_itself,
                          impl=self.interaction_impl)
        )
        top_in = jnp.concatenate(top_parts, axis=1) if len(top_parts) > 1 \
            else top_parts[0]
        top_rng = None if rng is None else jax.random.fold_in(rng, 2)
        logit = apply_mlp(
            params["top"], top_in, cfg.activation, cfg.dropout, train, top_rng,
            compute_dtype=cfg.jnp_compute_dtype, dropout_impl=cfg.dropout_impl,
        )
        return logit[:, 0]

    def apply_looked(self, params, emb, batch, train: bool = False, rng=None):
        """Tower math from pre-gathered [B, F, K] rows (the sparse fast-step
        hook, train/fast_step.py)."""
        cfg = self.cfg
        vectors = emb
        top_parts = []
        if cfg.num_numeric:
            bot_rng = None if rng is None else jax.random.fold_in(rng, 1)
            d0 = apply_mlp(
                params["bot"], batch["num_vals"], cfg.activation, 0.0, train,
                bot_rng, compute_dtype=cfg.jnp_compute_dtype,
            )
            d0 = get_activation(cfg.activation)(d0)  # paper: activated output
            top_parts.append(d0)
            vectors = jnp.concatenate([emb, d0[:, None, :].astype(emb.dtype)], axis=1)
        top_parts.append(self._interact(vectors))
        top_in = jnp.concatenate(top_parts, axis=1)
        top_rng = None if rng is None else jax.random.fold_in(rng, 2)
        logit = apply_mlp(
            params["top"], top_in, cfg.activation, cfg.dropout, train, top_rng,
            compute_dtype=cfg.jnp_compute_dtype, dropout_impl=cfg.dropout_impl,
        )
        return logit[:, 0]

    def default_optimizer(self):
        """Adam(1e-3), matching the zoo's deep-model convention."""
        from rectpu.train.optimizers import adam

        return adam(learning_rate=0.001)
