"""xDeepFM CTR model (beyond-reference family).

xDeepFM (Lian et al., KDD 2018, arXiv:1803.05170) — the third dominant
production CTR architecture next to DLRM and DCN-v2; no reference
counterpart (/root/reference stops at DeepFM). It replaces DeepFM's FM
term with a Compressed Interaction Network (CIN), which builds EXPLICIT
vector-wise feature interactions of bounded degree:

    x^0      = per-field embeddings                         [B, M, K]
    z^l      = x^l (outer_field) x^0                        [B, H_l, M, K]
    x^{l+1}[b,o,k] = sum_{h,m} W^l[o,h,m] * z^l[b,h,m,k]    [B, H_{l+1}, K]
    p        = concat_l sum_k x^l[:, :, k]                  [B, sum H_l]
    logit    = linear + w_cin . p + DNN(flat embeddings)

TPU mapping: each CIN layer is one elementwise outer-product expansion
(both broadcasts are from size-1 axes — the Mosaic-friendly kind) feeding
ONE dot_general with two contracting dims (h, m) — i.e. a single
[B*K, H*M] x [H*M, H'] MXU matmul after layout collapse, fp32 accumulation
under bf16 inputs. The z expansion is the honest cost of the architecture
(it materializes B*H*M*K elements per layer; at the scaled config that is
HBM-traffic-bound — recorded in RESULTS.md; the reference-size configs are
trivial). The full-connection CIN variant is implemented (no half-split).

Rides the zoo machinery unchanged: shared feature pipeline + fused linear
lookup (one [V, K+1] gather feeds linear+CIN+DNN, packed_linear supported),
lookup_fn hook (EP table sharding via the shape-keyed rules), apply_looked
hook (sparse lazy-Adam fast step), trainer loop, export/serving, int8
quantization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rectpu.models.base import (
    TowerConfig,
    apply_linear_tower,
    apply_mlp,
    glorot_uniform,
    init_embedding_table,
    init_linear_tower,
    init_mlp,
    lookup_fields,
    numeric_field_embeddings,
    pack_fused_table,
    truncated_normal,
)


class XDeepFMModel:
    name = "xdeep_fm"
    EXPORT_KWARGS = ("use_linear", "use_cin", "use_dnn", "cin_units",
                     "cin_layout")

    def __init__(
        self,
        cfg: TowerConfig,
        use_linear: bool = True,
        use_cin: bool = True,
        use_dnn: bool = True,
        cin_units: tuple = (64, 64),
        cin_layout: str = "legacy",
    ):
        if cfg.num_fields + cfg.num_numeric == 0:
            raise ValueError("xDeepFM needs at least one feature column")
        if not (use_linear or use_cin or use_dnn):
            raise ValueError("At least 1 of linear, cin or dnn component must be used.")
        if use_cin and (not cin_units or any(int(h) < 1 for h in cin_units)):
            raise ValueError(f"cin_units must be positive, got {cin_units!r}")
        self.cfg = cfg
        self.use_linear = use_linear
        self.use_cin = use_cin
        self.use_dnn = use_dnn
        self.cin_units = tuple(int(h) for h in cin_units)
        if cin_layout not in ("legacy", "kmajor"):
            raise ValueError(f"cin_layout must be legacy|kmajor, got {cin_layout}")
        self.cin_layout = cin_layout

    @property
    def packed(self) -> bool:
        """Single [V, K+1] table parameter (emb columns + linear weight)."""
        return (
            self.cfg.packed_linear
            and self.cfg.fuse_linear_lookup
            and self.use_linear
            and (self.use_cin or self.use_dnn)
        )

    @property
    def _m(self) -> int:
        return self.cfg.num_fields + self.cfg.num_numeric

    def init(self, rng) -> dict:
        cfg = self.cfg
        k_emb, k_cin, k_mlp, k_num = jax.random.split(rng, 4)
        params = {}
        if self.use_linear:
            params["linear"] = init_linear_tower(cfg)
        if self.use_cin or self.use_dnn:
            if self.packed:
                emb = init_embedding_table(k_emb, cfg)
                w = params["linear"].pop("w")  # folded into the table's last column
                params["table"] = pack_fused_table(emb, w, cfg.packed_col_pad)
            else:
                params["emb"] = init_embedding_table(k_emb, cfg)
            if cfg.num_numeric:
                params["num_emb"] = truncated_normal(
                    k_num, (1, cfg.num_numeric, cfg.embedding_size),
                    1.0 / cfg.embedding_size**0.5,
                )
        if self.use_cin:
            m = self._m
            layers = []
            h_in = m
            for i, h_out in enumerate(self.cin_units):
                k_i = jax.random.fold_in(k_cin, i)
                # glorot over the (h_in*m -> h_out) contraction this layer is
                layers.append({
                    "w": glorot_uniform(k_i, (h_in * m, h_out)).reshape(
                        h_in, m, h_out),
                })
                h_in = h_out
            params["cin"] = layers
            params["cin_out"] = {
                "w": glorot_uniform(
                    jax.random.fold_in(k_cin, 99), (sum(self.cin_units), 1)),
                "b": jnp.zeros((1,)),
            }
        if self.use_dnn:
            params["mlp"] = init_mlp(
                k_mlp, self._m * cfg.embedding_size, cfg.hidden_units,
            )
        return params

    # -- CIN --------------------------------------------------------------

    def _cin_logit(self, params, emb):
        """emb [B, M, K] -> scalar CIN logit [B] (fp32).

        Each layer is ops/cin.cin_core — the CUSTOM-VJP contraction. The
        custom VJP is the load-bearing part: plain autodiff through the
        naive expansion saves the [B, H, M, K] intermediate as a backward
        residual and materializes its cotangent (~3.4 GB/step of HBM
        traffic at the scaled config — the first zoo row read 16.2
        ms/step); cin_core's backward reuses the forward contraction with
        renamed weight axes and never forms either (RESULTS.md round 4)."""
        if self.cin_layout == "kmajor":
            # round-5: K-major keeps every contraction in its natural
            # dot_general layout — one [B, M, K] -> [B, K, M] relayout at
            # stack entry replaces the per-call [B, K, O] -> [B, O, K]
            # transposes (~8 x 67 MB/step at the scaled config)
            from rectpu.ops.cin import cin_core_kmajor

            x0 = emb.transpose(0, 2, 1)  # [B, K, M]
            x = x0
            pools = []
            for layer in params["cin"]:
                x = cin_core_kmajor(x, x0, layer["w"].astype(x.dtype))
                pools.append(jnp.sum(x.astype(jnp.float32), axis=1))  # [B, O]
            p = jnp.concatenate(pools, axis=1)
            out = params["cin_out"]
            return (p @ out["w"].astype(jnp.float32) + out["b"])[:, 0]

        from rectpu.ops.cin import cin_core

        x0 = emb
        x = x0
        pools = []
        for layer in params["cin"]:
            x = cin_core(x, x0, layer["w"].astype(x.dtype))  # [B, O, K]
            pools.append(jnp.sum(x.astype(jnp.float32), axis=2))  # [B, O]
        p = jnp.concatenate(pools, axis=1)  # [B, sum H]
        out = params["cin_out"]
        return (p @ out["w"].astype(jnp.float32) + out["b"])[:, 0]

    # -- forward ----------------------------------------------------------

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        if (
            cfg.flat_layout
            and self.packed
            and cfg.num_numeric == 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            flat_fn = getattr(lookup_fn, "flat_variant", None)
            return self._apply_flat(params, batch, train=train, rng=rng,
                                    flat_lookup_fn=flat_fn)
        logits = jnp.zeros((batch["cat_ids"].shape[0],), dtype=jnp.float32)
        fuse = (
            cfg.fuse_linear_lookup and self.use_linear
            and (self.use_cin or self.use_dnn)
        )
        if self.use_linear and not fuse:
            logits = logits + apply_linear_tower(params["linear"], batch)
        if self.use_cin or self.use_dnn:
            table = (params["table"] if self.packed
                     else pack_fused_table(params["emb"], params["linear"]["w"])
                     if fuse else params["emb"])
            looked = lookup_fields(table, batch, cfg, lookup_fn)
            logits = logits + self.apply_looked(params, looked, batch,
                                                train=train, rng=rng)
        return logits

    def _apply_flat(self, params, batch, train: bool = False, rng=None,
                    flat_lookup_fn=None):
        """Lane-packed lookup feeding the same tower math: the DNN consumes
        the flat [B, M*K] tensor directly; the CIN needs the [B, M, K] view
        (one reshape — same values, the relayout is the price of the
        3D interaction and is tiny next to the CIN expansion itself)."""
        from rectpu.ops.embedding import lookup_flat

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
        if self.use_cin:
            emb = emb_flat.reshape(emb_flat.shape[0], cfg.num_fields, k)
            logits = logits + self._cin_logit(params, emb)
        if self.use_dnn:
            dnn_logit = apply_mlp(
                params["mlp"], emb_flat, cfg.activation, cfg.dropout, train, rng,
                compute_dtype=cfg.jnp_compute_dtype,
                dropout_impl=cfg.dropout_impl,
            )
            logits = logits + dnn_logit[:, 0]
        return logits

    def apply_looked(self, params, looked, batch, train: bool = False, rng=None):
        """Tower math from pre-gathered rows ([B, M, K+1] when the linear
        tower is fused, else [B, M, K]) — shared by ``apply`` and the sparse
        fast step (train/fast_step.py)."""
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
            emb = jnp.concatenate([emb, num.astype(emb.dtype)], axis=1)
        if cfg.jnp_compute_dtype is not None:
            emb = emb.astype(cfg.jnp_compute_dtype)
        if self.use_cin:
            logits = logits + self._cin_logit(params, emb)
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
        """Adam(1e-3), matching the zoo's deep-model convention."""
        from rectpu.train.optimizers import adam

        return adam(learning_rate=0.001)
