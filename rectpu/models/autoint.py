"""AutoInt CTR model (beyond-reference family).

AutoInt (Song et al., CIKM 2019, arXiv:1810.11921): multi-head
self-attention over the per-field embeddings learns arbitrary-order
feature interactions:

    x        = per-field embeddings                      [B, M, K]
    per layer, per head i:
      q, k, v = x Wq_i, x Wk_i, x Wv_i                   [B, M, D]
      att     = softmax_over_fields(q k^T / sqrt(D)) v   [B, M, D]
    x'       = relu(concat_i att + x Wres)               (residual)
    logit    = linear + w . flatten(x_L)

TPU mapping: everything is batched MXU matmuls over the field axis
(M ~ 26 — a tiny "sequence", so the [B, M, M] attention logits are
cheap); no pairwise enumeration, no expansion — the natural MXU-shaped
member of the interaction-model zoo (DLRM = dot products, DCN = crosses,
xDeepFM = CIN, AutoInt = attention). bf16 under compute_dtype with fp32
softmax/accumulation.

Rides the zoo machinery unchanged: shared feature pipeline + fused linear
lookup (packed_linear supported), lookup_fn hook (EP sharding via the
shape-keyed rules), apply_looked hook (sparse lazy-Adam fast step),
trainer loop, export/serving, int8 quantization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rectpu.models.base import (
    TowerConfig,
    glorot_uniform,
    init_embedding_table,
    init_linear_tower,
    numeric_field_embeddings,
    pack_fused_table,
    truncated_normal,
)


def _grouped_field_attention(q, k, v, g: int):
    """Block-diagonal grouped attention: [B, M, H, E] -> [B, M, H, E].

    Per-example field attention lowers to B*H tiny [M, E]-class batched
    matmuls — the DLRM-interaction latency-bound shape class. Packing ``g``
    examples' fields into one [g*M, g*M] attention with a block-diagonal
    mask turns both products into MXU-shaped batched matmuls (g*M ~ 208
    rows at g=8) at a g-fold FLOP waste the MXU absorbs: masked off-block
    logits softmax to exactly 0, so the P@V product is EXACT (the padding
    rows contribute nothing). fp32 softmax; bf16 matmuls with fp32
    accumulation.
    """
    b, m, nh, dh = q.shape
    gm = g * m
    qg = q.reshape(b // g, gm, nh, dh)
    kg = k.reshape(b // g, gm, nh, dh)
    vg = v.reshape(b // g, gm, nh, dh)
    logits = jnp.einsum("bihd,bjhd->bhij", qg, kg,
                        preferred_element_type=jnp.float32)
    blk = jnp.arange(gm) // m
    mask = blk[:, None] == blk[None, :]  # [gm, gm] block-diagonal
    logits = jnp.where(mask, logits / jnp.sqrt(jnp.float32(dh)), -jnp.inf)
    att = jax.nn.softmax(logits, axis=3).astype(q.dtype)
    out = jnp.einsum("bhij,bjhd->bihd", att, vg,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, m, nh, dh)


class AutoIntModel:
    name = "autoint"
    EXPORT_KWARGS = ("use_linear", "num_layers", "num_heads", "head_dim",
                     "att_impl", "att_group")

    def __init__(self, cfg: TowerConfig, use_linear: bool = True,
                 num_layers: int = 2, num_heads: int = 2,
                 head_dim: int | None = None, att_impl: str = "broadcast",
                 att_group: int = 8):
        if cfg.num_fields + cfg.num_numeric == 0:
            raise ValueError("AutoInt needs at least one feature column")
        if num_layers < 1 or num_heads < 1:
            raise ValueError("num_layers and num_heads must be >= 1")
        if att_impl not in ("broadcast", "bf16", "grouped"):
            raise ValueError(
                f"att_impl must be broadcast|bf16|grouped, got {att_impl}")
        self.cfg = cfg
        self.use_linear = use_linear
        self.num_layers = int(num_layers)
        self.num_heads = int(num_heads)
        self.head_dim = (int(head_dim) if head_dim is not None
                         else max(cfg.embedding_size // num_heads, 1))
        self.att_impl = att_impl
        self.att_group = int(att_group)

    @property
    def packed(self) -> bool:
        return (self.cfg.packed_linear and self.cfg.fuse_linear_lookup
                and self.use_linear)

    @property
    def _m(self) -> int:
        return self.cfg.num_fields + self.cfg.num_numeric

    @property
    def _dmodel(self) -> int:
        return self.num_heads * self.head_dim

    def init(self, rng) -> dict:
        cfg = self.cfg
        k_emb, k_att, k_out, k_num = jax.random.split(rng, 4)
        params = {}
        if self.use_linear:
            params["linear"] = init_linear_tower(cfg)
        if self.packed:
            emb = init_embedding_table(k_emb, cfg)
            w = params["linear"].pop("w")
            params["table"] = pack_fused_table(emb, w, cfg.packed_col_pad)
        else:
            params["emb"] = init_embedding_table(k_emb, cfg)
        if cfg.num_numeric:
            params["num_emb"] = truncated_normal(
                k_num, (1, cfg.num_numeric, cfg.embedding_size),
                1.0 / cfg.embedding_size**0.5,
            )
        d_in = cfg.embedding_size
        d = self._dmodel
        layers = []
        for i in range(self.num_layers):
            k_i = jax.random.fold_in(k_att, i)
            kq, kk, kv, kr = jax.random.split(k_i, 4)
            layers.append({
                # one fused [d_in, 3*d] projection; heads split at apply time
                "wq": glorot_uniform(kq, (d_in, d)),
                "wk": glorot_uniform(kk, (d_in, d)),
                "wv": glorot_uniform(kv, (d_in, d)),
                "wres": glorot_uniform(kr, (d_in, d)),
            })
            d_in = d
        params["att"] = layers
        params["out"] = {
            "w": glorot_uniform(k_out, (self._m * d, 1)),
            "b": jnp.zeros((1,)),
        }
        return params

    # -- attention ---------------------------------------------------------

    def _interacting_layer(self, layer, x):
        """x [B, M, Din] -> relu(multi-head attention + residual) [B, M, D].

        The q k^T / att v products are EXPLICIT broadcast-multiply + sum
        rather than einsum/dot: at tiny field counts the dot form lowers to
        B*heads per-example [M, E]-class batched matmuls, the same
        latency-bound shape the DLRM interaction fights — measured 2x
        slower end to end than letting XLA fuse the multiply into the
        reduction on the VPU (9.5 vs 3.9 ms fwd, 19.7 vs 10.1 fwd+bwd at
        [8192, 26, 64], 2 layers x 2 heads; RESULTS.md round 4). The
        projections stay MXU matmuls."""
        nh, dh = self.num_heads, self.head_dim
        b, m, _ = x.shape
        d = nh * dh

        # ONE fused [Din, 3D] projection instead of three: each output
        # column is the same dot product either way (bitwise-identical),
        # and one [B*M, Din] matmul dispatches/tiles better than three
        wqkv = jnp.concatenate(
            [layer["wq"], layer["wk"], layer["wv"]], axis=1).astype(x.dtype)
        qkv = jnp.einsum("bmd,de->bme", x, wqkv,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        q = qkv[..., :d].reshape(b, m, nh, dh)
        k = qkv[..., d:2 * d].reshape(b, m, nh, dh)
        v = qkv[..., 2 * d:].reshape(b, m, nh, dh)
        if self.att_impl == "grouped" and b % self.att_group == 0:
            out = _grouped_field_attention(q, k, v, self.att_group)
            out = out.reshape(b, m, nh * dh)
        elif self.att_impl == "bf16":
            # same broadcast-reduce lowering, products in the compute dtype
            # with fp32 ACCUMULATION (sum dtype): halves the VPU multiply
            # cost; softmax math stays fp32 but its OUTPUT is stored bf16
            # immediately, so the backward residual (the [B, M, N, H]
            # attention weights autodiff saves) rides at half the bytes
            logits = (q[:, :, None] * k[:, None, :, :, :]).sum(
                -1, dtype=jnp.float32)  # [B, M, N, H]
            att = jax.nn.softmax(
                logits / jnp.sqrt(jnp.float32(dh)), axis=2).astype(x.dtype)
            out = (att[..., None] * v[:, None, :, :, :]).sum(2)
            out = out.reshape(b, m, nh * dh)
        else:
            # field-to-field attention; fp32 softmax. [B, M, N, H] logits via
            # a reduction-fused broadcast product (no batched matmul).
            logits = (
                q[:, :, None].astype(jnp.float32)
                * k[:, None, :, :, :].astype(jnp.float32)
            ).sum(-1)  # [B, M, N, H]
            att = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(dh)), axis=2)
            out = (att[..., None].astype(x.dtype) * v[:, None, :, :, :]).sum(2)
            out = out.reshape(b, m, nh * dh)  # [B, M, H*E]
        res = jnp.einsum("bmd,de->bme", x, layer["wres"].astype(x.dtype),
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return jax.nn.relu(out + res)

    def _att_logit(self, params, emb):
        x = emb
        for layer in params["att"]:
            x = self._interacting_layer(layer, x)
        flat = x.reshape(x.shape[0], -1).astype(jnp.float32)
        out = params["out"]
        return (flat @ out["w"].astype(jnp.float32) + out["b"])[:, 0]

    # -- forward -----------------------------------------------------------

    def apply(self, params, batch, train: bool = False, rng=None, lookup_fn=None):
        cfg = self.cfg
        if (
            cfg.flat_layout
            and self.packed
            and cfg.num_numeric == 0
            and (lookup_fn is None or getattr(lookup_fn, "flat_variant", None))
        ):
            from rectpu.ops.embedding import lookup_flat

            fs = cfg.feature_set
            field_info = (tuple(int(o) for o in fs.offsets),
                          tuple(fs.field_sizes))
            flat_fn = getattr(lookup_fn, "flat_variant", None)
            if flat_fn is not None:
                emb_flat, lin = flat_fn(params["table"], batch["cat_ids"])
            else:
                emb_flat, lin = lookup_flat(
                    params["table"], batch["cat_ids"], field_info,
                    cfg.embedding_size,
                    small_threshold=cfg.split_threshold,
                    gather_dtype=cfg.jnp_compute_dtype,
                    grad_dtype=cfg.jnp_table_grad_dtype,
                    scatter_impl=cfg.scatter_impl,
                    dense_threshold=cfg.mxu_dense_threshold,
                )
            logits = lin + params["linear"]["b"]
            emb = emb_flat.reshape(emb_flat.shape[0], cfg.num_fields,
                                   cfg.embedding_size)
            return logits + self._att_logit(params, emb)

        from rectpu.models.base import apply_linear_tower, lookup_fields

        logits = jnp.zeros((batch["cat_ids"].shape[0],), dtype=jnp.float32)
        fuse = cfg.fuse_linear_lookup and self.use_linear
        if self.use_linear and not fuse:
            logits = logits + apply_linear_tower(params["linear"], batch)
        table = (params["table"] if self.packed
                 else pack_fused_table(params["emb"], params["linear"]["w"])
                 if fuse else params["emb"])
        looked = lookup_fields(table, batch, cfg, lookup_fn)
        return logits + self.apply_looked(params, looked, batch,
                                          train=train, rng=rng)

    def apply_looked(self, params, looked, batch, train: bool = False, rng=None):
        """Tower math from pre-gathered rows ([B, M, K+1] when the linear
        tower is fused, else [B, M, K]) — the sparse fast-step hook."""
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
        return logits + self._att_logit(params, emb)

    def default_optimizer(self):
        from rectpu.train.optimizers import adam

        return adam(learning_rate=0.001)
