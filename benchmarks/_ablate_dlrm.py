"""Where does the flat DLRM step (2.99 ms) spend its time vs DeepFM (1.6)?

Suspects: the pairwise-dot interaction materializes z = [B, 26, 26] fp32
(tile-padded to [B, 32, 128] = 134 MB at batch 8192) plus the
[B, F*K] -> [B, F, K] reshape relayout on both sides of the matmul.

Ablations (v2 slope timing, same discipline as _bench_zoo):
  full       — the shipped flat DLRM step
  no-inter   — interaction replaced by zeros (keeps lookup/top-MLP/optimizer)
  z-bf16     — z computed fp32-accumulate but stored bf16 (half the HBM)
  fold-gather— upper-triangle gather folded into the top MLP's first matmul
               (z reshaped [B, n*n] hits a [n*n, H] scatter-embedded W1)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from benchmarks._bench_zoo import measure
from rectpu.models import DLRMModel, TowerConfig


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class DLRMVariant(DLRMModel):
    def __init__(self, cfg, mode, **kw):
        super().__init__(cfg, **kw)
        self.mode = mode
        self.name = f"dlrm[{mode}]"

    def _interact(self, vectors):
        if self.mode == "no-inter":
            # keep a (negligible-cost) data dependence on the lookup so XLA
            # cannot DCE the gather/scatter path — only the einsum+z+gather
            # chain is removed
            probe = (vectors.sum(axis=(1, 2), keepdims=False) * 1e-30)[:, None]
            return probe.astype(vectors.dtype) * jnp.ones(
                (1, self._num_interactions), vectors.dtype
            )
        if self.mode == "z-bf16":
            z = jnp.einsum(
                "bik,bjk->bij", vectors, vectors,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            n = vectors.shape[1]
            iu, ju = np.triu_indices(n, k=1)
            return z.reshape(z.shape[0], n * n)[:, jnp.asarray(iu * n + ju)]
        return super()._interact(vectors)

    def apply_looked(self, params, emb, batch, train=False, rng=None):
        if self.mode != "fold-gather":
            return super().apply_looked(params, emb, batch, train=train, rng=rng)
        # fold the triangle gather into the first top-MLP matmul:
        # top_in @ W1 == z_flat @ W1_scattered (pairs (i,j),(j,i) each get
        # half of the pair's W1 row — z is symmetric)
        from rectpu.models.base import apply_mlp

        cfg = self.cfg
        z = jnp.einsum(
            "bik,bjk->bij", emb, emb, preferred_element_type=jnp.float32
        ).astype(cfg.jnp_compute_dtype or jnp.float32)
        n = emb.shape[1]
        z_flat = z.reshape(z.shape[0], n * n)
        w1 = params["top"][0]["kernel"]  # [n_pairs, H]
        iu, ju = np.triu_indices(n, k=1)
        big = jnp.zeros((n * n, w1.shape[1]), w1.dtype)
        big = big.at[jnp.asarray(iu * n + ju)].add(0.5 * w1)
        big = big.at[jnp.asarray(ju * n + iu)].add(0.5 * w1)
        h = jnp.dot(
            z_flat, big.astype(z_flat.dtype),
            preferred_element_type=jnp.float32,
        )
        h = (h + params["top"][0]["bias"]).astype(z_flat.dtype)
        h = jax.nn.relu(h)
        rest = [{"kernel": l["kernel"], "bias": l["bias"]}
                for l in params["top"][1:]]
        logit = apply_mlp(rest, h, cfg.activation, cfg.dropout, train, rng,
                          compute_dtype=cfg.jnp_compute_dtype,
                          dropout_impl=cfg.dropout_impl)
        return logit[:, 0]


def main():
    batch = 8192
    fs = scaled_feature_set()
    sb = random_superbatch(fs, 8, batch)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]
    base = dict(feature_set=fs, embedding_size=64, hidden_units=(256, 128),
                dropout=0.1, compute_dtype="bfloat16",
                table_grad_dtype="bfloat16", flat_layout=True,
                scatter_impl="mxu", table_padding=2048)
    for mode in ("full", "no-inter", "z-bf16", "fold-gather"):
        measure(DLRMVariant(TowerConfig(**base), mode), staged, batch)
    # the fused Pallas pair-dot kernel (ops/interaction.py): no [B, F, K]
    # relayout, no z tensor — VPU products + per-pair lane reductions
    m = DLRMModel(TowerConfig(**base), interaction_impl="pallas")
    m.name = "dlrm[pallas-inter]"
    measure(m, staged, batch)


if __name__ == "__main__":
    main()
