"""Single-chip proxy for the EP backward's per-shard table cotangent
(round-3 VERDICT item 2).

On a real mesh each table shard's gradient is built from the all-gathered
flat cotangent: autodiff emits XLA's serial scatter-add of ALL B_loc x F
masked rows (~45 ns/row — the exact op the single-chip flat backward
replaced with ops/scatter_rows), while scatter_impl="mxu" dedups the stream
and rebuilds with per-tile one-hot MXU matmuls
(parallel/embedding_ep._mxu_shard_cotangent). ICI costs are identical
between the two (the exchange is the same); the difference is purely this
local op, so a single-chip A/B at the per-shard shapes is the honest proxy
available without multi-chip hardware.

Shapes: flagship scaled config (B=8192, F=26, W=65 packed), table 311296
rows sharded 8 ways (v_shard=38912), data-shard slice sizes for
(d, m) in {(1,8), (4,2)}.

Run: python -m benchmarks._ablate_ep_scatter   (on the TPU)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import scaled_feature_set
from rectpu.parallel.embedding_ep import _mxu_shard_cotangent
from rectpu.utils.timing import chained_slope_ms

K, W = 64, 65


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def xla_cotangent(ids_full, d_emb, d_lin, mi, v_shard, k):
    """What autodiff's backward does per shard: mask every (field, example)
    row to the owned range and serial-scatter it (zeros for non-owned rows;
    safe index 0 — additive zero, exactly the masked-gather transpose)."""
    b, f_total = ids_full.shape
    dtable = jnp.zeros((v_shard, k + 1), jnp.float32)
    id_parts, g_parts = [], []
    for f in range(f_total):
        local = ids_full[:, f] - mi * v_shard
        owned = (local >= 0) & (local < v_shard)
        g_f = jax.lax.dynamic_slice(d_emb, (0, f * k), (b, k))
        g_f = jnp.concatenate([g_f, d_lin[:, None].astype(g_f.dtype)], axis=1)
        g_parts.append(jnp.where(owned[:, None], g_f, 0).astype(jnp.float32))
        id_parts.append(jnp.where(owned, local, 0))
    return dtable.at[jnp.concatenate(id_parts)].add(jnp.concatenate(g_parts))


def measure(d_shards, m_shards, repeats=5):
    fs = scaled_feature_set()
    rng = np.random.default_rng(0)
    v_pad = -(-int(fs.total_buckets) // 2048) * 2048
    v_shard = v_pad // m_shards
    b_loc = 8192 // d_shards
    offs, sizes = fs.offsets, fs.field_sizes
    ids = jnp.asarray(np.stack(
        [offs[f] + rng.integers(0, sizes[f], size=b_loc)
         for f in range(fs.num_fields)], 1).astype(np.int32))
    d_emb = jnp.asarray(
        rng.normal(size=(b_loc, fs.num_fields * K)).astype(np.float32)
    ).astype(jnp.bfloat16)
    d_lin = jnp.asarray(rng.normal(size=(b_loc,)).astype(np.float32))
    mi = jnp.asarray(m_shards // 2, jnp.int32)  # a middle shard

    def run(kind):
        if kind == "xla":
            f = jax.jit(lambda g: xla_cotangent(ids, g, d_lin, mi, v_shard, K))
        else:
            f = jax.jit(lambda g: _mxu_shard_cotangent(
                ids, g, d_lin, mi, v_shard, K, jnp.float32, 2048, 512, False))

        def chain(g):
            out = f(g)
            return g + (out.ravel()[0] * 1e-12).astype(g.dtype)

        return min(chained_slope_ms(chain, d_emb, (20, 60))
                   for _ in range(repeats))

    t_xla = run("xla")
    t_mxu = run("mxu")
    log(f"mesh (d={d_shards}, m={m_shards}): per-shard cotangent "
        f"[B/d={b_loc}, F=26] -> [{v_shard}, {W}]: "
        f"xla {t_xla:.3f} ms | mxu {t_mxu:.3f} ms ({t_xla/t_mxu:.2f}x)")
    return t_xla, t_mxu


def main():
    for d, m in ((1, 8), (4, 2)):
        measure(d, m)


if __name__ == "__main__":
    main()
