"""tiles_per_step A/B for the MXU row-scatter at the flat-backward stream
shape (round-4 VERDICT item 7: the 152-tile grid floor is ~0.2 ms of the
0.734 ms table-grad rebuild; fatter grid steps amortize it).

Sweeps tps x (tile_rows, capacity) with chained slope timing (min over
repeats), plus a correctness spot-check vs numpy on the first config.

Run: python -m benchmarks._bench_scatter_tps   (on the TPU)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.ops.scatter_rows import scatter_rows_dense
from rectpu.utils.timing import chained_slope_s

V, W = 311296, 65  # 2048 * 152 (table_padding=2048 fast path)
R = 24576 + 8192   # ~3 huge-field gathers at B=8192 + small-field block rows


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, V, R), jnp.int32)
    upd0 = jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16)

    # correctness on HW once (compiled Mosaic path, not interpret)
    ref = np.zeros((V, W), np.float32)
    np.add.at(ref, np.asarray(ids), np.asarray(upd0, np.float32))
    for tps in (1, 4, 8):
        got = np.asarray(scatter_rows_dense(
            ids, upd0, V, tile_rows=2048, capacity=512, out_dtype=jnp.float32,
            tiles_per_step=tps), np.float32)
        err = np.abs(got - ref).max()
        log(f"tps={tps} compiled max abs err: {err:.5f}")
        assert err < 0.25, (tps, err)  # bf16 update quantization only

    results = {}
    for tr, cap in ((2048, 512), (2048, 1024), (4096, 1024), (1024, 512)):
        for tps in (1, 2, 4, 8):
            def fn(u, tr=tr, cap=cap, tps=tps):
                # chain: fold one output element back into the updates so
                # iteration i+1 depends on i (input/output shapes must match)
                d = scatter_rows_dense(
                    ids, u, V, tile_rows=tr, capacity=cap,
                    out_dtype=jnp.bfloat16, tiles_per_step=tps)
                return u + (d[0, 0].astype(jnp.float32) * 1e-12).astype(u.dtype)

            t = min(chained_slope_s(jax.jit(fn), upd0, (10, 40))
                    for _ in range(5))
            results[(tr, cap, tps)] = t
            log(f"tr={tr} cap={cap} tps={tps}: {1e3 * t:.3f} ms")
    best = min(results.items(), key=lambda kv: kv[1])
    log(f"best: tr={best[0][0]} cap={best[0][1]} tps={best[0][2]} "
        f"at {1e3 * best[1]:.3f} ms "
        f"(baseline tr=2048 cap=512 tps=1: {1e3 * results[(2048, 512, 1)]:.3f} ms)")


if __name__ == "__main__":
    main()
