"""CIN core kernel A/B at the scaled xDeepFM shapes (round-4).

out[b,o,k] = sum_{h,m} w[h,m,o] x[b,h,k] y[b,m,k] at B=8192, K=64, M=26,
H/O=64: XLA materializes the [B,H,M,K] expansion in HBM (1.7 GB bf16);
the Pallas kernel forms it per-tile in VMEM. fwd and fwd+bwd, chained
slope timing. Run: python -m benchmarks._bench_cin (on the TPU)."""
import sys
import statistics

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.ops.cin import cin_core
from rectpu.utils.timing import chained_slope_s

B, H, M, K, O = 8192, 64, 26, 64, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, K)).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.normal(size=(B, M, K)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(H, M, O)).astype(np.float32)).astype(jnp.bfloat16)

    a = np.asarray(cin_core(x, y, w, impl="xla"), np.float32)

    from rectpu.ops.cin import _cin_pallas

    # variant probe: does the flat (in-kernel reshape) form compile?
    for variant in ("flat", "mloop"):
        try:
            got = np.asarray(_cin_pallas(x, y, w, interpret=False,
                                         variant=variant), np.float32)
            err_v = np.abs(got - a).max() / max(np.abs(a).max(), 1e-6)
            log(f"variant {variant}: compiles, max rel err {err_v:.5f}")
        except Exception as e:
            log(f"variant {variant}: FAILED {type(e).__name__}: {str(e)[:160]}")

    for impl in ("xla", "pallas"):
        def fwd(xx):
            out = cin_core(xx, y, w, impl=impl)
            return xx + (jnp.sum(out[0, 0].astype(jnp.float32)) * 1e-12).astype(xx.dtype)

        def fwdbwd(xx):
            def f(x_):
                return jnp.sum(cin_core(x_, y, w, impl=impl).astype(jnp.float32))
            g = jax.grad(f)(xx)
            return xx + (g * 1e-12).astype(xx.dtype)

        for name, fn in (("fwd", fwd), ("fwd+bwd", fwdbwd)):
            slopes = [chained_slope_s(jax.jit(fn), x, (5, 20)) for _ in range(5)]
            log(f"{impl:6s} {name:7s}: med {1e3*statistics.median(slopes):7.3f} "
                f"min {1e3*min(slopes):7.3f} ms")


if __name__ == "__main__":
    main()
