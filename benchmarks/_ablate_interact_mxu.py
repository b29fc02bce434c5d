"""DLRM interaction forward A/B at [8192, 26, 64] (round-3 VERDICT item 8).

Round 2 left the XLA batched-matmul forward as the biggest single op of the
zoo (0.745 ms at ~4% MXU utilization) with the VPU pair-dot Pallas kernel
measured SLOWER (1.20 ms: 325 per-pair lane reductions + single-column
stores). Round 3's attempt ("pallas-mxu", ops/interaction._fwd_kernel_mxu)
keeps the relayout-free flat read but moves the reductions onto the MXU:
one [TB, m*K] @ block-ones [m*K, m] matmul per left field, one contiguous
store per field. Measures fwd for all three impls + the fwd+bwd pair for
xla vs pallas-mxu.

Run: python -m benchmarks._ablate_interact_mxu   (on the TPU)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.ops.interaction import interact_flat
from rectpu.utils.timing import chained_slope_ms

B, F, K = 8192, 26, 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    flat = jax.device_put(
        jnp.asarray(rng.normal(size=(B, F * K)).astype(np.float32))
        .astype(jnp.bfloat16))

    # forward-only A/B. (A grad-based "fwd+bwd" A/B is MEANINGLESS for the
    # Pallas variants: their custom VJP saves only `flat` as residual, so
    # jax.grad DCEs the forward kernel entirely and all impls time the same
    # shared XLA backward.)
    for impl in ("xla", "pallas", "pallas-mxu"):
        f = jax.jit(lambda x, impl=impl: interact_flat(x, F, K, impl=impl))

        def chain(x):
            out = f(x)
            return x + (out[0, 0] * 1e-12).astype(x.dtype)

        ms = min(chained_slope_ms(chain, flat, (20, 60)) for _ in range(5))
        log(f"interact fwd {impl:11s}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
