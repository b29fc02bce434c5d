"""Scaled-config training throughput for the extra model families (DLRM, DCN,
xDeepFM, AutoInt).

Same measurement discipline as bench.py (chained pipelined dispatch over
pre-staged batches, donated state): batch 8192, K=64, the large hashed
vocab, bf16 towers. DLRM runs the 3D lookup (its interaction block needs
[B, F, K]); DCN runs the lane-packed flat layout + mxu scatter like the
DeepFM headline.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import random_superbatch, scaled_feature_set
from rectpu.models import DCNModel, DLRMModel, TowerConfig
from rectpu.train.metrics import sigmoid_xent
from rectpu.train.optimizers import BF16_SR, adam


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(model, staged, batch, steps=200):
    params = model.init(jax.random.PRNGKey(0))
    opt = adam(learning_rate=0.001, slot_dtype={"m": jnp.bfloat16, "v": BF16_SR})
    rng = jax.random.PRNGKey(1)

    def train(params, opt_state, step, b):
        step_rng = jax.random.fold_in(rng, step)

        def loss_fn(p):
            logits = model.apply(p, b, train=True, rng=step_rng)
            return sigmoid_xent(logits, b["labels"]).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    # v2 doctrine (rectpu.utils.timing): fetch-synced two-point slope —
    # block_until_ready can return early through the tunnel
    fj = jax.jit(train, donate_argnums=(0, 1))
    state = fj(params, opt.init(params), jnp.asarray(0, jnp.int32), staged[0])
    _ = float(state[-1])
    n1, n2 = max(steps // 4, 10), steps
    times = []
    step_no = 1
    best = float("inf")
    for _ in range(3):
        times = []
        for n in (n1, n2):
            t0 = time.time()
            for _ in range(n):
                state = fj(*state[:-1], jnp.asarray(step_no, jnp.int32),
                           staged[step_no % len(staged)])
                step_no += 1
            _ = float(state[-1])
            times.append(time.time() - t0)
        slope = (times[1] - times[0]) / (n2 - n1)
        if slope > 0:
            best = min(best, slope)
    ms = 1e3 * best
    log(f"{model.name}: {ms:.3f} ms/step = {batch/ms*1000:,.0f} examples/s")
    return ms


def main():
    batch = 8192
    fs = scaled_feature_set()
    sb = random_superbatch(fs, 8, batch)
    staged = [{k: jax.device_put(v[i]) for k, v in sb.items()} for i in range(8)]

    base = dict(feature_set=fs, embedding_size=64, hidden_units=(256, 128),
                dropout=0.1, compute_dtype="bfloat16",
                table_grad_dtype="bfloat16")
    # DCN: flat layout + mxu scatter (the headline path); 2 full-rank cross
    # layers over D=1664 plus the MLP
    measure(DCNModel(TowerConfig(**base, flat_layout=True, scatter_impl="mxu",
                                 table_padding=2048), num_cross_layers=2),
            staged, batch)
    # DCN low-rank variant (r=256: 6.5x fewer cross FLOPs)
    measure(DCNModel(TowerConfig(**base, flat_layout=True, scatter_impl="mxu",
                                 table_padding=2048),
                     num_cross_layers=2, low_rank=256),
            staged, batch)
    # DLRM: 3D lookup (split impl), pairwise-dot interactions
    measure(DLRMModel(TowerConfig(**base, table_padding=2048)), staged, batch)
    # DLRM + the MXU row-scatter for the table cotangent (the DeepFM
    # headline's biggest single win; DLRM's 3D lookup bwd hits the same
    # serial XLA scatter without it)
    measure(DLRMModel(TowerConfig(**base, table_padding=2048, scatter_impl="mxu")),
            staged, batch)
    # DLRM flat: lane-packed lookup_flat + merged mxu-scatter backward +
    # the fast interaction backward (interact_xla_fast) — the headline path
    measure(DLRMModel(TowerConfig(**base, flat_layout=True, scatter_impl="mxu",
                                  table_padding=2048)),
            staged, batch)
    # xDeepFM (round 4): flat lookup + CIN(64, 64) + DNN — the CIN
    # outer-product expansion is the honest architectural cost (B*H*M*K
    # elements per layer materialize; see models/xdeep_fm.py docstring)
    from rectpu.models import XDeepFMModel

    measure(XDeepFMModel(TowerConfig(**base, flat_layout=True,
                                     scatter_impl="mxu", packed_linear=True,
                                     table_padding=2048)),
            staged, batch)
    # AutoInt (round 4): field self-attention — all batched MXU matmuls
    from rectpu.models import AutoIntModel

    measure(AutoIntModel(TowerConfig(**base, flat_layout=True,
                                     scatter_impl="mxu", packed_linear=True,
                                     table_padding=2048),
                         num_layers=2, num_heads=2),
            staged, batch)


if __name__ == "__main__":
    main()
