"""Device-trace the Pallas MXU scatter vs the XLA scatter at the bench shape."""
import glob
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.ops.scatter_rows import scatter_rows_dense

V, W, R = 311296, 65, 24576  # V = 2048 * 152 (table_padding=2048 fast path)
TR, C = int(sys.argv[1]) if len(sys.argv) > 1 else 2048, int(sys.argv[2]) if len(sys.argv) > 2 else 512


def step_pallas(dtable, ids, g):
    d = scatter_rows_dense(ids, g, V, tile_rows=TR, capacity=C, out_dtype=jnp.bfloat16)
    return dtable * jnp.bfloat16(0.5) + d


def step_xla(dtable, ids, g):
    d = jnp.zeros((V, W), jnp.bfloat16).at[ids].add(g)
    return dtable * jnp.bfloat16(0.5) + d


rng = np.random.default_rng(0)
idss = [jnp.asarray(rng.integers(0, V, R), jnp.int32) for _ in range(4)]
gs = [jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16) for _ in range(4)]

for name, fn in [("pallas", step_pallas), ("xla", step_xla)]:
    fj = jax.jit(fn, donate_argnums=(0,))
    dt = jnp.ones((V, W), jnp.bfloat16)
    dt = fj(dt, idss[0], gs[0])
    jax.block_until_ready(dt)
    # numeric check vs numpy once
    if name == "pallas":
        ref = np.zeros((V, W), np.float32)
        np.add.at(ref, np.asarray(idss[0]), np.asarray(gs[0], np.float32))
        got = np.asarray(
            scatter_rows_dense(idss[0], gs[0], V, tile_rows=TR, capacity=C,
                               out_dtype=jnp.float32), np.float32)
        err = np.abs(got - ref).max()
        print(f"max abs err vs numpy (fp32 out): {err:.5f}", file=sys.stderr)
        assert err < 0.25  # bf16 update quantization only
    logdir = f"/tmp/scatrows_{name}"
    jax.profiler.start_trace(logdir)
    for i in range(20):
        dt = fj(dt, idss[i % 4], gs[i % 4])
    jax.block_until_ready(dt)
    jax.profiler.stop_trace()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    path = sorted(glob.glob(logdir + "/plugins/profile/*/*.xplane.pb"))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        agg = {}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                agg.setdefault(meta.name, [0, 0.0])
                agg[meta.name][0] += 1
                agg[meta.name][1] += ev.duration_ps / 1e9
        tot = sum(v[1] for v in agg.values())
        print(f"{name} ({TR=} {C=}): total device {tot/20:.4f} ms/step")
        for nm, (n, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:8]:
            print(f"  {ms/20:8.4f} ms/step x{n:<4d} {nm[:100]}")
