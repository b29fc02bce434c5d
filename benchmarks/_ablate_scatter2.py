"""Sanity: wall-time a known-roofline op (full-table halve = 80MB r+w ~0.1ms),
then device-trace the plain scatter variant to get TRUE per-op times."""
import glob
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, W, R = 310144, 65, 24576


def halve(dtable):
    return dtable * jnp.bfloat16(0.5)


def scat(dtable, ids, g):
    return (dtable * jnp.bfloat16(0.5)).at[ids].add(g)


rng = np.random.default_rng(0)
idss = [jnp.asarray(rng.integers(0, V, R), jnp.int32) for _ in range(4)]
gs = [jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16) for _ in range(4)]

# --- wall-clock: halve only ---
fj = jax.jit(halve, donate_argnums=(0,))
dt = jnp.ones((V, W), jnp.bfloat16)
dt = fj(dt); jax.block_until_ready(dt)
t0 = time.time()
for i in range(60):
    dt = fj(dt)
jax.block_until_ready(dt)
print(f"halve wall: {1e3*(time.time()-t0)/60:.3f} ms  (roofline ~0.10)")

# --- wall-clock: halve+scatter ---
fj2 = jax.jit(scat, donate_argnums=(0,))
dt = jnp.ones((V, W), jnp.bfloat16)
dt = fj2(dt, idss[0], gs[0]); jax.block_until_ready(dt)
t0 = time.time()
for i in range(60):
    dt = fj2(dt, idss[i % 4], gs[i % 4])
jax.block_until_ready(dt)
print(f"halve+scatter wall: {1e3*(time.time()-t0)/60:.3f} ms")

# --- device trace of halve+scatter ---
logdir = "/tmp/scat_trace"
jax.profiler.start_trace(logdir)
for i in range(20):
    dt = fj2(dt, idss[i % 4], gs[i % 4])
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
    for name, (n, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:10]:
        print(f"  {ms/20:8.4f} ms/step x{n:<4d} {name[:100]}")
