"""Device-trace the cost of sorting 24576 update ids + payload gather + searchsorted."""
import glob

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V, W, R, TR = 310144, 65, 24576, 2048
G = V // TR


def prep(dtable, ids, g):
    ids_s, order = jax.lax.sort_key_val(ids, jnp.arange(R, dtype=jnp.int32))
    g_s = jnp.take(g, order, axis=0)
    starts = jnp.searchsorted(ids_s, jnp.arange(G + 1, dtype=jnp.int32) * TR)
    counts = starts[1:] - starts[:-1]
    # consume everything so nothing is DCE'd; mix into the carried table
    upd = dtable.at[ids_s].add(g_s, indices_are_sorted=True)
    return upd, counts.max()


rng = np.random.default_rng(0)
idss = [jnp.asarray(rng.integers(0, V, R), jnp.int32) for _ in range(4)]
gs = [jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16) for _ in range(4)]
fj = jax.jit(prep, donate_argnums=(0,))
dt = jnp.ones((V, W), jnp.bfloat16)
dt, mx = fj(dt, idss[0], gs[0])
jax.block_until_ready(dt)
print("max tile count:", int(mx), "mean:", R / G)

jax.profiler.start_trace("/tmp/sort_trace")
for i in range(20):
    dt, mx = fj(dt, idss[i % 4], gs[i % 4])
jax.block_until_ready(dt)
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

path = sorted(glob.glob("/tmp/sort_trace/plugins/profile/*/*.xplane.pb"))[-1]
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
    print(f"total {tot/20:.4f} ms/step")
    for name, (n, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:12]:
        print(f"  {ms/20:8.4f} ms/step x{n:<4d} {name[:100]}")
