"""Dropout-mask kernel A/B at the scaled shapes (round-4 VERDICT item 3).

The roofline budget put the two hash-dropout masks at 0.169 ms vs a
~0.005 ms VPU bound (35x) — ~10% of the whole 1.6 ms step. Hypothesis:
uint32 MULTIPLIES are the cost (TPU's VPU has no native 32-bit integer
multiply; each is emulated with several 16-bit ops), and the murmur3
finalizer spends 5 of them per element. Variants measured here cut
multiplies per element:

  murmur5    current hash_dropout_mask (5 muls/elem)
  murmur2    2-mul finalizer (xor-shift quality still fine for Bernoulli)
  half16     5-mul hash, each u32 yields TWO 16-bit thresholds (2.5 m/e)
  half16_2   2-mul hash, two 16-bit lanes per hash   (1.0 muls/elem)
  bytes4_2   2-mul hash, four 8-bit lanes per hash   (0.5 muls/elem;
             rate quantized to 1/256 — the mask SCALE uses the effective
             keep rate so the expectation stays unbiased)
  nomul      xor-shift only floor (0 muls — quality too weak to ship,
             bounds the mul cost)
  threefry   jax.random.bernoulli baseline

Each variant is timed (a) bare — both masks materialized — and (b) fused
into the activation chain x*relu -> mask -> next matmul input, the real
usage. Chained slope timing per rectpu/utils/timing.py doctrine.

Run: python -m benchmarks._bench_dropout_mask   (on the TPU)
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rectpu.models.base import hash_dropout_mask
from rectpu.utils.timing import chained_slope_s

B, H1, H2 = 8192, 256, 128
RATE = 0.1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _iota(n):
    return jax.lax.iota(jnp.uint32, n)


def murmur2_mask(seed32, shape, rate):
    n = 1
    for d in shape:
        n *= int(d)
    h = _iota(n).reshape(shape) * jnp.uint32(2654435761) + seed32 * jnp.uint32(
        0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    thresh = jnp.uint32(min(0xFFFFFFFF, int(round((1.0 - rate) * 2**32))))
    return h < thresh


def _finalize5(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def _finalize2(h):
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    return h


def _split_mask(seed32, shape, rate, bits, finalize):
    """One hash per (32//bits) elements; each `bits`-bit lane is its own
    threshold draw. Rate quantized to 2^-bits; scale correction is the
    caller's job (use effective_keep())."""
    n = 1
    for d in shape:
        n *= int(d)
    per = 32 // bits
    nh = n // per
    h = _iota(nh) * jnp.uint32(2654435761) + seed32 * jnp.uint32(0x9E3779B9)
    h = finalize(h)
    shifts = jnp.arange(0, 32, bits, dtype=jnp.uint32)
    lanes = (h[:, None] >> shifts[None, :]) & jnp.uint32(2**bits - 1)
    thresh = jnp.uint32(max(1, round((1.0 - rate) * 2**bits)))
    return (lanes < thresh).reshape(shape)


def effective_keep(rate, bits):
    return max(1, round((1.0 - rate) * 2**bits)) / 2**bits


def nomul_mask(seed32, shape, rate):
    n = 1
    for d in shape:
        n *= int(d)
    h = _iota(n).reshape(shape) + (seed32 << 7)
    h = h ^ (h >> 13)
    h = h ^ (h << 17)
    h = h ^ (h >> 5)
    thresh = jnp.uint32(min(0xFFFFFFFF, int(round((1.0 - rate) * 2**32))))
    return h < thresh


def _finalize1(h):
    # single-multiply "xmx" finalizer: good avalanche for threshold draws
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    return h


def xmx_mask(seed32, shape, rate):
    n = 1
    for d in shape:
        n *= int(d)
    h = _iota(n).reshape(shape) + seed32 * jnp.uint32(0x9E3779B9)
    h = _finalize1(h)
    thresh = jnp.uint32(min(0xFFFFFFFF, int(round((1.0 - rate) * 2**32))))
    return h < thresh


VARIANTS = {
    "murmur5": lambda s, shape: hash_dropout_mask(s, shape, RATE),
    "murmur2": lambda s, shape: murmur2_mask(s, shape, RATE),
    "xmx1": lambda s, shape: xmx_mask(s, shape, RATE),
    "half16": lambda s, shape: _split_mask(s, shape, RATE, 16, _finalize5),
    "half16_2": lambda s, shape: _split_mask(s, shape, RATE, 16, _finalize2),
    "half16_1": lambda s, shape: _split_mask(s, shape, RATE, 16, _finalize1),
    "bytes4_2": lambda s, shape: _split_mask(s, shape, RATE, 8, _finalize2),
    "nomul": lambda s, shape: nomul_mask(s, shape, RATE),
}


def time_masks(name, fn):
    def step(s):
        a = fn(s[0].view(jnp.uint32), (B, H1))
        b = fn(s[0].view(jnp.uint32) + jnp.uint32(1), (B, H2))
        bump = (jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32)))
        return s + (bump * 1e-12).astype(s.dtype)

    x0 = jnp.ones((8,), jnp.float32)
    t = min(chained_slope_s(jax.jit(step), x0, (20, 60)) for _ in range(5))
    log(f"bare  {name:10s}: {1e3 * t:.4f} ms")
    return t


def time_fused(name, fn):
    """Mask inside the real chain: relu(x) -> dropout -> matmul."""
    k1 = jnp.ones((H1, H2), jnp.bfloat16) * 0.01
    x0 = jnp.ones((B, H1), jnp.bfloat16)

    def step(x, k1):
        seed = x[0, 0].astype(jnp.float32).astype(jnp.int32).view(
            jnp.uint32) + jnp.uint32(7)
        keep = fn(seed, (B, H1))
        h = jnp.where(keep, jax.nn.relu(x) / (1.0 - RATE), 0.0).astype(
            jnp.bfloat16)
        y = jnp.dot(h, k1, preferred_element_type=jnp.float32)
        return (x + (jnp.sum(y) * 1e-12).astype(x.dtype)).astype(x.dtype)

    jf = jax.jit(lambda x: step(x, k1))
    t = min(chained_slope_s(jf, x0, (20, 60)) for _ in range(5))
    log(f"fused {name:10s}: {1e3 * t:.4f} ms")
    return t


def time_threefry():
    key = jax.random.PRNGKey(3)

    def step(s):
        k = jax.random.fold_in(key, s[0].astype(jnp.int32))
        a = jax.random.bernoulli(k, 1.0 - RATE, (B, H1))
        b = jax.random.bernoulli(jax.random.fold_in(k, 1), 1.0 - RATE, (B, H2))
        bump = (jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32)))
        return s + (bump * 1e-12).astype(s.dtype)

    x0 = jnp.ones((8,), jnp.float32)
    t = min(chained_slope_s(jax.jit(step), x0, (20, 60)) for _ in range(5))
    log(f"bare  threefry  : {1e3 * t:.4f} ms")
    return t


def main():
    results = {}
    for name, fn in VARIANTS.items():
        results[name] = time_masks(name, fn)
    results["threefry"] = time_threefry()
    for name, fn in VARIANTS.items():
        results[f"fused/{name}"] = time_fused(name, fn)
    best = min((v, k) for k, v in results.items() if "/" not in k)
    log(f"best bare: {best[1]} at {1e3 * best[0]:.4f} ms "
        f"(murmur5 {1e3 * results['murmur5']:.4f})")


if __name__ == "__main__":
    main()
