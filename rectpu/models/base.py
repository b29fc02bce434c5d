"""Model building blocks: initializers, MLP tower, shared embedding machinery.

Models are pure functional modules: ``init(rng) -> params`` (a pytree of
jnp arrays) and ``apply(params, batch, train=..., rng=...) -> logits [B]``.
This replaces the reference's TF graph-building model_fns / canned estimators
(/root/reference/trainers/{linear,deep,linear_deep,deep_fm}.py) with
jit-compilable functions over explicit state — the idiomatic JAX shape.

Initializer choices mirror TF defaults so training dynamics match:
  - embedding_column: truncated_normal(stddev=1/sqrt(K))
  - tf.layers.dense:  glorot_uniform kernel, zero bias
  - linear_model:     zero weights and bias
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from rectpu.features.schema import FeatureSet
from rectpu.ops.embedding import embedding_lookup


def truncated_normal(rng, shape, stddev, dtype=jnp.float32):
    """Truncated normal at 2 sigma (TF truncated_normal_initializer semantics)."""
    return stddev * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)


def glorot_uniform(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, dtype, minval=-limit, maxval=limit)


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
}


def get_activation(name):
    if callable(name):
        return name
    return _ACTIVATIONS[name]


# --- MLP tower -------------------------------------------------------------


def init_mlp(rng, in_dim: int, hidden_units, out_dim: int = 1):
    """Hidden dense stack + final logit layer (ref deep_fm.py:93-111)."""
    layers = []
    dims = [in_dim] + list(hidden_units) + [out_dim]
    keys = jax.random.split(rng, len(dims) - 1)
    for i in range(len(dims) - 1):
        layers.append(
            {
                "kernel": glorot_uniform(keys[i], (dims[i], dims[i + 1])),
                "bias": jnp.zeros((dims[i + 1],)),
            }
        )
    return layers


def hash_dropout_mask(seed32, shape, rate: float):
    """Counter-based Bernoulli(1-rate) keep mask, no RNG state: one counter
    hash per TWO elements — each 32-bit hash yields two independent 16-bit
    threshold draws — with a single-multiply finalizer (~1 u32 multiply per
    element; the VPU has no native 32-bit integer multiply, so multiplies
    dominate this op's cost).

    JAX's default threefry bernoulli burns ~100 ALU ops per pair of uint32s;
    at the scaled config the two hidden-layer masks (3.1M elements) cost
    ~0.25 ms of the 1.9 ms step. Round 3's full murmur3-finalizer-per-
    element version measured 0.13-0.17 ms in ISOLATION (35x its VPU bound,
    roofline item); with this form the full train step measures AT the
    dropout-off floor — the mask is free in-step (chained med-of-5 A/B,
    RESULTS.md round-4 HW session; much of the isolated row was a
    measurement-isolation artifact — XLA fuses most of the mask cost).
    LAYOUT WARNING: an interleaved [nh, 2] -> [n] reshape variant timed
    fastest BARE but 2x the whole STEP fused (the relayout breaks XLA's
    fusion); only the last-axis half-split below is step-safe. Statistical
    quality
    validated vs the full murmur finalizer: keep-rate unbiased to <1e-3,
    lag-{1,2,3,128,129,256,512} correlations < 0.003 over 1M draws, per-row
    keep-count variance binomial (tests/test_hash_dropout.py + the CPU
    sweep recorded in RESULTS.md round 4). Deterministic given ``seed32``
    (derive it from the folded step rng); rate resolution is 2^-16 (bias
    <1e-5 of the keep probability — far below the fp32 scale rounding).
    Same counter-hash trick as optimizers.stochastic_round_bf16."""
    if rate <= 0.0:
        return jnp.ones(shape, bool)
    keep_p = 1.0 - rate
    last = int(shape[-1]) if len(shape) else 0
    if len(shape) >= 1 and last % 2 == 0 and last > 0:
        # layout-friendly split: hash [..., last/2], columns [0, last/2)
        # take the low 16 bits, [last/2, last) the high — NO lane
        # interleave. (A [nh, 2] -> [n] interleaved reshape measured
        # CATASTROPHIC fused into the train step: 2.92 ms/step vs the
        # 1.46 ms floor — it forces a relayout that breaks XLA's fusion.
        # This half-split form measures AT the no-dropout floor, i.e. the
        # mask is free: benchmarks/_tmp round-4 session, med-of-5 chained.)
        m = 1
        for d in shape[:-1]:
            m *= int(d)
        half = last // 2
        idx = jax.lax.iota(jnp.uint32, m * half).reshape(shape[:-1] + (half,))
        h = idx * jnp.uint32(2654435761) + seed32 * jnp.uint32(0x9E3779B9)
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        thresh = jnp.uint32(max(1, min(0xFFFF, int(round(keep_p * 65536.0)))))
        return jnp.concatenate(
            [(h & jnp.uint32(0xFFFF)) < thresh, (h >> 16) < thresh], axis=-1
        )
    # odd last dim (rare): per-element murmur finalizer, full 32-bit draws
    n = 1
    for d in shape:
        n *= int(d)
    idx = jax.lax.iota(jnp.uint32, n).reshape(shape)
    h = idx * jnp.uint32(2654435761) + seed32 * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    thresh = jnp.uint32(min(0xFFFFFFFF, int(round(keep_p * 4294967296.0))))
    return h < thresh


def apply_mlp(layers, x, activation, dropout: float, train: bool, rng, compute_dtype=None,
              dropout_impl: str = "threefry"):
    """Forward through hidden layers (activation + dropout) then linear logit."""
    act = get_activation(activation)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    seed32 = None
    if dropout > 0 and train and dropout_impl == "hash":
        if rng is None:
            raise ValueError("dropout requires an rng in train mode")
        # one scalar threefry draw per step; the per-element randomness is the
        # counter hash (hash_dropout_mask)
        seed32 = jax.random.bits(rng, dtype=jnp.uint32)
    for i, layer in enumerate(layers[:-1]):
        kernel = layer["kernel"]
        bias = layer["bias"]
        if compute_dtype is not None:
            kernel = kernel.astype(compute_dtype)
            bias = bias.astype(compute_dtype)
        x = jnp.dot(x, kernel, preferred_element_type=jnp.float32).astype(x.dtype) + bias
        x = act(x)
        if dropout > 0 and train:
            if rng is None:
                raise ValueError("dropout requires an rng in train mode")
            if dropout_impl == "hash":
                # decorrelate layers through the seed, not a fresh iota
                keep = hash_dropout_mask(
                    seed32 + jnp.uint32(0x7FEB352D) * jnp.uint32(i + 1), x.shape, dropout
                )
            else:
                drop_rng = jax.random.fold_in(rng, i)
                keep = jax.random.bernoulli(drop_rng, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    last = layers[-1]
    kernel, bias = last["kernel"], last["bias"]
    if compute_dtype is not None:
        kernel = kernel.astype(compute_dtype)
    out = jnp.dot(x, kernel, preferred_element_type=jnp.float32) + bias.astype(jnp.float32)
    return out.astype(jnp.float32)


# --- shared towers ----------------------------------------------------------


@dataclass
class TowerConfig:
    """Common knobs shared by the model zoo."""

    feature_set: FeatureSet
    embedding_size: int = 4
    hidden_units: tuple = (16, 16)
    activation: str = "relu"
    dropout: float = 0.0
    embedding_impl: str = "auto"  # rectpu.ops.embedding implementation
    fm_impl: str = "auto"  # rectpu.ops.fm implementation
    compute_dtype: str | None = None  # e.g. "bfloat16" for MXU-friendly towers
    table_padding: int = 128  # pad table rows to a lane multiple (tiling + EP sharding)
    # Gather the linear tower's per-bucket weight as an extra column of the
    # embedding gather (one gather feeds linear+FM+DNN). A [V]-weight gather
    # alone moves a full 128-lane tile per 4-byte row — measured 3.2 ms of an
    # 11 ms DeepFM step on v5e at the scaled config; fusing removes it.
    fuse_linear_lookup: bool = True
    # Store the fused [V, K+1] table as ONE parameter instead of concatenating
    # emb + linear.w every step (the concat+cast costs ~1 ms at the scaled
    # config). Changes the param tree ("table" replaces "emb"+"linear.w"), so
    # it is opt-in; only meaningful for single-optimizer models (DeepFM).
    packed_linear: bool = False
    # lane-pad the packed [V, K+1] table's width to this multiple (0 = off).
    # Big sparse-step tables want 128: XLA's row scatter is per-row at
    # 128-multiple widths and a full-table pass otherwise (round-5 law).
    packed_col_pad: int = 0
    # Materialize the dense table cotangent in this dtype ("bfloat16" halves
    # the scatter/pad/optimizer-read traffic of the table-grad path; see
    # ops/embedding.lookup_split grad_dtype for the precision contract).
    # Only affects impl="split". None = fp32 (exact).
    table_grad_dtype: str | None = None
    # Storage dtype of the embedding-table MASTER param. "bfloat16" halves the
    # optimizer sweep + gather-recast traffic; the Adam update then runs fp32
    # math with a stochastically-rounded downcast (optimizers.adam), the same
    # contract as the v slot. float32 = exact TF parity.
    table_dtype: str = "float32"
    # Fields with vocab <= this route through the one-hot MXU path of the
    # split lookup; larger fields use gather + scatter. 4096 measured best
    # (raising it to pull the 10k zipcode field off the scatter LOST 3x —
    # the one-hot reduction cost scales with vocab width).
    split_threshold: int = 4096
    # Keep the looked activations LANE-PACKED: [B, F*K] instead of [B, F, K+1]
    # (which TPU tiling pads ~2.4x). Uses ops/embedding.lookup_flat +
    # ops/fm.fm_cross_flat; the DNN consumes the flat tensor with no reshape.
    # DeepFM-only (requires packed_linear, no numeric fields, no custom
    # lookup_fn); other models ignore it.
    flat_layout: bool = False
    # How the flat-layout backward builds the dense table cotangent:
    # "xla" = serial scatter-add; "mxu" = sorted one-hot-matmul rebuild
    # (ops/scatter_rows) — XLA's scatter serializes ~45 ns/row and is the
    # hottest op of the flat train step. Size tables with table_padding=2048
    # when using "mxu" so the tile grid divides the table exactly.
    scatter_impl: str = "xla"
    # scatter_impl="mxu" only: big fields at most this large are rebuilt by a
    # direct per-field one-hot matmul instead of joining the scatter_rows
    # stream — their B gradient rows land in a handful of table tiles and
    # would overflow the Pallas per-tile capacity (forcing its slow fallback).
    mxu_dense_threshold: int = 16384
    # Dropout mask source: "threefry" = jax.random.bernoulli (TF-parity
    # default); "hash" = counter-based murmur mask (hash_dropout_mask) —
    # a different but equally-valid Bernoulli stream at a fraction of the
    # VPU cost (the threefry masks cost ~0.25 ms of the 1.9 ms scaled step).
    dropout_impl: str = "threefry"

    @property
    def num_fields(self) -> int:
        return self.feature_set.num_fields

    @property
    def num_numeric(self) -> int:
        return self.feature_set.num_numeric

    @property
    def padded_buckets(self) -> int:
        v = self.feature_set.total_buckets
        p = self.table_padding
        return (v + p - 1) // p * p

    @property
    def jnp_compute_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    @property
    def jnp_table_grad_dtype(self):
        return jnp.bfloat16 if self.table_grad_dtype == "bfloat16" else None

    @property
    def jnp_table_dtype(self):
        return jnp.bfloat16 if self.table_dtype == "bfloat16" else jnp.float32


def init_linear_tower(cfg: TowerConfig):
    """Zero-init per-bucket weights + bias (TF linear_model semantics,
    ref deep_fm.py:37-44)."""
    tower = {
        "w": jnp.zeros((cfg.padded_buckets,)),
        "b": jnp.zeros(()),
    }
    if cfg.num_numeric:
        tower["w_num"] = jnp.zeros((cfg.num_numeric,))
    return tower


def apply_linear_tower(tower, batch):
    """logit[b] = sum_f w[id_{b,f}] + w_num . x_b + bias -> [B]."""
    logit = jnp.take(tower["w"], batch["cat_ids"], axis=0).sum(axis=1) + tower["b"]
    if "w_num" in tower and batch.get("num_vals") is not None:
        logit = logit + batch["num_vals"].astype(jnp.float32) @ tower["w_num"]
    return logit


def pack_fused_table(emb, w, pad_cols: int = 0):
    """[V, K+1(+pad)] = [embedding | linear weight | zero pad]: the packed
    single-table layout shared by training init (models/deep_fm.py,
    models/wide_deep.py) and post-training transforms (serve/quant.py). Keep
    the layout in ONE place — serving dequantizes against exactly this
    column order.

    ``pad_cols``: round the width up to this multiple with zero columns
    (cfg.packed_col_pad). Round-5 scatter model: XLA scatters per-row ONLY
    at 128-multiple widths — an odd-width big table pays a full-table pass
    per sparse update (RESULTS.md round 5). Consumers address columns by K
    (emb = [..., :K], linear = [..., K]) so the pad is inert everywhere.
    """
    emb = jnp.asarray(emb)
    t = jnp.concatenate([emb, jnp.asarray(w)[:, None].astype(emb.dtype)], axis=1)
    if pad_cols:
        wp = -(-t.shape[1] // pad_cols) * pad_cols
        t = jnp.pad(t, ((0, 0), (0, wp - t.shape[1])))
    return t


def init_embedding_table(rng, cfg: TowerConfig):
    """[V_pad, K] truncated-normal table (TF embedding_column init:
    stddev = 1/sqrt(K)), stored in cfg.table_dtype."""
    t = truncated_normal(
        rng, (cfg.padded_buckets, cfg.embedding_size), 1.0 / np.sqrt(cfg.embedding_size)
    )
    return t.astype(cfg.jnp_table_dtype)


def lookup_fields(table, batch, cfg: TowerConfig, lookup_fn=None):
    """[B, F] ids -> [B, F, K] field embeddings."""
    if lookup_fn is not None:
        emb = lookup_fn(table, batch["cat_ids"])
    else:
        fs = cfg.feature_set
        field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
        emb = embedding_lookup(
            table, batch["cat_ids"], impl=cfg.embedding_impl, field_info=field_info,
            gather_dtype=cfg.jnp_compute_dtype, grad_dtype=cfg.jnp_table_grad_dtype,
            small_threshold=cfg.split_threshold,
        )
    dtype = cfg.jnp_compute_dtype
    return emb.astype(dtype) if dtype is not None else emb


def numeric_field_embeddings(num_emb, batch, cfg: TowerConfig):
    """Numeric-feature embedding trick (ref deep_fm.py:60-69):
    value * learned vector -> [B, N, K]."""
    vals = batch["num_vals"].astype(num_emb.dtype)  # [B, N]
    return vals[:, :, None] * num_emb  # [1, N, K] broadcast
