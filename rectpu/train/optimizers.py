"""Self-built optimizers with TF-1.x update semantics.

Replaces the reference's optimizer registry
(/root/reference/trainers/model_utils.py:57-66): {Adagrad, Adam, Ftrl,
RMSProp, SGD}, each reproducing the corresponding ``tf.train.*Optimizer``
update rule and default hyperparameters (including TF's non-standard
initial accumulator values), so training dynamics match the reference's
canned estimators.

Interface (optax-style, but params-in/params-out):
    opt = adam(learning_rate=1e-3)
    state = opt.init(params)
    params, state = opt.update(grads, state, params)
All updates are pure jnp and jit through; state is a pytree, so checkpoints
and shardings treat it like params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Optimizer:
    name: str
    init: Callable
    update: Callable  # (grads, state, params) -> (new_params, new_state)
    # optional post-init param transform (fp32 model.init output -> the stored
    # training params); the Trainer applies it once after optimizer.init
    prepare: Callable | None = None


BF16_SR = "bfloat16_sr"  # slot-dtype token: bf16 storage w/ stochastic rounding


def _g32(g):
    """Upcast a (possibly bf16, via table_grad_dtype) cotangent to fp32 before
    slot products: bf16*bf16 promotes to bf16, rounding each g^2 / (1-b)*g
    increment to 8 mantissa bits before it ever reaches the fp32 accumulator."""
    return g.astype(jnp.float32) if g.dtype != jnp.float32 else g


def stochastic_round_bf16(x: jax.Array, seed: jax.Array) -> jax.Array:
    """Unbiased fp32 -> bf16 downcast via stochastic rounding.

    Plain bf16 accumulators stall: an increment below ulp/2 of the running
    value rounds to nothing every step (this is why bf16 Adam ``v`` loses
    AUC — the (1-b2)*g^2 increments vanish). Adding uniform noise over the
    truncated 16 mantissa bits before truncating makes the rounding unbiased,
    so tiny increments land with proportional probability — the same trick
    TPU embedding hardware uses for bf16 gradient accumulation.

    The noise comes from a murmur-style hash of (flat element index, seed) —
    a few VPU ops per element, no RNG state, no extra memory traffic, and
    deterministic given ``seed`` (pass the step counter: same run → same
    rounding, bitwise-reproducible training).
    """
    orig_dtype = x.dtype
    assert orig_dtype == jnp.float32, orig_dtype
    xi = jax.lax.bitcast_convert_type(x, jnp.uint32)
    idx = jax.lax.iota(jnp.uint32, x.size).reshape(x.shape)
    h = idx * jnp.uint32(2654435761) + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    xi = xi + (h & jnp.uint32(0xFFFF))
    rounded = jax.lax.bitcast_convert_type(xi & jnp.uint32(0xFFFF0000), jnp.float32)
    return rounded.astype(jnp.bfloat16)


def _fused_backend_ok() -> bool:
    """The fused table sweep needs a real TPU lowering (Mosaic)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def sgd(learning_rate: float = 0.001) -> Optimizer:
    """tf.train.GradientDescentOptimizer."""

    def init(params):
        return {}

    def update(grads, state, params):
        new_params = jax.tree.map(lambda p, g: p - learning_rate * g, params, grads)
        return new_params, state

    return Optimizer("SGD", init, update)


def adam(
    learning_rate: float = 0.001,
    beta1: float = 0.9,
    beta2: float = 0.999,
    epsilon: float = 1e-8,
    slot_dtype=None,
    fused_leaves: tuple = (),
    fused_tile_rows: int = 2048,
) -> Optimizer:
    """tf.train.AdamOptimizer: lr_t = lr*sqrt(1-b2^t)/(1-b1^t);
    p -= lr_t * m / (sqrt(v) + eps). Note eps is added OUTSIDE the
    bias-corrected sqrt (TF semantics, differs from some Adam variants).

    ``slot_dtype`` stores optimizer slots in a reduced dtype while keeping
    params and all update arithmetic in fp32 — halves the slot memory traffic
    (the m/v read+write dominates the dense table sweep). Accepts a dtype
    (both slots) or a {"m": dt, "v": dt} dict with None entries meaning fp32.
    MEASURED (parity config, 20k steps): m-in-bf16 is AUC-neutral; v-in-bf16
    LOSES ~0.02 AUC — the per-step (1-b2)*g^2 increment falls below bf16's
    8-bit mantissa and v stalls. Prefer {"m": bf16} unless the gradient scale
    has been checked. Default None keeps fp32 slots = exact TF parity.

    ``fused_leaves``: names of top-level [V, W] param-dict leaves to update
    with the single-sweep Pallas kernel (ops/fused_adam) instead of the
    tree-map path — one HBM pass over p/m/v/grad, no separate master
    write-back copy. Same arithmetic (tests/test_fused_adam.py); rows must
    divide by ``fused_tile_rows``. Ignored off-TPU."""

    if isinstance(slot_dtype, dict):
        m_dtype, v_dtype = slot_dtype.get("m"), slot_dtype.get("v")
    else:
        m_dtype = v_dtype = slot_dtype

    def storage(dt):
        return jnp.bfloat16 if dt == BF16_SR else dt

    def init(params):
        def zeros(dt):
            return lambda p: (
                jnp.zeros_like(p) if dt is None else jnp.zeros_like(p, dtype=storage(dt))
            )

        return {
            "m": jax.tree.map(zeros(m_dtype), params),
            "v": jax.tree.map(zeros(v_dtype), params),
            "t": jnp.zeros((), jnp.int32),
        }

    def up(x, dt):
        return x.astype(jnp.float32) if dt is not None else x

    def down(x, dt, t, orig_dtype=None):
        if dt == BF16_SR:
            return stochastic_round_bf16(x, t)
        if dt is None:
            # slots follow the param dtype (zeros_like init); the fp32-upcast
            # slot math must not silently widen a bf16 slot to f32
            return x if orig_dtype is None else x.astype(orig_dtype)
        return x.astype(dt)

    def fusable(key, params):
        if not (isinstance(params, dict) and key in params):
            return False
        p = params[key]
        return (
            getattr(p, "ndim", 0) == 2
            and p.shape[0] % fused_tile_rows == 0
            and _fused_backend_ok()
        )

    def update(grads, state, params):
        t = state["t"] + 1
        fused_out = {}
        if fused_leaves:
            from rectpu.ops.fused_adam import fused_adam_table

            for key in fused_leaves:
                if fusable(key, params):
                    fused_out[key] = fused_adam_table(
                        params[key], state["m"][key], state["v"][key],
                        grads[key], t,
                        lr=learning_rate, beta1=beta1, beta2=beta2, eps=epsilon,
                        m_sr=m_dtype == BF16_SR, v_sr=v_dtype == BF16_SR,
                        tile_rows=fused_tile_rows,
                    )
            if fused_out:
                rest = lambda tree: {k: x for k, x in tree.items() if k not in fused_out}
                p2, s2 = _treemap_update(
                    rest(grads), {"m": rest(state["m"]), "v": rest(state["v"]), "t": state["t"]},
                    rest(params), t,
                )
                for k, (pk, mk, vk) in fused_out.items():
                    p2[k], s2["m"][k], s2["v"][k] = pk, mk, vk
                return p2, s2
        return _treemap_update(grads, state, params, t)

    def _treemap_update(grads, state, params, t):
        tf_ = t.astype(jnp.float32)
        lr_t = learning_rate * jnp.sqrt(1.0 - beta2**tf_) / (1.0 - beta1**tf_)
        # slot products from fp32-upcast grads (see _g32) — the fused kernel
        # (ops/fused_adam) computes fp32, so this keeps the paths matched
        g32 = _g32
        m = jax.tree.map(
            lambda m_, g: down(
                beta1 * up(m_, m_dtype) + (1 - beta1) * g32(g), m_dtype, t, m_.dtype
            ),
            state["m"], grads,
        )
        v = jax.tree.map(
            lambda v_, g: down(
                beta2 * up(v_, v_dtype) + (1 - beta2) * g32(g) * g32(g),
                v_dtype, t, v_.dtype,
            ),
            state["v"], grads,
        )
        def apply(p, m_, v_):
            upd = lr_t * up(m_, m_dtype) / (jnp.sqrt(up(v_, v_dtype)) + epsilon)
            if p.dtype == jnp.bfloat16:
                # bf16 master weights: fp32 update math, stochastically-rounded
                # downcast (same reasoning as the v slot: late-training updates
                # fall below bf16 ulp/2 and would round to nothing). Seed is
                # salted away from the v slot's so the two draws decorrelate.
                return stochastic_round_bf16(
                    p.astype(jnp.float32) - upd, t + jnp.int32(1 << 30)
                )
            return p - upd

        new_params = jax.tree.map(apply, params, m, v)
        return new_params, {"m": m, "v": v, "t": t}

    return Optimizer("Adam", init, update)


def adagrad(
    learning_rate: float = 0.001,
    initial_accumulator_value: float = 0.1,
    slot_dtype=None,
) -> Optimizer:
    """tf.train.AdagradOptimizer: accumulator starts at 0.1 (TF default),
    p -= lr * g / sqrt(acc).

    ``slot_dtype`` stores the accumulator reduced (fp32 math). Like Adam's v
    slot, the g^2 increments shrink below bf16 ulp/2 as acc grows, so plain
    bf16 stalls the accumulator — use BF16_SR (stochastic rounding; adds a
    step counter to the state for the rounding seed)."""
    st = jnp.bfloat16 if slot_dtype == BF16_SR else slot_dtype

    def init(params):
        state = {
            "acc": jax.tree.map(
                lambda p: jnp.full_like(
                    p, initial_accumulator_value,
                    dtype=st if st is not None else None,
                ),
                params,
            )
        }
        if slot_dtype == BF16_SR:
            state["t"] = jnp.zeros((), jnp.int32)
        return state

    def update(grads, state, params):
        t = state.get("t")
        if t is not None:
            t = t + 1

        def up(a):
            return a.astype(jnp.float32) if slot_dtype is not None else a

        def down(a):
            if slot_dtype == BF16_SR:
                return stochastic_round_bf16(a, t)
            return a.astype(slot_dtype) if slot_dtype is not None else a

        if slot_dtype is None:
            # fp32 g^2 even for bf16 cotangents; keep the slot's own dtype
            acc = jax.tree.map(
                lambda a, g: (a + _g32(g) * _g32(g)).astype(a.dtype),
                state["acc"], grads,
            )
        else:
            acc = jax.tree.map(
                lambda a, g: down(up(a) + _g32(g) * _g32(g)),
                state["acc"], grads,
            )
        # param update reads the STORED accumulator (dtype round-trip), like
        # adam's slot contract
        new_params = jax.tree.map(
            lambda p, g, a: p - learning_rate * g / jnp.sqrt(up(a)), params, grads, acc
        )
        new_state = {"acc": acc}
        if t is not None:
            new_state["t"] = t
        return new_params, new_state

    return Optimizer("Adagrad", init, update)


def rmsprop(
    learning_rate: float = 0.001,
    decay: float = 0.9,
    momentum: float = 0.0,
    epsilon: float = 1e-10,
) -> Optimizer:
    """tf.train.RMSPropOptimizer: ms initialized to ONES (TF quirk),
    mom = momentum*mom + lr*g/sqrt(ms+eps); p -= mom."""

    def init(params):
        return {
            "ms": jax.tree.map(jnp.ones_like, params),
            "mom": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        ms = jax.tree.map(lambda s, g: decay * s + (1 - decay) * g * g, state["ms"], grads)
        mom = jax.tree.map(
            lambda mo, g, s: momentum * mo + learning_rate * g / jnp.sqrt(s + epsilon),
            state["mom"], grads, ms,
        )
        new_params = jax.tree.map(lambda p, mo: p - mo, params, mom)
        return new_params, {"ms": ms, "mom": mom}

    return Optimizer("RMSProp", init, update)


def ftrl(
    learning_rate: float = 0.001,
    learning_rate_power: float = -0.5,
    initial_accumulator_value: float = 0.1,
    l1_regularization_strength: float = 0.0,
    l2_regularization_strength: float = 0.0,
) -> Optimizer:
    """tf.train.FtrlOptimizer (FTRL-proximal), TF defaults.

    With lr_power=-0.5:
        n' = n + g^2
        sigma = (sqrt(n') - sqrt(n)) / lr
        z' = z + g - sigma * w
        w' = -(z' - sign(z')*l1) / (sqrt(n')/lr + 2*l2)   if |z'| > l1 else 0
    """
    if learning_rate_power != -0.5:
        raise NotImplementedError("only learning_rate_power=-0.5 (TF default) supported")
    l1, l2 = l1_regularization_strength, l2_regularization_strength

    def init(params):
        return {
            "n": jax.tree.map(lambda p: jnp.full_like(p, initial_accumulator_value), params),
            "z": jax.tree.map(jnp.zeros_like, params),
        }

    def update(grads, state, params):
        n_new = jax.tree.map(
            lambda n, g: (n + _g32(g) * _g32(g)).astype(n.dtype), state["n"], grads
        )

        def z_up(z, g, w, n, nn):
            sigma = (jnp.sqrt(nn) - jnp.sqrt(n)) / learning_rate
            return z + g - sigma * w

        z_new = jax.tree.map(z_up, state["z"], grads, params, state["n"], n_new)

        def w_up(z, nn):
            quad = jnp.sqrt(nn) / learning_rate + 2.0 * l2
            w = -(z - jnp.sign(z) * l1) / quad
            return jnp.where(jnp.abs(z) > l1, w, jnp.zeros_like(w))

        new_params = jax.tree.map(w_up, z_new, n_new)
        return new_params, {"n": n_new, "z": z_new}

    return Optimizer("Ftrl", init, update)


def per_subtree(mapping: dict, default: Optimizer) -> Optimizer:
    """Apply different optimizers to different top-level param subtrees.

    Mirrors DNNLinearCombined's per-tower optimizers (FTRL on 'linear',
    Adagrad on the deep tower). ``mapping`` keys are top-level param dict
    keys; everything else uses ``default``.
    """

    def opt_for(key):
        return mapping.get(key, default)

    def init(params):
        return {k: opt_for(k).init(v) for k, v in params.items()}

    def update(grads, state, params):
        new_params, new_state = {}, {}
        for k in params:
            p, s = opt_for(k).update(grads[k], state[k], params[k])
            new_params[k], new_state[k] = p, s
        return new_params, new_state

    names = ",".join(f"{k}:{v.name}" for k, v in mapping.items()) + f",*:{default.name}"
    return Optimizer(f"PerSubtree({names})", init, update)


def bf16_param_store(
    inner: Optimizer, leaves: tuple = ("table", "emb"), dtype=jnp.bfloat16
) -> Optimizer:
    """Mixed-precision parameter store: keep selected top-level param leaves
    in ``dtype`` (the array every forward gather reads) while the fp32 MASTER
    rides in the optimizer state; all update math stays exact fp32.

    Contrast with ``--table-dtype bfloat16`` (bf16 master + stochastic
    rounding — a CAPACITY feature that changes numerics): this is a PERF
    feature with exact fp32 training. With an fp32 param and
    gather_dtype=bf16, every step re-casts the full [V, K+1] master before
    the gather (~119 MB of pure recast HBM traffic at the scaled 310k-row
    config). Storing the bf16 copy as THE param makes that cast a no-op; the
    fresh bf16 copy is emitted once per step from the new master, where XLA
    fuses the downcast into the optimizer's param write-back sweep — the
    recast's read+write becomes one fused write. Forward values are
    bit-identical either way (both read round_bf16(master)); training is
    BITWISE identical when the table cotangent already rides bf16
    (table_grad_dtype=bfloat16, the scaled-config contract —
    tests/test_train_e2e.py pins it). With an fp32 cotangent the leaf grad
    picks up one extra bf16 rounding at the bf16 primal boundary (a single
    round of the fp32-accumulated sum — strictly tighter than the
    accumulate-in-bf16 rounding --table-grad-dtype opts into).

    Requires the model's ``gather_dtype``/compute dtype to be ``dtype``
    already, otherwise this CHANGES the forward (it would read bf16 where
    fp32 was read before). ``init`` must see the fp32 params from
    ``model.init``; the Trainer then applies ``prepare`` to downcast the
    stored leaves. Missing leaves are skipped, so ("table", "emb") covers the
    packed and unpacked table layouts across the model zoo. Checkpoint/
    sharding need nothing special: the master is an ordinary state leaf with
    the table's shape (the ParallelPlan's shape-keyed EP rule row-shards it
    like the param it mirrors).
    """

    def picked(params):
        return {
            k: params[k]
            for k in leaves
            if isinstance(params, dict) and k in params
        }

    def init(params):
        master = picked(params)
        for k, p in master.items():
            if p.dtype != jnp.float32:
                raise ValueError(
                    f"bf16_param_store.init needs fp32 masters; param {k!r} is "
                    f"{p.dtype} (init from model.init output, not prepared params)"
                )
        return {"inner": inner.init(params), "master": master}

    def prepare(params):
        return {**params, **{k: v.astype(dtype) for k, v in picked(params).items()}}

    def update(grads, state, params):
        master = state["master"]
        full = {**params, **master}  # the inner optimizer sees fp32 masters
        new_full, new_inner = inner.update(grads, state["inner"], full)
        new_master = {k: new_full[k] for k in master}
        new_params = {
            **new_full,
            **{k: v.astype(dtype) for k, v in new_master.items()},
        }
        return new_params, {"inner": new_inner, "master": new_master}

    return Optimizer(f"{inner.name}+Bf16Store", init, update, prepare=prepare)


_REGISTRY = {
    "Adagrad": adagrad,
    "Adam": adam,
    "Ftrl": ftrl,
    "RMSProp": rmsprop,
    "SGD": sgd,
}


def get_optimizer(
    optimizer_name: str = "Adam", learning_rate: float = 0.001, slot_dtype=None
) -> Optimizer:
    """Name-based factory (ref trainers/model_utils.py:57-66).

    ``slot_dtype`` requests reduced-precision optimizer slots (Adam and
    Adagrad)."""
    if slot_dtype is not None:
        if optimizer_name == "Adam":
            return adam(learning_rate=learning_rate, slot_dtype=slot_dtype)
        if optimizer_name == "Adagrad":
            return adagrad(learning_rate=learning_rate, slot_dtype=slot_dtype)
        raise ValueError(
            f"slot_dtype is only supported for Adam/Adagrad, got {optimizer_name}"
        )
    return _REGISTRY[optimizer_name](learning_rate=learning_rate)


def packed_wide_deep(
    embedding_size: int,
    linear_lr: float,
    deep_lr: float = 0.05,
) -> Optimizer:
    """Column-split optimizer for Wide&Deep's PACKED [V, K+1] table.

    The packed table fuses the deep tower's embeddings (columns [:K],
    Adagrad) with the wide tower's per-bucket weights (column K, FTRL) into
    one parameter so the forward needs no per-step [V, K+1] concat (see
    WideDeepModel packed mode). This optimizer applies each tower's TF
    update rule to its columns of the single leaf — the recombining concat
    fuses into the parameter write XLA performs anyway. Non-table leaves:
    FTRL for the 'linear' subtree remainder (bias, numeric weights),
    Adagrad for everything else — identical update math to the unpacked
    per_subtree({linear: ftrl}, adagrad) arrangement.
    """
    k = embedding_size
    ada = adagrad(learning_rate=deep_lr)
    ft = ftrl(learning_rate=linear_lr)

    def split(tree):
        table = tree.pop("table")
        return table, tree

    def init(params):
        params = dict(params)
        table, rest = split(params)
        state = {
            "acc": jnp.full_like(table[:, :k], 0.1),
            "n": jnp.full_like(table[:, k], 0.1),
            "z": jnp.zeros_like(table[:, k]),
            "linear": ft.init(rest.get("linear", {})),
            "rest": ada.init({kk: v for kk, v in rest.items() if kk != "linear"}),
        }
        return state

    def update(grads, state, params):
        params = dict(params)
        grads = dict(grads)
        table, p_rest = split(params)
        g_table, g_rest = split(grads)

        # deep columns: Adagrad (fp32 g^2 even for bf16 cotangents, see _g32)
        g_emb = _g32(g_table[:, :k])
        acc = state["acc"] + g_emb * g_emb
        emb_new = table[:, :k] - deep_lr * g_table[:, :k] / jnp.sqrt(acc)
        # wide column: FTRL-proximal (TF defaults, l1=l2=0)
        g_w = g_table[:, k]
        w = table[:, k]
        n_new = state["n"] + _g32(g_w) * _g32(g_w)
        sigma = (jnp.sqrt(n_new) - jnp.sqrt(state["n"])) / linear_lr
        z_new = state["z"] + g_w - sigma * w
        w_new = -z_new / (jnp.sqrt(n_new) / linear_lr)

        new_table = jnp.concatenate([emb_new, w_new[:, None]], axis=1)

        lin_p, lin_s = ft.update(
            g_rest.get("linear", {}), state["linear"], p_rest.get("linear", {})
        )
        other_g = {kk: v for kk, v in g_rest.items() if kk != "linear"}
        other_p = {kk: v for kk, v in p_rest.items() if kk != "linear"}
        rest_p, rest_s = ada.update(other_g, state["rest"], other_p)

        new_params = {"table": new_table, **rest_p}
        if lin_p:
            new_params["linear"] = lin_p
        new_state = {
            "acc": acc, "n": n_new, "z": z_new,
            "linear": lin_s, "rest": rest_s,
        }
        return new_params, new_state

    return Optimizer("PackedWideDeep(Ftrl+Adagrad)", init, update)
