"""Pairwise-dot interaction op (rectpu/ops/interaction.py).

The DLRM interaction block as a fused flat-layout kernel: XLA and Pallas
(interpreted on CPU) must match an fp64 loop oracle and each other, values
AND gradients, at ragged batches and with the self-interaction diagonal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rectpu.ops.interaction import interact_flat, interact_pallas, interact_xla


def _oracle(flat, f, k, itself):
    """fp64 loop reference."""
    b = flat.shape[0]
    v = flat.astype(np.float64).reshape(b, f, k)
    out = []
    for i in range(f):
        for j in range(i if itself else i + 1, f):
            out.append(np.einsum("bk,bk->b", v[:, i], v[:, j]))
    return np.stack(out, axis=1) if out else np.zeros((b, 0))


@pytest.mark.parametrize("b,f,k,itself", [
    (64, 26, 64, False),
    (37, 7, 8, False),      # ragged batch vs the 32-row block
    (16, 5, 16, True),      # diagonal included
    (8, 2, 8, False),       # minimal pair count
])
def test_pallas_and_xla_match_fp64_oracle(b, f, k, itself, rng):
    flat = rng.normal(size=(b, f * k)).astype(np.float32)
    want = _oracle(flat, f, k, itself)
    got_x = np.asarray(interact_xla(jnp.asarray(flat), f, k, itself))
    got_p = np.asarray(
        interact_pallas(jnp.asarray(flat), f, k, itself, 32, True))
    np.testing.assert_allclose(got_x, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_p, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("itself", [False, True])
def test_pallas_grads_match_xla(itself, rng):
    b, f, k = 48, 9, 8
    flat = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    g = jnp.asarray(rng.normal(
        size=(b, f * (f + 1) // 2 if itself else f * (f - 1) // 2)
    ).astype(np.float32))

    gx = jax.grad(lambda x: (interact_xla(x, f, k, itself) * g).sum())(flat)
    gp = jax.grad(
        lambda x: (interact_pallas(x, f, k, itself, 32, True) * g).sum())(flat)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               rtol=1e-4, atol=1e-4)


def test_bf16_inputs_accumulate_fp32(rng):
    """bf16 activations: products accumulate in fp32 (kernel and XLA agree)."""
    b, f, k = 32, 26, 64
    flat = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    fb = flat.astype(jnp.bfloat16)
    got_x = np.asarray(interact_xla(fb, f, k, False))
    got_p = np.asarray(interact_pallas(fb, f, k, False, 32, True))
    np.testing.assert_allclose(got_p, got_x, rtol=1e-5, atol=1e-5)
    assert got_p.dtype == np.float32


def test_auto_dispatch_off_tpu_is_xla(rng):
    """On CPU, auto stays on the XLA impl (pallas would be interpreted)."""
    flat = jnp.asarray(rng.normal(size=(8, 4 * 8)).astype(np.float32))
    out = interact_flat(flat, 4, 8, impl="auto")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(interact_xla(flat, 4, 8)),
        rtol=1e-6, atol=1e-6)


def test_dlrm_flat_interaction_impls_agree(rng):
    """Full DLRM apply: interaction_impl pallas == xla (logits and grads)."""
    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.models import DLRMModel, TowerConfig
    from rectpu.train.metrics import sigmoid_xent

    fs = ml_100k_feature_set(numeric=("age",))
    base = dict(feature_set=fs, embedding_size=8, hidden_units=(16,),
                flat_layout=True, table_padding=128)
    mx = DLRMModel(TowerConfig(**base), bot_hidden_units=(6,),
                   interaction_impl="xla")
    mp = DLRMModel(TowerConfig(**base), bot_hidden_units=(6,),
                   interaction_impl="pallas")
    params = mx.init(jax.random.PRNGKey(0))
    batch = {
        "cat_ids": jnp.asarray(np.stack(
            [fs.offsets[i] + rng.integers(0, fs.field_sizes[i], size=33)
             for i in range(fs.num_fields)], axis=1).astype(np.int32)),
        "num_vals": jnp.asarray(rng.normal(size=(33, 1)).astype(np.float32)),
    }
    labels = jnp.asarray((rng.random(33) < 0.3).astype(np.float32))

    def loss(model, p):
        return sigmoid_xent(model.apply(p, batch), labels).mean()

    lx, gx = jax.value_and_grad(lambda p: loss(mx, p))(params)
    lp, gp = jax.value_and_grad(lambda p: loss(mp, p))(params)
    assert np.isclose(float(lx), float(lp), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        jax.device_get(gx), jax.device_get(gp),
    )


@pytest.mark.parametrize("itself", [False, True])
def test_xla_fast_bwd_matches_autodiff(itself, rng):
    """The gather-C custom backward == autodiff through the forward."""
    from rectpu.ops.interaction import interact_xla_fast

    b, f, k = 41, 11, 8
    flat = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    n_p = f * (f + 1) // 2 if itself else f * (f - 1) // 2
    g = jnp.asarray(rng.normal(size=(b, n_p)).astype(np.float32))

    out_fast = interact_xla_fast(flat, f, k, itself)
    out_ref = interact_xla(flat, f, k, itself)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-6, atol=1e-6)
    gf = jax.grad(lambda x: (interact_xla_fast(x, f, k, itself) * g).sum())(flat)
    ga = jax.grad(lambda x: (interact_xla(x, f, k, itself) * g).sum())(flat)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(ga),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("itself", [False, True])
def test_pallas_mxu_variant_matches_oracle(itself, rng):
    """The round-3 MXU-reduction variant (block-ones matmul per left field,
    _fwd_kernel_mxu) matches the XLA oracle, values and grads."""
    import jax
    import jax.numpy as jnp

    from rectpu.ops.interaction import interact_flat, interact_xla

    b, f, k = 48, 26, 16
    flat = jnp.asarray(rng.normal(size=(b, f * k)).astype(np.float32))
    ref = interact_xla(flat, f, k, itself)
    got = interact_flat(flat, f, k, itself, impl="pallas-mxu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda x: jnp.sum(interact_xla(x, f, k, itself)))(flat)
    g_got = jax.grad(
        lambda x: jnp.sum(interact_flat(x, f, k, itself, impl="pallas-mxu"))
    )(flat)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)
