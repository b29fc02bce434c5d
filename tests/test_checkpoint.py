"""Checkpointer tests: atomic save/restore, rotation, structure fidelity."""

import jax
import jax.numpy as jnp
import numpy as np

from rectpu.train.checkpoint import Checkpointer


def _tree():
    return {
        "params": {
            "emb": jnp.arange(12.0).reshape(3, 4),
            "mlp": [{"kernel": jnp.ones((2, 2)), "bias": jnp.zeros((2,))}],
        },
        "opt": {"m": {"emb": jnp.full((3, 4), 0.5)}, "t": jnp.asarray(7, jnp.int32)},
    }


def test_save_restore_roundtrip(tmp_path):
    ckpt = Checkpointer(tmp_path, keep=5)
    tree = _tree()
    ckpt.save(100, tree, extra_meta={"rng": [1, 2], "data_state": {"epoch": 3, "index": 17}})
    restored, meta = ckpt.restore()
    assert meta["step"] == 100
    assert meta["data_state"] == {"epoch": 3, "index": 17}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), tree, restored)
    # structure preserved exactly (lists stay lists, dtypes kept)
    assert isinstance(restored["params"]["mlp"], list)
    assert restored["opt"]["t"].dtype == np.int32


def test_latest_and_rotation(tmp_path):
    ckpt = Checkpointer(tmp_path, keep=3)
    for s in [10, 20, 30, 40, 50]:
        ckpt.save(s, {"x": jnp.asarray(float(s))})
    assert ckpt.latest_step() == 50
    assert ckpt.all_steps() == [30, 40, 50]  # keep_checkpoint_max rotation
    restored, _ = ckpt.restore(40)
    assert float(restored["x"]) == 40.0


def test_restore_empty_dir(tmp_path):
    ckpt = Checkpointer(tmp_path)
    assert ckpt.restore() is None
    assert ckpt.latest_step() is None


def test_async_save_and_restore(tmp_path):
    ckpt = Checkpointer(tmp_path, keep=2, async_write=True)
    for s in [1, 2, 3]:
        ckpt.save(s, {"x": jnp.asarray(float(s)), "big": jnp.arange(10000.0)})
    ckpt.wait()
    assert ckpt.all_steps() == [2, 3]
    restored, meta = ckpt.restore()
    assert meta["step"] == 3 and float(restored["x"]) == 3.0

    # restore() joins an in-flight save first
    ckpt.save(4, {"x": jnp.asarray(4.0), "big": jnp.arange(10000.0)})
    restored, meta = ckpt.restore()
    assert meta["step"] == 4


def test_async_mutation_after_save_is_safe(tmp_path):
    """The host copy is snapshotted at save(); later donation/mutation of the
    device arrays must not corrupt the checkpoint."""
    import numpy as np

    ckpt = Checkpointer(tmp_path, keep=2, async_write=True)
    arr = jnp.arange(100.0)
    ckpt.save(7, {"a": arr})
    arr2 = jax.jit(lambda x: x * 0, donate_argnums=0)(arr)  # donates/invalidates arr
    ckpt.wait()
    restored, _ = ckpt.restore(7)
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(100.0))


def test_bf16_leaves_roundtrip(tmp_path):
    """bf16 params (table_dtype=bfloat16) survive save/restore bitwise —
    npz alone degrades ml_dtypes to raw void, so the checkpointer stores
    them as tagged uint16 bit patterns."""
    import jax.numpy as jnp

    from rectpu.train.checkpoint import Checkpointer

    tree = {
        "table": (jnp.arange(80, dtype=jnp.float32).reshape(16, 5) / 7).astype(jnp.bfloat16),
        "b": jnp.zeros((3,), jnp.float32),
    }
    ck = Checkpointer(tmp_path)
    ck.save(1, tree)
    restored, _ = ck.restore()
    assert restored["table"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["table"]).view(np.uint16),
        np.asarray(tree["table"]).view(np.uint16),
    )
    assert restored["b"].dtype == np.float32
