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
