"""MXU row-scatter (ops/scatter_rows) vs reference scatter-add."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rectpu.ops.scatter_rows import scatter_rows_dense


def _ref(ids, updates, v):
    out = np.zeros((v, updates.shape[1]), np.float32)
    np.add.at(out, ids, updates.astype(np.float32))
    return out


@pytest.mark.parametrize("v,r,w,tr,c", [
    (4096, 600, 65, 512, 128),     # tr divides v
    (4100, 600, 65, 512, 128),     # padded-v slice path
    (1024, 2000, 16, 256, 640),    # heavy collisions, capacity ample
    (512, 64, 8, 128, 128),        # tiny
])
def test_matches_reference(v, r, w, tr, c):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, v, r).astype(np.int32)
    upd = rng.standard_normal((r, w)).astype(np.float32)
    got = scatter_rows_dense(
        jnp.asarray(ids), jnp.asarray(upd), v, tile_rows=tr, capacity=c,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), _ref(ids, upd, v), rtol=1e-5, atol=1e-5)


def test_capacity_overflow_falls_back_exactly():
    """All ids in one tile >> capacity: cond must take the XLA scatter branch
    and still be exact."""
    v, r, w = 2048, 900, 32
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 100, r).astype(np.int32)  # all in tile 0
    upd = rng.standard_normal((r, w)).astype(np.float32)
    got = scatter_rows_dense(
        jnp.asarray(ids), jnp.asarray(upd), v, tile_rows=512, capacity=64,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), _ref(ids, upd, v), rtol=1e-5, atol=1e-5)


def test_bf16_updates_accumulate_fp32():
    """Collisions sum in fp32 even for bf16 updates (better than a bf16
    serial scatter): 256 collisions of 1.0 must give exactly 256."""
    v, r, w = 512, 256, 8
    ids = np.zeros(r, np.int32)
    upd = np.ones((r, w), np.float32)
    got = scatter_rows_dense(
        jnp.asarray(ids), jnp.asarray(upd, np.float32).astype(jnp.bfloat16), v,
        tile_rows=128, capacity=512, interpret=True, out_dtype=jnp.float32,
    )
    np.testing.assert_array_equal(np.asarray(got)[0], np.full(w, 256.0))
    assert np.all(np.asarray(got)[1:] == 0)


def test_unsorted_duplicate_boundary_ids():
    """Ids exactly on tile boundaries, duplicated, reverse-sorted input."""
    v, w, tr = 1024, 4, 256
    ids = np.array([768, 512, 512, 256, 255, 0, 0, 1023], np.int32)
    upd = np.arange(8 * w, dtype=np.float32).reshape(8, w)
    got = scatter_rows_dense(
        jnp.asarray(ids), jnp.asarray(upd), v, tile_rows=tr, capacity=16,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), _ref(ids, upd, v), rtol=1e-6)


def test_repack_placement_matches_resident():
    """The super-segment repack form (large-stream regime) produces the same
    dense result as the resident form and the numpy reference."""
    import numpy as np

    from rectpu.ops.scatter_rows import scatter_rows_dense

    rng = np.random.default_rng(9)
    v, w, r = 64 * 20, 3, 700
    ids = jnp.asarray(rng.integers(0, v, size=r).astype(np.int32))
    upd = jnp.asarray(rng.normal(size=(r, w)).astype(np.float32))
    want = np.zeros((v, w), np.float32)
    np.add.at(want, np.asarray(ids), np.asarray(upd))
    for placement in ("resident", "repack"):
        got = scatter_rows_dense(
            ids, upd, v, tile_rows=64, capacity=96, interpret=True,
            stream_placement=placement,
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5,
                                   err_msg=placement)


def test_tiles_per_step_matches_reference():
    """Round-4: tiles_per_step>1 (multiple output tiles per grid step, the
    grid-overhead amortization) is bit-equivalent to tps=1 on both stream
    placements, including grids the tps does not divide (phantom padding
    tiles emit zeros that slice off)."""
    import numpy as np

    from rectpu.ops.scatter_rows import scatter_rows_dense

    rng = np.random.default_rng(11)
    w = 5
    for v, r, tr, cap in [(64 * 20, 700, 64, 96), (64 * 9 + 17, 400, 64, 128)]:
        ids = jnp.asarray(rng.integers(0, v, size=r).astype(np.int32))
        upd = jnp.asarray(rng.normal(size=(r, w)).astype(np.float32))
        want = np.zeros((v, w), np.float32)
        np.add.at(want, np.asarray(ids), np.asarray(upd))
        for tps in (2, 4, 8):
            for placement in ("resident", "repack"):
                got = scatter_rows_dense(
                    ids, upd, v, tile_rows=tr, capacity=cap, interpret=True,
                    stream_placement=placement, tiles_per_step=tps,
                )
                np.testing.assert_allclose(
                    np.asarray(got), want, rtol=1e-5, atol=1e-5,
                    err_msg=f"v={v} tps={tps} {placement}")
