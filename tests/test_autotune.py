"""Autotuner smoke test (CPU): runs all impls, sets coherent winners."""

import pytest

from rectpu.ops import embedding as emb_ops
from rectpu.ops import fm as fm_ops
from rectpu.ops.autotune import autotune


@pytest.fixture(autouse=True)
def restore_global_pins():
    """Every autotune run mutates the GLOBAL "auto" dispatch pins with a
    TIMING-DEPENDENT winner; a leaked Pallas pin broke batch-polymorphic
    jax.export in later tests intermittently (static tile sizes cannot trace
    under a symbolic batch dim)."""
    from rectpu.ops import interaction as int_ops
    from rectpu.ops import scatter_rows as sr_ops

    saved = [
        (emb_ops._AUTO_DEFAULT, dict(emb_ops._AUTO_DEFAULT)),
        (emb_ops._FLAT_SCATTER_AUTO, dict(emb_ops._FLAT_SCATTER_AUTO)),
        (fm_ops._AUTO_DEFAULT, dict(fm_ops._AUTO_DEFAULT)),
        (fm_ops._FLAT_AUTO, dict(fm_ops._FLAT_AUTO)),
        (int_ops._INTERACT_AUTO, dict(int_ops._INTERACT_AUTO)),
        (sr_ops._AUTO_TILE, dict(sr_ops._AUTO_TILE)),
    ]
    yield
    for live, before in saved:
        live.update(before)


def test_autotune_smoke():
    result = autotune(batch=64, num_fields=8, embedding_size=4, vocab_rows=512,
                      include_grad=False)
    assert result["lookup"] in ("take", "onehot", "pallas")
    assert result["fm"] in ("xla", "pallas")
    assert all(t > 0 for t in result["timings_s"].values())
    # the dispatcher now resolves "auto" to the winner
    key = "tpu" if emb_ops._on_tpu() else "other"
    assert emb_ops._AUTO_DEFAULT[key] == result["lookup"]


def test_autotune_skips_onehot_for_large_vocab():
    result = autotune(batch=32, num_fields=4, embedding_size=4, vocab_rows=50_000,
                      include_grad=False)
    assert result["lookup"] == "take"  # one-hot candidates excluded
    assert "lookup/onehot" not in result["timings_s"]


def test_autotune_with_field_info():
    from rectpu.features.schema import ml_100k_feature_set

    fs = ml_100k_feature_set()
    field_info = (tuple(int(o) for o in fs.offsets), tuple(fs.field_sizes))
    result = autotune(batch=64, num_fields=fs.num_fields, embedding_size=4,
                      vocab_rows=fs.total_buckets, include_grad=True,
                      field_info=field_info)
    assert "lookup/split" in result["timings_s"]
    assert result["lookup"] in ("take", "onehot", "pallas", "split")
    # round-3: the production flat path is tuned too, and each pin matches
    # the dispatcher state the next jit will read
    assert result["flat_scatter"] in ("xla", "mxu")
    assert result["fm_flat"] in ("xla", "pallas")
    assert result["interact"] in ("xla", "pallas", "pallas-mxu")
    key = "tpu" if emb_ops._on_tpu() else "other"
    assert emb_ops._FLAT_SCATTER_AUTO[key] == result["flat_scatter"]
