"""Post-training int8 quantization of embedding tables for serving.

Beyond-reference capability (the reference serves fp32 SavedModels,
/root/reference/scripts/mle_deploy.sh): symmetric per-row int8 quantization
of the embedding table in an export — ~4x smaller serving artifacts, with
the per-row scale bounding the elementwise error at max|row|/254. This is a
capacity/memory feature, NOT a latency win: measured on the v5e, the
dequantizing int8 gather is slower than the plain f32 gather at the serving
shape (4.37 vs 2.86 ms — RESULTS.md round-2 queue), because the per-row
rescale multiply dominates the saved HBM bytes at small K.

Two entry points:

- ``quantize_export(export_dir)`` — rewrite an export directory with the
  table stored as ``{"q": int8 [V, C], "s": float32 [V]}``; ``load_model``
  recognises ``model.json``'s ``"table_quant": "int8"`` and serves it through
  a dequantizing gather (``lookup_fn`` hook — no model-code changes).
  CLI: ``python -m rectpu.serve.quant <export_dir> [--out DIR]``.
- ``quantize_serving(served)`` — quantize an already-loaded ``ServingModel``
  in memory (``rectpu.serve.server --table-quant int8``).

Only the embedding table is quantized (the dominant artifact weight: V×(K+1)
vs the MLP's few thousand params). Models whose linear tower is fused into
the table gather (fuse_linear_lookup, the default) are first re-expressed in
their packed [V, K+1] single-table form — the same transform their
``packed_linear`` training mode applies at init — so the quantized leaf is
the one the gather actually reads. The linear-only model has no table and
passes through unchanged.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def quantize_rows(arr) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8: ``q = round(row / s)``, ``s = max|row|/127``.

    Zero rows get scale 1 (q = 0 exactly). Elementwise error <= s/2."""
    arr = np.asarray(arr, dtype=np.float32)
    absmax = np.abs(arr).max(axis=1)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(arr / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def dequantize_rows(q, scale) -> np.ndarray:
    return np.asarray(q, np.float32) * np.asarray(scale, np.float32)[:, None]


def dequant_lookup(qtable: dict, ids):
    """Dequantizing gather: int8 rows + per-row scales -> fp32 embeddings.

    Moves 4x fewer HBM bytes than an fp32 gather of the same rows; the
    multiply fuses into the gather consumer under jit."""
    import jax.numpy as jnp

    rows = jnp.take(qtable["q"], ids, axis=0).astype(jnp.float32)
    scales = jnp.take(qtable["s"], ids, axis=0)
    return rows * scales[..., None]


def _is_quantized_leaf(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "s" in leaf


def _pack_fused_linear(model, params):
    """Re-express a fused-lookup model in its packed single-table form.

    Same transform as the packed_linear init-time packing (models/base.py::
    pack_fused_table): ``table = [emb | linear.w]``, the linear weight column
    riding the shared gather. Returns (model', params')."""
    from rectpu.models.base import pack_fused_table
    from rectpu.serve.export import model_toggle_kwargs

    cfg2 = dataclasses.replace(model.cfg, packed_linear=True)
    model2 = model.__class__(cfg2, **model_toggle_kwargs(model))
    params2 = dict(params)
    params2["linear"] = dict(params["linear"])
    emb = params2.pop("emb")
    w = params2["linear"].pop("w")
    params2["table"] = pack_fused_table(emb, w)
    return model2, params2


def quantize_params(model, params):
    """Quantize the table leaf of (model, params) for serving.

    Returns ``(model', params', quantized: bool)`` — ``model'`` may be a
    packed re-expression of ``model`` (see module docstring); ``params'``
    carries the table as ``{"q", "s"}``. ``quantized`` is False when the
    model has no embedding table (linear model) or the table is ALREADY
    quantized (idempotent: --table-quant int8 on a pre-quantized export,
    or quantizing the same export twice, must not crash)."""
    if _is_quantized_leaf(params.get("table")) or _is_quantized_leaf(params.get("emb")):
        return model, params, False
    fuses = (
        "emb" in params
        and "linear" in params
        and "w" in params.get("linear", {})
        and model.cfg.fuse_linear_lookup
        # DeepFM only fuses when the linear tower is on next to mf/dnn
        and getattr(model, "use_linear", True)
        and (getattr(model, "use_mf", True) or getattr(model, "use_dnn", True))
    )
    if fuses:
        model, params = _pack_fused_linear(model, params)
    if "table" in params:
        key = "table"
    elif "emb" in params:
        key = "emb"
    else:
        return model, params, False
    q, s = quantize_rows(np.asarray(params[key], dtype=np.float32))
    params = dict(params)
    params[key] = {"q": q, "s": s}
    return model, params, True


def make_quantized_apply(model):
    """The jitted predict fn over quantized params (dequantizing gather)."""
    import jax

    from rectpu.train.metrics import binary_predictions

    def fn(p, b):
        return binary_predictions(
            model.apply(p, b, train=False, lookup_fn=dequant_lookup)
        )

    return jax.jit(fn)


def quantize_serving(served):
    """In-memory quantization of a loaded ServingModel."""
    from rectpu.serve.export import ServingModel

    model, params, did = quantize_params(served.model, served.params)
    if not did:
        return served
    return ServingModel(
        model, params, served.feature_set, max_batch=served.max_batch,
        apply_fn=make_quantized_apply(model), row_perm=served.row_perm,
    )


def quantize_export(export_dir, out_dir=None):
    """Rewrite an export directory with an int8-quantized table.

    In place by default (atomic swap); ``out_dir`` writes a sibling artifact
    instead. The serialized StableHLO graph is dropped (it was traced over
    fp32 params); ``load_model(..., use_serialized=True)`` on a quantized
    export raises."""
    import json
    import shutil
    from pathlib import Path

    from rectpu.serve.export import load_model
    from rectpu.train.checkpoint import _flatten, _treedef_template

    export_dir = Path(export_dir)
    meta = json.loads((export_dir / "model.json").read_text())
    if meta.get("table_quant"):
        raise ValueError(f"{export_dir}: already quantized ({meta['table_quant']})")
    served = load_model(export_dir)
    model, params, did = quantize_params(served.model, served.params)
    if not did:
        raise ValueError(f"{export_dir}: model has no embedding table to quantize")

    meta["table_quant"] = "int8"
    meta["template"] = _treedef_template(params)
    meta["tower_config"]["packed_linear"] = model.cfg.packed_linear
    meta["serialized_apply"] = False
    meta.pop("serialized_apply_error", None)

    dest = Path(out_dir) if out_dir is not None else export_dir
    tmp = dest.parent / f".tmp-quant-{dest.name}"
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    try:
        np.savez(tmp / "arrays.npz", **_flatten(params))
        (tmp / "model.json").write_text(json.dumps(meta))
        if (export_dir / "row_perm.npy").exists():
            shutil.copy2(export_dir / "row_perm.npy", tmp / "row_perm.npy")
        if dest.exists():
            # swap with a restore path: if the second rename fails, put the
            # original back so dest never ends up missing (the leading-dot
            # backup name also keeps latest_export from ever serving it)
            old = dest.parent / f".old-{dest.name}"
            if old.exists():
                shutil.rmtree(old)
            dest.rename(old)
            try:
                tmp.rename(dest)
            except BaseException:
                old.rename(dest)
                raise
            shutil.rmtree(old)
        else:
            tmp.rename(dest)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return dest


def main(argv=None):
    import argparse

    from rectpu.utils.logging import get_logger

    logger = get_logger(__name__)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("export_dir", help="export directory to quantize")
    ap.add_argument("--out", default=None,
                    help="write the quantized artifact here instead of in place")
    a = ap.parse_args(argv)
    dest = quantize_export(a.export_dir, a.out)
    logger.info("quantized export written: %s", dest)


if __name__ == "__main__":
    main()
