"""Model export + serving-side predict path.

Replaces the reference's SavedModel export
(LatestExporter + serving_input_fn, /root/reference/trainers/conf_utils.py:20-24,
/root/reference/trainers/ml_100k.py:64-88) and the ML-Engine prediction
contract (/root/reference/scripts/mle_deploy.sh). An export is a directory

    <job_dir>/export/exporter/<timestamp>/
        arrays.npz    # model params
        model.json    # model family + TowerConfig + feature schema

``load_model`` rebuilds the model + a jitted apply fn; ``ServingModel.predict``
accepts the reference's serving request schema — required features
user_id, item_id, age, gender, occupation, zipcode, release_year, with the 19
genre flags optional and defaulting to 0 — and returns the binary head's
outputs (logits / logistic / probabilities / class_id).

Each export additionally carries ``apply.jaxexport``: the inference graph
serialized via ``jax.export`` (StableHLO, batch-polymorphic, lowered for both
cpu and tpu). Like a SavedModel's GraphDef, it makes the artifact
self-contained — a server can execute it without the Python model code — and
skips retracing at startup. ``load_model(..., use_serialized=True)`` runs
predictions through it; the default keeps the Python apply (needed for
kernel-impl autotuning) but verifies against the same math.
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

import jax
import numpy as np

from rectpu.features.schema import GENRE, FeatureSet, ml_100k_feature_set
from rectpu.models import MODEL_REGISTRY, TowerConfig
from rectpu.train.checkpoint import (
    _flatten,
    _load_flat_npz,
    _rebuild,
    _treedef_template,
)
from rectpu.train.metrics import binary_predictions
from rectpu.utils.logging import get_logger

logger = get_logger(__name__)

SERVING_REQUIRED = ["user_id", "item_id", "age", "gender", "occupation", "zipcode", "release_year"]


def model_toggle_kwargs(model) -> dict:
    """The ctor kwargs a model family needs to rebuild an equivalent
    instance: DeepFM's use_linear/use_mf/use_dnn toggles by default, or a
    model-declared EXPORT_KWARGS tuple (DLRM's bot_hidden_units etc.).
    Values must be JSON-serializable; tuples round-trip as lists, so ctors
    must accept either."""
    keys = getattr(model, "EXPORT_KWARGS", ("use_linear", "use_mf", "use_dnn"))
    return {
        k: (list(v) if isinstance(v := getattr(model, k), tuple) else v)
        for k in keys
        if hasattr(model, k)
    }


def _serialized_apply_bytes(model, params_host) -> bytes:
    """Serialize the inference graph with jax.export.

    Batch-polymorphic (symbolic leading dim) so one artifact serves every
    request size; lowered for cpu AND tpu so the artifact is portable. EVERY
    kernel-impl choice is pinned to a shape-polymorphic-safe one (plain
    gather, XLA FM): "auto" impls consult the autotuner's GLOBAL pins, and a
    pinned Pallas kernel bakes in static batch tiles — tracing it under a
    symbolic b raises InconclusiveDimensionOperation (seen when an autotune
    run preceded an export in the same process)."""
    import dataclasses

    import jax.numpy as jnp
    from jax import export as jax_export

    from rectpu.ops.embedding import lookup_take

    cfg_safe = dataclasses.replace(
        model.cfg, fm_impl="xla", embedding_impl="take", flat_layout=False
    )
    export_model_obj = model.__class__(cfg_safe, **model_toggle_kwargs(model))

    (b,) = jax_export.symbolic_shape("b")
    fs = model.cfg.feature_set
    param_specs = jax.tree.map(
        lambda p: jax.ShapeDtypeStruct(np.shape(p), np.asarray(p).dtype), params_host
    )
    batch_spec = {
        "cat_ids": jax.ShapeDtypeStruct((b, fs.num_fields), jnp.int32),
        "num_vals": jax.ShapeDtypeStruct((b, fs.num_numeric), jnp.float32),
    }

    def fn(p, batch):
        return binary_predictions(
            export_model_obj.apply(p, batch, train=False, lookup_fn=lookup_take)
        )

    exp = jax_export.export(jax.jit(fn), platforms=("cpu", "tpu"))(param_specs, batch_spec)
    return exp.serialize()


def export_model(
    params,
    model,
    job_dir: str | Path,
    step: int,
    exports_to_keep: int = 5,
    row_perm=None,
) -> Path:
    """Write an export under <job_dir>/export/exporter/<ts>/ (LatestExporter
    layout) and prune old exports."""
    if not isinstance(model.cfg.activation, str):
        # a callable can't be recorded in model.json; silently writing a
        # default would make load_model serve a DIFFERENT activation
        raise ValueError(
            "export requires a string activation (got a callable); register "
            "it by name in models.base.get_activation"
        )
    base = Path(job_dir) / "export" / "exporter"
    base.mkdir(parents=True, exist_ok=True)
    ts = str(int(time.time() * 1000))
    tmp = base / f".tmp-{ts}"
    final = base / ts
    tmp.mkdir()
    try:
        params_host = jax.device_get(params)
        flat = _flatten(params_host)
        np.savez(tmp / "arrays.npz", **flat)
        cfg = model.cfg
        meta = {
            "model": model.name,
            "step": step,
            "template": _treedef_template(params_host),
            "tower_config": {
                "embedding_size": cfg.embedding_size,
                "hidden_units": list(cfg.hidden_units),
                "activation": cfg.activation,
                "dropout": cfg.dropout,
                "embedding_impl": cfg.embedding_impl,
                "fm_impl": cfg.fm_impl,
                "compute_dtype": cfg.compute_dtype,
                "table_padding": cfg.table_padding,
                "fuse_linear_lookup": cfg.fuse_linear_lookup,
                "packed_linear": cfg.packed_linear,
            },
            "numeric_features": [f.name for f in cfg.feature_set.numeric],
            "model_kwargs": model_toggle_kwargs(model),
        }
        if row_perm is not None:
            # training relabeled row ids (frequency-aware EP placement,
            # parallel/placement.py); serving must encode with the same map
            np.save(tmp / "row_perm.npy", np.asarray(row_perm, dtype=np.int32))
            meta["row_placement"] = True
        try:
            (tmp / "apply.jaxexport").write_bytes(_serialized_apply_bytes(model, params_host))
            meta["serialized_apply"] = True
        except Exception as e:  # pragma: no cover - depends on backend support
            logger.warning("jax.export serialization skipped: %s", e)
            meta["serialized_apply"] = False
            meta["serialized_apply_error"] = f"{type(e).__name__}: {e}"[:500]
        (tmp / "model.json").write_text(json.dumps(meta))
        tmp.rename(final)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    # prune to newest N exports
    exports = sorted([p for p in base.iterdir() if p.is_dir() and not p.name.startswith(".")])
    for old in exports[:-exports_to_keep] if exports_to_keep > 0 else []:
        shutil.rmtree(old, ignore_errors=True)
    logger.info("model exported: %s", final)
    return final


def latest_export(job_dir: str | Path) -> Path | None:
    base = Path(job_dir) / "export" / "exporter"
    if not base.exists():
        return None
    exports = sorted(
        p for p in base.iterdir()
        # dot-prefixed dirs are in-flight tmp/backup artifacts (export_model,
        # serve/quant in-place swap) — never serve them
        if p.is_dir() and not p.name.startswith(".") and (p / "model.json").exists()
    )
    return exports[-1] if exports else None


class ServingModel:
    """A restored model with a jitted predict function over raw features.

    Requests are padded to power-of-two batch buckets so the jitted apply
    compiles once per bucket instead of once per request size (a fresh XLA
    compile per novel batch size would stall online serving).
    """

    def __init__(
        self, model, params, feature_set: FeatureSet, max_batch: int = 4096,
        apply_fn=None, row_perm=None,
    ):
        self.model = model
        self.params = params
        self.feature_set = feature_set
        self.max_batch = max_batch
        self.row_perm = None if row_perm is None else np.asarray(row_perm, np.int32)
        if apply_fn is None:
            apply_fn = jax.jit(lambda p, b: binary_predictions(model.apply(p, b, train=False)))
        self._apply = apply_fn

    def _bucket(self, n: int) -> int:
        """Power-of-two buckets capped at max_batch; beyond it, multiples of
        max_batch — a bounded compile set either way (returning n exactly
        would compile a fresh executable per novel oversize request). The cap
        matters for non-power-of-two max_batch: a 2500-row request at
        max_batch=3000 pads to 3000, not 4096."""
        if n > self.max_batch:
            return -(-n // self.max_batch) * self.max_batch
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def warmup(self, sizes=(1,)) -> None:
        """Pre-compile the predict fn for the buckets of the given sizes."""
        for n in sizes:
            b = self._bucket(n)
            batch = {
                "cat_ids": np.zeros((b, self.feature_set.num_fields), np.int32),
                "num_vals": np.zeros((b, self.feature_set.num_numeric), np.float32),
            }
            jax.block_until_ready(self._apply(self.params, batch))

    def encode_request(self, features: dict) -> dict:
        """Validate + encode raw serving features to dense model arrays.

        Required keys: user_id, item_id, age, gender, occupation, zipcode,
        release_year. The 19 genre flags are optional and default to 0
        (ref trainers/ml_100k.py:64-88). Returns ``{"cat_ids": [n, F] int32,
        "num_vals": [n, num_numeric] float32}`` — CPU work, safe to run
        concurrently from request threads (see serve.batching).
        """
        required = SERVING_REQUIRED + [
            f.name for f in self.feature_set.numeric
            # genre-named numerics stay optional: the GENRE loop below
            # defaults them to 0 exactly like the categorical flags
            if f.name not in SERVING_REQUIRED and f.name not in GENRE
        ]
        missing = [k for k in required if k not in features]
        if missing:
            raise ValueError(f"missing required serving features: {missing}")
        def to_column(value, name):
            """One-pass conversion to the dtype the encoders consume: string
            columns go STRAIGHT to a NUL-padded bytes array (the native
            FarmHash input format) instead of via a Python-object array that
            hash_bucket would re-convert — this double conversion was most
            of the 8 ms/4096-row encode (RESULTS.md serving/encode)."""
            from rectpu.features.schema import is_string_column

            if is_string_column(name):
                try:
                    return np.asarray(value, dtype=np.bytes_).reshape(-1)
                except (UnicodeEncodeError, ValueError):
                    pass  # non-ASCII: fall through to the object array
            return np.asarray(value).reshape(-1)

        n = len(np.asarray(features["user_id"]).reshape(-1))
        columns = {}
        for key in SERVING_REQUIRED:
            columns[key] = to_column(features[key], key)
        for g in GENRE:
            columns[g] = (
                np.asarray(features[g]).reshape(-1)
                if g in features
                else np.zeros(n, dtype=np.int64)
            )
        for f in self.feature_set.numeric:
            if f.name not in columns:
                columns[f.name] = np.asarray(features[f.name]).reshape(-1)
        batch = self.feature_set.encode(columns)
        batch = {k: np.asarray(v) for k, v in batch.items()}
        if self.row_perm is not None:
            # match training's frequency-aware row relabeling (placement.py)
            batch["cat_ids"] = self.row_perm[batch["cat_ids"]]
        if "num_vals" not in batch:
            batch["num_vals"] = np.zeros((n, 0), np.float32)
        return batch

    def apply_encoded_async(self, batch: dict, n: int):
        """Dispatch the jitted apply on an encoded batch of n real rows and
        return the UN-TRANSFERRED device arrays (JAX dispatch is async: this
        returns as soon as the computation is enqueued). Pair with
        ``finalize`` — callers that pipeline (serve.batching) dispatch batch
        k+1 before batch k's device->host transfer completes."""
        out = self._apply_padded(batch, n)
        return out, n

    def finalize(self, out, n: int) -> dict:
        """Block for ``apply_encoded_async``'s result and slice off padding."""
        return {k: np.asarray(v)[:n] for k, v in jax.device_get(out).items()}

    def apply_encoded(self, batch: dict, n: int) -> dict:
        """Run the jitted apply on an encoded batch of n real rows,
        bucket-padding and slicing the padding back off the outputs."""
        return self.finalize(self._apply_padded(batch, n), n)

    def _apply_padded(self, batch: dict, n: int):
        b = self._bucket(n)
        if b > n:
            batch = {
                k: np.concatenate([v, np.zeros((b - n,) + v.shape[1:], v.dtype)])
                for k, v in batch.items()
            }
        return self._apply(self.params, batch)

    def predict(self, features: dict) -> dict:
        """Predict from the reference serving schema (raw feature arrays)."""
        batch = self.encode_request(features)
        return self.apply_encoded(batch, batch["cat_ids"].shape[0])


def load_model(export_dir: str | Path, use_serialized: bool = False) -> ServingModel:
    """Rebuild a ServingModel from an export directory.

    ``use_serialized=True`` executes the ``apply.jaxexport`` StableHLO graph
    instead of retracing the Python model — the artifact is self-contained,
    so this path works without the model class's compute code (SavedModel
    parity) and skips Python retracing at startup."""
    export_dir = Path(export_dir)
    meta = json.loads((export_dir / "model.json").read_text())
    flat = _load_flat_npz(export_dir / "arrays.npz")
    params = _rebuild(meta["template"], flat)
    tc = meta["tower_config"]
    feature_set = ml_100k_feature_set(numeric=tuple(meta.get("numeric_features", ())))
    cfg = TowerConfig(
        feature_set=feature_set,
        embedding_size=tc["embedding_size"],
        hidden_units=tuple(tc["hidden_units"]),
        activation=tc["activation"],
        dropout=tc["dropout"],
        embedding_impl=tc.get("embedding_impl", "auto"),
        fm_impl=tc.get("fm_impl", "auto"),
        compute_dtype=tc.get("compute_dtype"),
        table_padding=tc.get("table_padding", 128),
        fuse_linear_lookup=tc.get("fuse_linear_lookup", True),
        packed_linear=tc.get("packed_linear", False),
    )
    model_cls = MODEL_REGISTRY[meta["model"]]
    kwargs = meta.get("model_kwargs", {})
    model = model_cls(cfg, **kwargs) if kwargs else model_cls(cfg)
    apply_fn = None
    if meta.get("table_quant") == "int8":
        # int8-quantized artifact (serve/quant.py): the table leaf is
        # {"q", "s"}; predictions must go through the dequantizing gather
        if use_serialized:
            raise ValueError(
                "quantized exports carry no serialized graph (it was traced "
                "over fp32 params); load without use_serialized"
            )
        from rectpu.serve.quant import make_quantized_apply

        apply_fn = make_quantized_apply(model)
    elif use_serialized:
        blob_path = export_dir / "apply.jaxexport"
        if not (meta.get("serialized_apply") and blob_path.exists()):
            raise FileNotFoundError(f"no serialized apply graph in {export_dir}")
        from jax import export as jax_export

        exp = jax_export.deserialize(blob_path.read_bytes())
        apply_fn = jax.jit(exp.call)
    row_perm = None
    if meta.get("row_placement"):
        row_perm = np.load(export_dir / "row_perm.npy")
    return ServingModel(model, params, feature_set, apply_fn=apply_fn,
                        row_perm=row_perm)


def make_exporter(model, job_dir: str | Path, exports_to_keep: int = 5,
                  row_perm=None, mode: str = "latest", compare_metric: str = "auc"):
    """An exporter callback for the Trainer.

    ``mode="latest"`` exports after every eval (LatestExporter parity,
    ref trainers/conf_utils.py:20-24). ``mode="best"`` is tf.estimator's
    BestExporter: export only when the eval metric improves, tracked across
    restarts via ``<job_dir>/best_metric.json`` — for ``average_loss`` lower
    is better, for everything else (auc, accuracy, ...) higher is better."""
    if not isinstance(model.cfg.activation, str):
        # fail at construction, not hours later when the first export-cadence
        # callback fires mid-training (export_model re-checks for direct calls)
        raise ValueError(
            "export requires a string activation (got a callable); register "
            "it by name in models.base.get_activation"
        )
    if mode not in ("latest", "best"):
        raise ValueError(f"unknown exporter mode {mode!r}")

    best_path = Path(job_dir) / "best_metric.json"
    lower_is_better = compare_metric in ("average_loss", "loss")

    def exporter(params, step, metrics=None):
        if mode == "best":
            if not metrics or compare_metric not in metrics:
                logger.warning(
                    "best exporter: no %r in eval metrics, skipping export",
                    compare_metric)
                return
            value = float(metrics[compare_metric])
            prev = None
            if best_path.exists():
                prev = json.loads(best_path.read_text()).get(compare_metric)
            improved = (
                prev is None
                or (value < prev if lower_is_better else value > prev)
            )
            if not improved:
                logger.info("best exporter: %s=%.6f did not improve on %.6f, "
                            "skipping export", compare_metric, value, prev)
                return
            logger.info("best exporter: %s improved %s -> %.6f, exporting",
                        compare_metric, "None" if prev is None else f"{prev:.6f}",
                        value)
        export_model(params, model, job_dir, step, exports_to_keep,
                     row_perm=row_perm)
        if mode == "best":
            tmp = best_path.with_suffix(".tmp")
            tmp.write_text(json.dumps({compare_metric: value, "step": step}))
            tmp.replace(best_path)

    return exporter
