"""Self-built sharded checkpointing with keep-N rotation and exact resume.

Replaces TF's Saver + RunConfig(save_checkpoints_secs=60, keep_checkpoint_max=5)
(/root/reference/trainers/conf_utils.py:6-10). A checkpoint is a directory
    <job_dir>/ckpt-<step>/
        arrays.npz   # every leaf of {params, opt_state, metrics...} by path
        meta.json    # step, rng key, data-iterator state, tree structure
written atomically (tmp dir + rename) so a crashed write never corrupts the
latest checkpoint, then rotated to the newest ``keep`` checkpoints. Restore
returns device-ready pytrees with the original structure; resume is exact
(params + optimizer state + RNG + input-pipeline position).
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rectpu.utils.logging import get_logger

logger = get_logger(__name__)

_SEP = "/"


# npz cannot roundtrip ml_dtypes (bf16 loads back as raw void "|V2"), so
# non-numpy-native dtypes are stored as uint16 bit patterns under a tagged key
_BF16_TAG = "__bf16__"


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = _SEP.join(_path_elem_str(p) for p in path)
        arr = np.asarray(leaf)
        if arr.dtype == jnp.bfloat16:
            key += _BF16_TAG
            arr = arr.view(np.uint16)
        flat[key] = arr
    return flat


def _load_flat_npz(path) -> dict:
    """Read an npz written from ``_flatten`` output, undoing the bf16 uint16
    tagging. Shared by checkpoint restore and export loading (a bf16 param
    leaf — --table-dtype/--table-store bfloat16 — rides exports too)."""
    with np.load(path) as z:
        flat = {}
        for k in z.files:
            if k.endswith(_BF16_TAG):
                flat[k[: -len(_BF16_TAG)]] = z[k].view(jnp.bfloat16)
            else:
                flat[k] = z[k]
    return flat


def _path_elem_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def _treedef_template(tree):
    """A JSON-serializable skeleton of the pytree (dicts/lists/leaf markers)."""
    if isinstance(tree, dict):
        return {k: _treedef_template(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_treedef_template(v) for v in tree]
    return None  # leaf


def _rebuild(template, flat: dict, prefix: str = ""):
    if isinstance(template, dict):
        return {k: _rebuild(v, flat, prefix + k + _SEP) for k, v in template.items()}
    if isinstance(template, list):
        return [_rebuild(v, flat, prefix + str(i) + _SEP) for i, v in enumerate(template)]
    return flat[prefix[:-1]]


class Checkpointer:
    """Atomic keep-N checkpointer with optional async writes.

    With ``async_write=True`` the device->host transfer happens synchronously
    (cheap) but serialization + disk IO run on a background thread, so the
    training loop resumes immediately; the next save (or ``wait()``/restore)
    joins the previous write first, preserving the keep-N invariants.
    """

    def __init__(self, job_dir: str | Path, keep: int = 5, prefix: str = "ckpt",
                 async_write: bool = False):
        self.job_dir = Path(job_dir)
        self.keep = keep
        self.prefix = prefix
        self.async_write = async_write
        self._pending = None
        self._executor = None
        self.job_dir.mkdir(parents=True, exist_ok=True)

    def wait(self) -> None:
        """Block until any in-flight async save has committed."""
        if self._pending is not None:
            self._pending.result()
            self._pending = None

    # -- paths ---------------------------------------------------------------

    def _ckpt_dir(self, step: int) -> Path:
        return self.job_dir / f"{self.prefix}-{step}"

    def all_steps(self) -> list[int]:
        steps = []
        for p in self.job_dir.glob(f"{self.prefix}-*"):
            if p.is_dir() and (p / "meta.json").exists():
                try:
                    steps.append(int(p.name.rsplit("-", 1)[1]))
                except ValueError:
                    continue
        return sorted(steps)

    def latest_step(self) -> int | None:
        steps = self.all_steps()
        return steps[-1] if steps else None

    # -- save/restore ----------------------------------------------------------

    def save(self, step: int, tree: dict, extra_meta: dict | None = None) -> Path:
        """Write a checkpoint of ``tree`` (any pytree of arrays).

        Synchronous by default; with async_write the host copy is taken now
        and the disk write completes in the background (see class docstring).
        """
        self.wait()
        tree = jax.device_get(tree)
        if self.async_write:
            import concurrent.futures

            if self._executor is None:
                self._executor = concurrent.futures.ThreadPoolExecutor(
                    max_workers=1, thread_name_prefix="rectpu-ckpt"
                )
            final = self._ckpt_dir(step)
            self._pending = self._executor.submit(self._write, step, tree, extra_meta)
            return final
        return self._write(step, tree, extra_meta)

    def _write(self, step: int, tree: dict, extra_meta: dict | None) -> Path:
        final = self._ckpt_dir(step)
        tmp = self.job_dir / f".tmp-{self.prefix}-{step}-{time.time_ns()}"
        tmp.mkdir(parents=True)
        try:
            flat = _flatten(tree)
            np.savez(tmp / "arrays.npz", **flat)
            meta = {
                "step": step,
                "template": _treedef_template(tree),
                "time": time.time(),
            }
            meta.update(extra_meta or {})
            (tmp / "meta.json").write_text(json.dumps(meta))
            if final.exists():
                shutil.rmtree(final)
            tmp.rename(final)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        self._rotate()
        logger.debug("checkpoint saved: %s", final)
        return final

    def restore(self, step: int | None = None) -> tuple[dict, dict] | None:
        """Load (tree, meta) for ``step`` (default latest). None if absent."""
        self.wait()
        if step is None:
            step = self.latest_step()
            if step is None:
                return None
        d = self._ckpt_dir(step)
        meta = json.loads((d / "meta.json").read_text())
        flat = _load_flat_npz(d / "arrays.npz")
        tree = _rebuild(meta["template"], flat)
        return tree, meta

    def _rotate(self) -> None:
        steps = self.all_steps()
        for s in steps[: -self.keep] if self.keep > 0 else []:
            shutil.rmtree(self._ckpt_dir(s), ignore_errors=True)
