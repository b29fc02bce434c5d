"""Device-mesh construction and multi-host runtime bootstrap.

Replaces the reference's TF_CONFIG-driven parameter-server distribution
(/root/reference/distributed.md:58-82, scripts/mle_train.sh) with a GSPMD
mesh: axes ('data', 'model') — batch sharded over 'data' (synchronous DP,
gradients psum'd over ICI) and embedding-table rows sharded over 'model'
(EP; see rectpu.parallel.embedding_ep). Multi-host runs bootstrap with
``jax.distributed.initialize`` instead of TF_CONFIG.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_data: int, num_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    need = num_data * num_model
    if len(devices) < need:
        raise ValueError(
            f"mesh ({num_data}x{num_model}) needs {need} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(num_data, num_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def distributed_init(coordinator_address: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host bootstrap (replaces TF_CONFIG). No-op if single-process or
    already initialized."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
