"""True multi-process distributed training test (SURVEY.md §4: 'multi-process
CPU tests'): 2 OS processes, jax.distributed + Gloo, real Trainer. The
2-process run must reproduce the single-process run's metrics and parameters
(batch-order permutations within a step don't change a mean-reduced
gradient; dropout is off)."""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "mp_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(nproc, data_dir, tmp_path, model_shards=1, flat=False,
         ep_mode="2d", comm_compress="none", family="deep_fm", fast=False):
    out = (tmp_path /
           f"out_np{nproc}_m{model_shards}_f{int(flat)}_{ep_mode}_"
           f"{comm_compress}_{family}_fs{int(fast)}.json")
    coordinator = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), coordinator,
             str(data_dir), str(out), str(model_shards), str(int(flat)),
             ep_mode, comm_compress, family, str(int(fast))],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(WORKER.parent.parent),
        )
        for pid in range(nproc)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-2000:]}"
    return json.loads(out.read_text())


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_training_matches_single(tmp_path):
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)

    single = _run(1, data_dir, tmp_path)
    multi = _run(2, data_dir, tmp_path)

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=1e-4, atol=1e-5), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_ep_table_sharding(tmp_path):
    """EP across OS processes: the embedding table row-sharded over a 'model'
    axis that SPANS processes (cross-process reduce_scatter in the lookup)."""
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)

    single = _run(1, data_dir, tmp_path)
    multi = _run(2, data_dir, tmp_path, model_shards=2)

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=1e-4, atol=1e-5), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_flat_ep(tmp_path):
    """flat_layout over the lane-packed 2D EP exchange with the 'model' axis
    spanning OS processes (cross-process flat reduce_scatter)."""
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)

    single = _run(1, data_dir, tmp_path, flat=True)
    multi = _run(2, data_dir, tmp_path, model_shards=2, flat=True)

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=1e-4, atol=1e-5), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_dedup_ep(tmp_path):
    """Dedup all_to_all EP exchange with the 'model' axis spanning OS
    processes (cross-process unique-row all_to_all) — exact mode must
    reproduce single-process results."""
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)

    single = _run(1, data_dir, tmp_path)
    multi = _run(2, data_dir, tmp_path, model_shards=2, ep_mode="dedup")

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=1e-4, atol=1e-5), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_dedup_ep_int8(tmp_path):
    """int8-compressed dedup exchange across OS processes: lossy by design,
    so the 200-step run must LAND NEAR (not equal) the single-process run."""
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)

    single = _run(1, data_dir, tmp_path)
    multi = _run(2, data_dir, tmp_path, model_shards=2, ep_mode="dedup",
                 comm_compress="int8")

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=0.05), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=0.05)


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_ep_dlrm(tmp_path):
    """A beyond-reference family (DLRM) with the table row-sharded ACROSS OS
    processes: the shape-keyed sharding rules generalize cross-process."""
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)

    single = _run(1, data_dir, tmp_path, family="dlrm")
    multi = _run(2, data_dir, tmp_path, model_shards=2, family="dlrm")

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=1e-4, atol=1e-5), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=1e-5)


@pytest.mark.skipif(sys.platform != "linux", reason="Gloo CPU collectives")
def test_two_process_sparse_ep_fast_step_matches_single(tmp_path):
    """The sparse lazy-Adam EP fast step across 2 REAL OS processes (Gloo):
    the deduped (row, grad) all_to_all + per-shard update reproduce the
    single-process run (round-3 flagship composition, cross-process)."""
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path / "data"
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=13)

    single = _run(1, data_dir, tmp_path, model_shards=1, flat=True,
                  ep_mode="dedup", fast=True)
    multi = _run(2, data_dir, tmp_path, model_shards=2, flat=True,
                 ep_mode="dedup", fast=True)

    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=1e-5, atol=1e-6), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=1e-5)
