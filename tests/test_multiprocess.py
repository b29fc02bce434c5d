"""True multi-process distributed training tests (SURVEY.md §4: 'multi-process
CPU tests'): real OS processes, jax.distributed + Gloo, real Trainer.

Each process owns exactly ONE XLA device (mp_worker --local-devices 1), so a
model axis of size nproc genuinely spans processes — EP table shards are NOT
addressable from the peer, exactly like real multi-host TPU. The n-process
run must reproduce the single-process run's metrics and parameters
(batch-order permutations within a step don't change a mean-reduced
gradient). Dropout-on cases certify the production function: the hash masks
key on the global element index, so they are process-count-invariant too.
"""

import json
import signal
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "mp_worker.py"

pytestmark = pytest.mark.skipif(sys.platform != "linux",
                                reason="Gloo CPU collectives")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(nproc, data_dir, out, job_dir, **opts):
    coordinator = f"127.0.0.1:{_free_port()}"
    argv_common = ["--nproc", str(nproc), "--coordinator", coordinator,
                   "--data-dir", str(data_dir), "--out", str(out),
                   "--job-dir", str(job_dir)]
    for k, v in opts.items():
        flag = f"--{k.replace('_', '-')}"
        if v is True:
            argv_common.append(flag)
        elif v is not False and v is not None:
            argv_common += [flag, str(v)]
    return [
        subprocess.Popen(
            [sys.executable, str(WORKER), "--pid", str(pid)] + argv_common,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=str(WORKER.parent.parent),
        )
        for pid in range(nproc)
    ]


def _join(procs, timeout=420):
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=timeout)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-2000:]}"
    return logs


def _run(nproc, data_dir, tmp_path, tag=None, **opts):
    tag = tag or f"np{nproc}_" + "_".join(f"{k}{v}" for k, v in sorted(opts.items()))
    tag = tag.replace("/", "_")[:120]
    out = tmp_path / f"out_{tag}.json"
    job_dir = tmp_path / f"job_{tag}"
    _join(_launch(nproc, data_dir, out, job_dir, **opts))
    return json.loads(out.read_text())


def _assert_matches(single, multi, rtol=1e-4, atol=1e-5, digest_rtol=1e-5):
    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=rtol, atol=atol), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"],
                      rtol=digest_rtol)


@pytest.fixture(scope="module")
def mp_data(tmp_path_factory):
    from rectpu.data.synthetic import write_synthetic_dataset

    data_dir = tmp_path_factory.mktemp("mp_data")
    write_synthetic_dataset(data_dir, train_rows=2000, test_rows=512, seed=11)
    return data_dir


def test_two_process_training_matches_single(mp_data, tmp_path):
    single = _run(1, mp_data, tmp_path)
    multi = _run(2, mp_data, tmp_path)
    _assert_matches(single, multi)


def test_two_process_ep_table_sharding(mp_data, tmp_path):
    """EP across OS processes: the embedding table row-sharded over a 'model'
    axis that SPANS processes — each process holds ONE shard the other cannot
    address (cross-process reduce_scatter in the lookup, collective allgather
    on the checkpoint path). Dropout is ON (production function)."""
    single = _run(1, mp_data, tmp_path, dropout=0.1)
    multi = _run(2, mp_data, tmp_path, model_shards=2, dropout=0.1)
    _assert_matches(single, multi)


def test_two_process_flat_ep(mp_data, tmp_path):
    """flat_layout over the lane-packed 2D EP exchange with the 'model' axis
    spanning OS processes (cross-process flat reduce_scatter)."""
    single = _run(1, mp_data, tmp_path, flat=True)
    multi = _run(2, mp_data, tmp_path, model_shards=2, flat=True)
    _assert_matches(single, multi)


def test_two_process_dedup_ep(mp_data, tmp_path):
    """Dedup all_to_all EP exchange with the 'model' axis spanning OS
    processes (cross-process unique-row all_to_all) — exact mode must
    reproduce single-process results."""
    single = _run(1, mp_data, tmp_path)
    multi = _run(2, mp_data, tmp_path, model_shards=2, ep_mode="dedup")
    _assert_matches(single, multi)


def test_two_process_dedup_ep_int8(mp_data, tmp_path):
    """int8-compressed dedup exchange across OS processes: lossy by design,
    so the 200-step run must LAND NEAR (not equal) the single-process run."""
    single = _run(1, mp_data, tmp_path)
    multi = _run(2, mp_data, tmp_path, model_shards=2, ep_mode="dedup",
                 comm_compress="int8")
    assert multi["metrics"]["count"] == 512
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(single["metrics"][key], multi["metrics"][key],
                          rtol=0.05), (key, single, multi)
    assert np.isclose(single["param_digest"], multi["param_digest"], rtol=0.05)


def test_two_process_ep_dlrm(mp_data, tmp_path):
    """A beyond-reference family (DLRM) with the table row-sharded ACROSS OS
    processes: the shape-keyed sharding rules generalize cross-process."""
    single = _run(1, mp_data, tmp_path, family="dlrm")
    multi = _run(2, mp_data, tmp_path, model_shards=2, family="dlrm")
    _assert_matches(single, multi)


def test_two_process_sparse_ep_fast_step_matches_single(mp_data, tmp_path):
    """The sparse lazy-Adam EP fast step across 2 REAL OS processes (Gloo):
    the deduped (row, grad) all_to_all + per-shard update reproduce the
    single-process run (round-3 flagship composition, cross-process)."""
    single = _run(1, mp_data, tmp_path, model_shards=1, flat=True,
                  ep_mode="dedup", fast=True)
    multi = _run(2, mp_data, tmp_path, model_shards=2, flat=True,
                 ep_mode="dedup", fast=True)
    _assert_matches(single, multi, rtol=1e-5, atol=1e-6)


def test_two_process_device_resident_data(mp_data, tmp_path):
    """Device-resident training data under multi-process EP (round-4 VERDICT
    item 1): the dataset is replicated from identical host copies, each
    process ships only its local [B/nproc] index rows, and the run equals the
    host-staged multi-process run bit-for-bit. eval_auc=exact rides along:
    the probability gather is collective across the EP processes."""
    host = _run(2, mp_data, tmp_path, model_shards=2, ep_mode="dedup",
                data_placement="host", eval_auc="exact")
    dev = _run(2, mp_data, tmp_path, model_shards=2, ep_mode="dedup",
               data_placement="device", eval_auc="exact")
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(host["metrics"][key], dev["metrics"][key],
                          rtol=1e-6, atol=1e-7), (key, host, dev)
    assert host["param_digest"] == dev["param_digest"]


def test_four_process_2x2_mesh(mp_data, tmp_path):
    """Round-4 VERDICT item 9: a 2x2 (data x model) mesh over FOUR OS
    processes — both axes >1 and both spanning processes (DP psum and the EP
    exchange each cross process boundaries) — reproduces single-process
    results, sparse-EP fast step included."""
    single = _run(1, mp_data, tmp_path, flat=True, ep_mode="dedup", fast=True)
    multi = _run(4, mp_data, tmp_path, model_shards=2, flat=True,
                 ep_mode="dedup", fast=True)
    _assert_matches(single, multi, rtol=1e-5, atol=1e-6)


def test_two_process_ep_kill_restore(mp_data, tmp_path):
    """Round-4 VERDICT item 4: mid-run checkpoint -> SIGKILL both workers ->
    relaunch with --restore under multi-process EP (shards spanning
    processes, checkpoint cadence ON, dropout ON). The resumed run must
    continue BITWISE into the same final parameters as an uninterrupted run:
    restore rebuilds params + optimizer state + RNG + data position exactly,
    and the collective allgather save works with non-addressable shards."""
    opts = dict(model_shards=2, ep_mode="dedup", dropout=0.1,
                train_steps=200, steps_per_loop=20, save_steps=40)

    ref = _run(2, mp_data, tmp_path, tag="uninterrupted", **opts)

    out = tmp_path / "out_killed.json"
    job_dir = tmp_path / "job_killed"
    procs = _launch(2, mp_data, out, job_dir, **opts)
    # wait for a mid-run checkpoint to land (atomic rename => complete)
    deadline = time.time() + 360
    while time.time() < deadline:
        done = [d for d in job_dir.glob("ckpt-*") if (d / "meta.json").exists()
                and int(d.name.split("-")[1]) < opts["train_steps"]]
        if done:
            break
        if any(p.poll() is not None for p in procs):
            break  # a worker exited early: fail below with its log
        time.sleep(0.5)
    else:
        for p in procs:
            p.kill()
        _join(procs)  # surface logs
        pytest.fail("no mid-run checkpoint appeared")
    for p in procs:
        p.send_signal(signal.SIGKILL)
    for p in procs:
        p.wait(timeout=60)
        p.stdout.close()
    saved = sorted(int(d.name.split("-")[1]) for d in job_dir.glob("ckpt-*")
                   if (d / "meta.json").exists())
    assert saved and saved[0] < opts["train_steps"], saved

    _join(_launch(2, mp_data, out, job_dir, restore=True, **opts))
    resumed = json.loads(out.read_text())
    assert resumed["param_digest"] == ref["param_digest"], (
        f"resume after kill diverged: {resumed['param_digest']} vs "
        f"{ref['param_digest']} (ckpts at {saved})")
    for key in ("auc", "average_loss", "accuracy"):
        assert np.isclose(ref["metrics"][key], resumed["metrics"][key],
                          rtol=1e-7), (key, ref, resumed)
