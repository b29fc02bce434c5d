"""Worker for the multi-process distributed test (tests/test_multiprocess.py).

Runs a short DP DeepFM training via the REAL Trainer under
jax.distributed.initialize with N processes on CPU, then (process 0) dumps
the final eval metrics + a param digest for the launcher to compare against
a single-process run. This exercises the genuine multi-host code paths:
per-process data sharding, host-local -> global array assembly, GSPMD grad
psum across processes, proc-0-only checkpoint/export, restore barrier.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coordinator = sys.argv[3]
    data_dir = sys.argv[4]
    out_path = sys.argv[5]
    model_shards = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    flat = len(sys.argv) > 7 and sys.argv[7] == "1"
    ep_mode = sys.argv[8] if len(sys.argv) > 8 else "2d"
    comm_compress = sys.argv[9] if len(sys.argv) > 9 else "none"
    comm_compress = None if comm_compress == "none" else comm_compress
    family = sys.argv[10] if len(sys.argv) > 10 else "deep_fm"
    fast = len(sys.argv) > 11 and sys.argv[11] == "1"

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=nproc, process_id=pid
        )

    import numpy as np

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.loader import CsvDataset
    from rectpu.models import MODEL_REGISTRY, TowerConfig
    from rectpu.parallel import ParallelPlan
    from rectpu.train.loop import TrainConfig, Trainer

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      packed_linear=flat, flat_layout=flat)
    model = MODEL_REGISTRY[family](cfg)
    train_ds = CsvDataset(os.path.join(data_dir, "train.csv"), fs)
    eval_ds = CsvDataset(os.path.join(data_dir, "test.csv"), fs)

    plan = ParallelPlan.create(
        num_data_shards=jax.device_count() // model_shards,
        num_model_shards=model_shards,
        table_rows=cfg.padded_buckets,
        ep_mode=ep_mode,
        ep_comm_compress=comm_compress,
    )
    tc = TrainConfig(batch_size=64, train_steps=200, steps_per_loop=50,
                     save_checkpoints_steps=10**6, async_checkpoint=False)
    fast_step = None
    if fast:
        from rectpu.train.fast_step import make_sparse_step

        fast_step = make_sparse_step(model, learning_rate=0.001, plan=plan)
    trainer = Trainer(
        model, model.default_optimizer(), train_ds, eval_ds,
        os.path.join(
            data_dir,
            f"job_np{nproc}_m{model_shards}_f{int(flat)}_{ep_mode}_"
            f"{comm_compress}_{family}_fs{int(fast)}",
        ),
        tc, plan=plan, fast_step=fast_step,
    )
    metrics = trainer.train_and_evaluate(restore=False)

    params = jax.device_get(trainer._final_params)
    digest = float(
        sum(np.abs(np.asarray(leaf)).sum() for leaf in jax.tree.leaves(params))
    )
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"metrics": metrics, "param_digest": digest}, f)
    if nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
