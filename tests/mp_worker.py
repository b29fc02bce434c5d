"""Worker for the multi-process distributed tests (tests/test_multiprocess.py).

Runs a short DeepFM-family training via the REAL Trainer under
jax.distributed.initialize with N OS processes on CPU, then (process 0)
dumps the final eval metrics + a param digest for the launcher to compare
against a single-process run. This exercises the genuine multi-host code
paths: per-process data sharding, host-local -> global array assembly,
GSPMD grad psum across processes, the collective EP-shard allgather on the
checkpoint path, proc-0-only disk ownership, restore barrier.

``--local-devices 1`` (the default) gives each process exactly ONE XLA
device, so a model axis of size nproc genuinely SPANS processes: EP table
shards live on devices the other process cannot address, which is the
configuration real multi-host TPUs present. (With >1 local device the
mesh used to fold both EP shards into every process — the old tests
certified less than they claimed.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--coordinator", required=True)
    p.add_argument("--data-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--job-dir", required=True)
    p.add_argument("--model-shards", type=int, default=1)
    p.add_argument("--flat", action="store_true")
    p.add_argument("--ep-mode", default="2d")
    p.add_argument("--comm-compress", default="none")
    p.add_argument("--family", default="deep_fm")
    p.add_argument("--fast", action="store_true")
    p.add_argument("--local-devices", type=int, default=1)
    p.add_argument("--train-steps", type=int, default=200)
    p.add_argument("--steps-per-loop", type=int, default=50)
    p.add_argument("--save-steps", type=int, default=10**6)
    p.add_argument("--restore", action="store_true")
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--data-placement", default="host")
    p.add_argument("--eval-auc", default="streaming")
    return p.parse_args(argv)


def main():
    args = parse_args()
    comm_compress = None if args.comm_compress == "none" else args.comm_compress

    # REPLACE (not append) any inherited visible-device override so each
    # process gets exactly --local-devices XLA devices
    flags = [
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    os.environ["XLA_FLAGS"] = " ".join(
        [f"--xla_force_host_platform_device_count={args.local_devices}"] + flags
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator, num_processes=args.nproc,
            process_id=args.pid,
        )

    import numpy as np

    from rectpu.features.schema import ml_100k_feature_set
    from rectpu.io.loader import CsvDataset
    from rectpu.models import MODEL_REGISTRY, TowerConfig
    from rectpu.parallel import ParallelPlan
    from rectpu.train.loop import TrainConfig, Trainer

    fs = ml_100k_feature_set()
    cfg = TowerConfig(feature_set=fs, embedding_size=4, hidden_units=(16, 16),
                      packed_linear=args.flat, flat_layout=args.flat,
                      dropout=args.dropout, dropout_impl="hash")
    model = MODEL_REGISTRY[args.family](cfg)
    train_ds = CsvDataset(os.path.join(args.data_dir, "train.csv"), fs)
    eval_ds = CsvDataset(os.path.join(args.data_dir, "test.csv"), fs)

    plan = ParallelPlan.create(
        num_data_shards=jax.device_count() // args.model_shards,
        num_model_shards=args.model_shards,
        table_rows=cfg.padded_buckets,
        ep_mode=args.ep_mode,
        ep_comm_compress=comm_compress,
    )
    tc = TrainConfig(batch_size=64, train_steps=args.train_steps,
                     steps_per_loop=args.steps_per_loop,
                     save_checkpoints_steps=args.save_steps,
                     async_checkpoint=False,
                     data_placement=args.data_placement,
                     eval_auc=args.eval_auc)
    fast_step = None
    if args.fast:
        from rectpu.train.fast_step import make_sparse_step

        fast_step = make_sparse_step(model, learning_rate=0.001, plan=plan)
    trainer = Trainer(
        model, model.default_optimizer(), train_ds, eval_ds, args.job_dir,
        tc, plan=plan, fast_step=fast_step,
    )
    metrics = trainer.train_and_evaluate(restore=args.restore)

    # EP shards may live on the peer process: gather collectively
    params = trainer._gather_for_save(trainer._final_params)
    digest = float(
        sum(np.abs(np.asarray(leaf)).sum() for leaf in jax.tree.leaves(params))
    )
    if args.pid == 0:
        with open(args.out, "w") as f:
            json.dump({"metrics": metrics, "param_digest": digest}, f)
    if args.nproc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
