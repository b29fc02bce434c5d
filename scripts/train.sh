#!/usr/bin/env bash
# Multi-host TPU training launch — the replacement for the reference's
# `gcloud ml-engine jobs submit training` flow (/root/reference/scripts/
# mle_train.sh, distributed.md:72-82). On a TPU pod slice, run this script on
# every host (e.g. via `gcloud compute tpus tpu-vm ssh ... --worker=all`);
# JAX's TPU runtime discovers the slice topology automatically
# (jax.distributed.initialize needs no explicit coordinator on TPU VMs).
set -euo pipefail

MODEL="${MODEL:-deep_fm}"                 # linear | deep | linear_deep | deep_fm | dlrm | dcn | xdeep_fm | autoint
JOB_DIR="${JOB_DIR:-checkpoints/${MODEL}}"
TRAIN_CSV="${TRAIN_CSV:-data/ml-100k/train.csv}"
TEST_CSV="${TEST_CSV:-data/ml-100k/test.csv}"
TRAIN_STEPS="${TRAIN_STEPS:-100000}"
BATCH_SIZE="${BATCH_SIZE:-8192}"
DATA_SHARDS="${DATA_SHARDS:-$(python -c 'import jax; print(len(jax.devices()))')}"
MODEL_SHARDS="${MODEL_SHARDS:-1}"

# build the native input pipeline if missing (idempotent)
python -m rectpu.io.native.build >/dev/null 2>&1 || true

exec python -m "rectpu.trainers.${MODEL}" \
  --train-csv "${TRAIN_CSV}" \
  --test-csv "${TEST_CSV}" \
  --job-dir "${JOB_DIR}" \
  --train-steps "${TRAIN_STEPS}" \
  --batch-size "${BATCH_SIZE}" \
  --num-data-shards "${DATA_SHARDS}" \
  --num-model-shards "${MODEL_SHARDS}" \
  --compute-dtype bfloat16 \
  "$@"
