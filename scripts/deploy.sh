#!/usr/bin/env bash
# Serve the newest export of a trained job — the replacement for the
# reference's ML-Engine model deployment (/root/reference/scripts/mle_deploy.sh:
# find latest exported SavedModel -> models/versions create). Here the newest
# export under ${JOB_DIR}/export/exporter is loaded behind a JSON HTTP
# endpoint (POST /predict, ML-Engine request/response shape).
set -euo pipefail

JOB_DIR="${JOB_DIR:-checkpoints/deep_fm}"
HOST="${HOST:-127.0.0.1}"
PORT="${PORT:-8080}"

LATEST=$(ls -d "${JOB_DIR}"/export/exporter/*/ 2>/dev/null | sort | tail -n 1 || true)
if [[ -z "${LATEST}" ]]; then
  echo "no export found under ${JOB_DIR}/export/exporter" >&2
  exit 1
fi
echo "serving ${LATEST} on http://${HOST}:${PORT}/predict" >&2
exec python -m rectpu.serve.server --export-dir "${LATEST}" --host "${HOST}" --port "${PORT}"
