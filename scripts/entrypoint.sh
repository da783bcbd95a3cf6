#!/usr/bin/env bash
# Serving entrypoint (reference: entrypoint.sh:10-44 — pull model from the
# artifact bus before starting; verify weights exist; exit 1 otherwise)
set -euo pipefail

MODEL_DIR=${MODEL_DIR:-/app/model}
INDEX_DIR=${INDEX_DIR:-}

if [[ -n "${GCS_MODEL_PATH:-}" ]]; then
  echo "pulling model from ${GCS_MODEL_PATH}"
  if command -v gsutil >/dev/null; then
    gsutil -m cp -r "${GCS_MODEL_PATH}/*" "${MODEL_DIR}/"
  else
    echo "gsutil unavailable; expecting a mounted model at ${MODEL_DIR}" >&2
  fi
fi

if [[ ! -f "${MODEL_DIR}/params.msgpack" ]]; then
  echo "FATAL: no model weights at ${MODEL_DIR}/params.msgpack" >&2
  exit 1
fi

ARGS=(serve --model "${MODEL_DIR}")
if [[ -n "${INDEX_DIR}" ]]; then
  ARGS+=(--index "${INDEX_DIR}")
fi
exec python -m sskd_tpu.cli.main "${ARGS[@]}"
