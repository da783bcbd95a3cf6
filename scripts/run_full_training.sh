#!/usr/bin/env bash
# Full production training run on a TPU host (reference analog:
# scripts/run_full_training.sh — Vertex L4 custom job with 50k samples,
# 3 epochs, bs 32, stage 3; here a direct TPU-host invocation of the same
# recipe; submit infra/tpu_training_job.yaml for the cluster version).
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${DATASET:-msmarco}
MAX_SAMPLES=${MAX_SAMPLES:-50000}
EPOCHS=${EPOCHS:-3}
BATCH=${BATCH:-32}
STAGE=${STAGE:-3}
OUT=${OUT:-artifacts/models/kd_student_production}
DATA_DIR=${DATA_DIR:-data}
DP=${DP:-1}

echo "=== full KD training: $DATASET n=$MAX_SAMPLES stage=$STAGE epochs=$EPOCHS dp=$DP ==="
python -m sskd_tpu.cli.main train \
  --data-dir "$DATA_DIR" --dataset "$DATASET" \
  --max-samples "$MAX_SAMPLES" --stage "$STAGE" --epochs "$EPOCHS" \
  --batch-size "$BATCH" --data-parallel "$DP" \
  --output-dir "$OUT"

echo "=== model-quality gates ==="
SSKD_PRODUCTION_MODEL="$OUT/best_model" REQUIRE_MODEL=1 \
  python -m pytest tests/test_model_validation.py -q || {
    echo "model validation gates FAILED" >&2; exit 1; }

echo "=== register ==="
python scripts/model_registry.py register --name kd_student \
  --model-dir "$OUT/best_model" --latency-probe
python scripts/model_registry.py latest --out artifacts/latest.json

if [[ -n "${GCS_OUTPUT:-}" ]] && command -v gsutil >/dev/null; then
  echo "=== upload to artifact bus ==="
  gsutil -m cp -r "$OUT/best_model" "$GCS_OUTPUT/"
  gsutil cp artifacts/latest.json "$GCS_OUTPUT/latest.json"
fi
echo "done: $OUT"
