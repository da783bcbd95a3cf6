#!/usr/bin/env bash
# Run the full KD training pipeline on an existing TPU VM and push the
# artifacts to the GCS bus. TPU-native analog of the reference's VM-based
# trainers (reference: scripts/run_training_on_gcp_vm.sh,
# run_training_us_east5.sh, run_training_gcp_cpu.sh — create VM, ship code,
# train, upload, delete).
#
# Usage:
#   PROJECT_ID=my-proj ZONE=us-central1-a BUCKET=gs://my-bucket \
#     ./scripts/gcp/run_training_on_tpu_vm.sh <tpu-vm-name>
# Env:
#   MAX_SAMPLES/EPOCHS/BATCH/STAGE  training recipe (default 50000/3/32/3)
#   DELETE_AFTER=1                  delete the TPU VM when done
set -euo pipefail
cd "$(dirname "$0")/../.."

PROJECT_ID=${PROJECT_ID:?set PROJECT_ID}
ZONE=${ZONE:?set ZONE}
BUCKET=${BUCKET:?set BUCKET (gs://...)}
NAME=${1:?usage: run_training_on_tpu_vm.sh <tpu-vm-name>}

MAX_SAMPLES=${MAX_SAMPLES:-50000}
EPOCHS=${EPOCHS:-3}
BATCH=${BATCH:-32}
STAGE=${STAGE:-3}
RUN_ID="kd_student_$(date +%Y%m%d_%H%M%S)"

SSH=(gcloud compute tpus tpu-vm ssh "$NAME" --project "$PROJECT_ID" --zone "$ZONE" --command)

echo "=== [1/4] ship code ==="
BUCKET="$BUCKET" scripts/gcp/upload_code_to_gcs.sh

echo "=== [2/4] bootstrap VM ==="
"${SSH[@]}" "
  set -e
  sudo mkdir -p /opt/sskd && sudo chown \$(whoami) /opt/sskd && cd /opt/sskd
  gsutil cp $BUCKET/code/latest.tar.gz . && tar xzf latest.tar.gz
  pip install -q -e '.[tpu]' 2>/dev/null || pip install -q -e .
"

echo "=== [3/4] train (stage $STAGE, $MAX_SAMPLES samples, $EPOCHS epochs) ==="
"${SSH[@]}" "
  set -e
  cd /opt/sskd
  python -m sskd_tpu.cli.main train \
    --data-dir data --dataset msmarco \
    --max-samples $MAX_SAMPLES --stage $STAGE --epochs $EPOCHS \
    --batch-size $BATCH \
    --output-dir artifacts/models/$RUN_ID
  SSKD_PRODUCTION_MODEL=artifacts/models/$RUN_ID/best_model REQUIRE_MODEL=1 \
    python -m pytest tests/test_model_validation.py -q
  gsutil -m cp -r artifacts/models/$RUN_ID $BUCKET/models/
"

echo "=== [4/4] register on the artifact bus ==="
python scripts/model_registry.py register \
  --name kd_student --version "$RUN_ID" \
  --path "$BUCKET/models/$RUN_ID" --stage dev || true

if [[ "${DELETE_AFTER:-0}" == "1" ]]; then
  gcloud compute tpus tpu-vm delete "$NAME" \
    --project "$PROJECT_ID" --zone "$ZONE" --quiet
fi
echo "done: $BUCKET/models/$RUN_ID"
