#!/usr/bin/env bash
# GCP project bootstrap for TPU training + GCS artifact bus.
# TPU-native analog of the reference's setup_gcp.sh (bucket + API bootstrap
# for GPU/Vertex; reference: scripts/setup_gcp.sh) — here the compute API
# surface is Cloud TPU (v5e) instead of Compute Engine GPUs.
#
# Usage:
#   PROJECT_ID=my-proj BUCKET=gs://my-bucket ./scripts/gcp/setup_gcp.sh
set -euo pipefail

PROJECT_ID=${PROJECT_ID:?set PROJECT_ID}
BUCKET=${BUCKET:?set BUCKET (gs://...)}
REGION=${REGION:-us-central1}
SA_NAME=${SA_NAME:-sskd-tpu-trainer}

echo "=== enabling APIs (project=$PROJECT_ID) ==="
gcloud services enable --project "$PROJECT_ID" \
  tpu.googleapis.com \
  storage.googleapis.com \
  artifactregistry.googleapis.com \
  run.googleapis.com \
  secretmanager.googleapis.com

echo "=== artifact bucket ==="
if ! gsutil ls -b "$BUCKET" >/dev/null 2>&1; then
  gsutil mb -l "$REGION" -p "$PROJECT_ID" "$BUCKET"
fi
# the artifact-bus layout consumed by entrypoint.sh / model_registry.py
for prefix in data models indexes checkpoints registry; do
  gsutil ls "$BUCKET/$prefix/" >/dev/null 2>&1 || \
    echo | gsutil cp - "$BUCKET/$prefix/.keep"
done

echo "=== training service account ==="
SA_EMAIL="$SA_NAME@$PROJECT_ID.iam.gserviceaccount.com"
if ! gcloud iam service-accounts describe "$SA_EMAIL" \
    --project "$PROJECT_ID" >/dev/null 2>&1; then
  gcloud iam service-accounts create "$SA_NAME" \
    --project "$PROJECT_ID" --display-name "sskd TPU trainer"
fi
gsutil iam ch "serviceAccount:$SA_EMAIL:roles/storage.objectAdmin" "$BUCKET"
gcloud projects add-iam-policy-binding "$PROJECT_ID" \
  --member "serviceAccount:$SA_EMAIL" --role roles/tpu.admin --quiet \
  >/dev/null

echo "=== done ==="
echo "bucket:          $BUCKET"
echo "service account: $SA_EMAIL"
echo "next: scripts/gcp/create_tpu_vm.sh or scripts/gcp/try_all_zones.sh"
