#!/usr/bin/env bash
# Submit the containerized training job to a GKE cluster with v5e nodes
# using infra/tpu_training_job.yaml. TPU-native analog of the reference's
# Vertex AI custom-job submission (reference: scripts/run_vertex_ai_training.sh
# + infra/vertex_training_job.yaml — g2-standard-4 + 1x L4).
#
# Usage:
#   PROJECT_ID=my-proj BUCKET=gs://my-bucket ./scripts/gcp/submit_tpu_job.sh
set -euo pipefail
cd "$(dirname "$0")/../.."

PROJECT_ID=${PROJECT_ID:?set PROJECT_ID}
BUCKET=${BUCKET:?set BUCKET (gs://...)}
IMAGE=${IMAGE:-gcr.io/$PROJECT_ID/sskd-tpu-train:latest}
CLUSTER=${CLUSTER:-}

echo "=== [1/3] build + push training image ==="
docker build -f infra/Dockerfile.train -t "$IMAGE" .
docker push "$IMAGE"

echo "=== [2/3] render job spec ==="
SPEC=$(mktemp /tmp/sskd-job-XXXX.yaml)
sed -e "s|gcr.io/PROJECT/sskd-tpu-train:latest|$IMAGE|" \
    -e "s|gs://BUCKET|$BUCKET|" \
    infra/tpu_training_job.yaml > "$SPEC"

echo "=== [3/3] submit ==="
if [[ -n "$CLUSTER" ]]; then
  gcloud container clusters get-credentials "$CLUSTER" --project "$PROJECT_ID"
fi
kubectl apply -f "$SPEC"
echo "watch:  kubectl logs -f job/sskd-kd-training"
echo "result: $BUCKET/models/kd_student"
