#!/usr/bin/env bash
# Inspect current Cloud TPU quota and print the request path.
# TPU-native analog of the reference's GPU quota helper
# (reference: scripts/request_gpu_quota.sh — NVIDIA T4/L4 quota).
#
# Usage: PROJECT_ID=my-proj REGION=us-central1 ./scripts/gcp/request_tpu_quota.sh
set -euo pipefail

PROJECT_ID=${PROJECT_ID:?set PROJECT_ID}
REGION=${REGION:-us-central1}

echo "=== current TPU quotas (project=$PROJECT_ID region=$REGION) ==="
# v5e on-demand cores quota metric; preemptible listed for spot capacity
gcloud compute tpus locations describe "${REGION}-a" \
  --project "$PROJECT_ID" 2>/dev/null || true
gcloud alpha services quota list \
  --service=tpu.googleapis.com --consumer="projects/$PROJECT_ID" \
  --format="table(metric, quotaBuckets[0].effectiveLimit)" 2>/dev/null \
  | grep -iE "v5|tpu|core" || echo "(no TPU quota rows visible — request below)"

cat <<EOF

To request v5e quota:
  1. Console: https://console.cloud.google.com/iam-admin/quotas?project=$PROJECT_ID
     Filter: "TPU v5 Lite PodSlice chips" (region $REGION).
  2. Request 1-8 chips for single-host training (this framework's DP/TP
     mesh spans one v5e host; 8 chips = the full 2x4 host topology).
  3. Spot/preemptible quota is granted faster and the trainer resumes from
     orbax checkpoints after preemption (see docs/guides/training.md).
EOF
