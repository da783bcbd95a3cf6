#!/usr/bin/env bash
# Create a single TPU VM (v5e by default) for training or index building.
# TPU-native analog of the reference's GPU VM creation embedded in
# run_training_on_gcp_vm.sh (n1-standard-4 + T4 there).
#
# Usage:
#   PROJECT_ID=my-proj ZONE=us-central1-a ./scripts/gcp/create_tpu_vm.sh [name]
# Env:
#   ACCEL_TYPE   v5litepod-1 (default) | v5litepod-4 | v5litepod-8 ...
#   VERSION      TPU software version (default v2-alpha-tpuv5-lite)
#   SPOT=1       request spot capacity (cheaper, preemptible — the trainer
#                resumes from orbax checkpoints)
#   QUEUED=1     go through queued-resources instead of direct create
#                (waits for capacity instead of failing on stockout)
set -euo pipefail

PROJECT_ID=${PROJECT_ID:?set PROJECT_ID}
ZONE=${ZONE:-us-central1-a}
NAME=${1:-sskd-tpu-$(date +%s)}
ACCEL_TYPE=${ACCEL_TYPE:-v5litepod-1}
VERSION=${VERSION:-v2-alpha-tpuv5-lite}

if [[ "${QUEUED:-0}" == "1" ]]; then
  echo "=== queued-resource request: $NAME ($ACCEL_TYPE, $ZONE) ==="
  gcloud compute tpus queued-resources create "$NAME" \
    --project "$PROJECT_ID" --zone "$ZONE" \
    --node-id "$NAME" \
    --accelerator-type "$ACCEL_TYPE" \
    --runtime-version "$VERSION" \
    ${SPOT:+--spot}
  echo "poll:  gcloud compute tpus queued-resources describe $NAME --zone $ZONE"
  exit 0
fi

echo "=== creating TPU VM: $NAME ($ACCEL_TYPE, $ZONE) ==="
gcloud compute tpus tpu-vm create "$NAME" \
  --project "$PROJECT_ID" --zone "$ZONE" \
  --accelerator-type "$ACCEL_TYPE" \
  --version "$VERSION" \
  ${SPOT:+--spot}

echo "=== ready ==="
echo "ssh:    gcloud compute tpus tpu-vm ssh $NAME --zone $ZONE"
echo "train:  scripts/gcp/run_training_on_tpu_vm.sh $NAME"
echo "delete: gcloud compute tpus tpu-vm delete $NAME --zone $ZONE --quiet"
