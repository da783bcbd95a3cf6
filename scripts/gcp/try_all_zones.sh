#!/usr/bin/env bash
# Hunt v5e capacity across zones: try each until a TPU VM creation
# succeeds. TPU-native analog of the reference's GPU zone-hunting loop
# (reference: scripts/try_all_zones.sh — T4 across us-central1 zones).
#
# Usage: PROJECT_ID=my-proj ./scripts/gcp/try_all_zones.sh [name]
set -uo pipefail

PROJECT_ID=${PROJECT_ID:?set PROJECT_ID}
NAME=${1:-sskd-tpu-$(date +%s)}
ACCEL_TYPE=${ACCEL_TYPE:-v5litepod-1}
VERSION=${VERSION:-v2-alpha-tpuv5-lite}

# v5e-capable zones, cheapest/most-available first; override with ZONES
ZONES=${ZONES:-"us-central1-a us-west4-a us-west1-c us-east5-b us-east1-c europe-west4-b asia-southeast1-b"}

for ZONE in $ZONES; do
  echo "=== trying $ZONE ==="
  if gcloud compute tpus tpu-vm create "$NAME" \
      --project "$PROJECT_ID" --zone "$ZONE" \
      --accelerator-type "$ACCEL_TYPE" \
      --version "$VERSION" ${SPOT:+--spot} 2>&1 | tee /tmp/tpu_create.log; then
    echo ""
    echo "SUCCESS: $NAME in $ZONE"
    echo "export ZONE=$ZONE   # for the follow-up scripts"
    exit 0
  fi
  # stockouts surface as resource-exhausted; anything else is fatal
  if ! grep -qiE "stockout|resource.*exhausted|no more capacity|ZONE_RESOURCE_POOL_EXHAUSTED" /tmp/tpu_create.log; then
    echo "non-capacity error in $ZONE — aborting (see /tmp/tpu_create.log)" >&2
    exit 1
  fi
  echo "no capacity in $ZONE, next..."
done

echo "no v5e capacity in any zone tried." >&2
echo "fall back to queued-resources (waits in line instead of failing):" >&2
echo "  QUEUED=1 scripts/gcp/create_tpu_vm.sh $NAME" >&2
exit 1
