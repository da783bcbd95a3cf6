#!/usr/bin/env bash
# Push the working tree to the GCS artifact bus so TPU VMs / jobs can pull
# it without a git remote (reference analog: scripts/upload_code_to_gcs.sh).
#
# Usage: BUCKET=gs://my-bucket ./scripts/gcp/upload_code_to_gcs.sh
set -euo pipefail
cd "$(dirname "$0")/../.."

BUCKET=${BUCKET:?set BUCKET (gs://...)}
DEST="$BUCKET/code/sskd-tpu-$(git rev-parse --short HEAD 2>/dev/null || date +%s).tar.gz"

TMP=$(mktemp /tmp/sskd-code-XXXX.tar.gz)
trap 'rm -f "$TMP"' EXIT
# tracked files only — never ship local artifacts/ or data/
git archive --format=tar.gz -o "$TMP" HEAD

gsutil cp "$TMP" "$DEST"
gsutil cp "$TMP" "$BUCKET/code/latest.tar.gz"
echo "uploaded: $DEST (and code/latest.tar.gz)"
