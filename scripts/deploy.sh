#!/usr/bin/env bash
# 4-environment deploy helper (reference parity: scripts/deploy.sh —
# local/docker/staging/production).
set -euo pipefail
cd "$(dirname "$0")/.."

ENV=${1:-local}
MODEL=${MODEL:-artifacts/models/kd_student/best_model}
INDEX=${INDEX:-artifacts/index}
IMAGE=${IMAGE:-sskd-tpu:latest}

case "$ENV" in
  local)
    exec python -m sskd_tpu.cli.main serve --model "$MODEL" --index "$INDEX"
    ;;
  docker)
    docker build -t "$IMAGE" .
    exec docker run --rm -p 8000:8000 \
      -v "$(realpath "$MODEL")":/app/model:ro \
      -v "$(realpath "$INDEX")":/app/index:ro \
      -e MODEL_DIR=/app/model -e INDEX_DIR=/app/index "$IMAGE"
    ;;
  staging)
    echo ">> push $IMAGE and roll staging (auth optional, rate limit on)"
    echo "   gcloud run deploy sskd-staging --image $IMAGE \\"
    echo "     --set-env-vars SEMANTIC_KD_RATE_LIMIT__ENABLED=true"
    ;;
  production)
    echo ">> production rollout requires the hardening audit to pass:"
    python -m sskd_tpu.cli.main config --production-audit || {
      echo "FIX the problems above (auth/rate-limit/CORS) before deploying"; exit 1; }
    echo "   gcloud run deploy sskd-prod --image $IMAGE \\"
    echo "     --set-env-vars SEMANTIC_KD_AUTH__ENABLED=true,SEMANTIC_KD_SERVICE__ENVIRONMENT=production"
    ;;
  *)
    echo "usage: deploy.sh [local|docker|staging|production]" >&2; exit 2;;
esac
