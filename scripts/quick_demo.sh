#!/usr/bin/env bash
# 2-minute serving demo: generate a tiny corpus, build both index arms,
# start the service, run live queries (dense + hybrid), print results.
# Analog of the reference's quick_demo.sh / quick_training_demo.sh
# (reference: scripts/quick_demo.sh — train-then-query walkthrough).
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${WORK:-/tmp/sskd-quick-demo}
PORT=${PORT:-8123}
rm -rf "$WORK" && mkdir -p "$WORK"

echo "=== [1/4] demo corpus ==="
python -m sskd_tpu.cli.main demo-data --out "$WORK/data/raw/demo" --samples 60
python -m sskd_tpu.cli.main prepare --data-dir "$WORK/data" --dataset demo

echo "=== [2/4] dense + BM25 indexes ==="
# NOTE: build with the same architecture the service loads (the service
# default is the production-size student) — a --tiny index would be 64-d
# against the service's 384-d encoder
python -m sskd_tpu.cli.main index build \
  --model intfloat/e5-small-v2 \
  --data "$WORK/data/chunks/demo/train.parquet" --out "$WORK/index"
python - "$WORK" <<'EOF'
import sys
from sskd_tpu.mining.bm25 import BM25Index
w = sys.argv[1]
BM25Index().build_from_parquet(f"{w}/data/chunks/demo/train.parquet").save(f"{w}/bm25")
EOF

echo "=== [3/4] start service on :$PORT ==="
# Without pretrained student weights (zero-egress hosts random-init the
# encoder) the dense arm carries no signal, so the demo defaults to
# lexical-dominant fusion; override for a trained checkpoint.
export SEMANTIC_KD_SEARCH__HYBRID__BM25_WEIGHT=${BM25_WEIGHT:-0.7}
export SEMANTIC_KD_SEARCH__HYBRID__SEMANTIC_WEIGHT=${SEMANTIC_WEIGHT:-0.3}
python -m sskd_tpu.cli.main serve --port "$PORT" \
  --index "$WORK/index" --hybrid-bm25 "$WORK/bm25" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT
for _ in $(seq 1 120); do
  curl -fs "http://127.0.0.1:$PORT/ready" >/dev/null 2>&1 && break
  sleep 1
done
curl -fs "http://127.0.0.1:$PORT/ready" >/dev/null || {
  echo "service failed to become ready" >&2; exit 1; }

echo "=== [4/4] live queries ==="
for Q in "machine learning algorithms" "capital of france" "neural networks"; do
  echo "--- query: $Q"
  curl -s -X POST "http://127.0.0.1:$PORT/search" \
    -H 'Content-Type: application/json' \
    -d "{\"query\": \"$Q\", \"k\": 3}" \
    | python -c "import json,sys; b=json.load(sys.stdin); \
print('  hybrid:', b['hybrid'], ' latency_ms:', round(b['latency_ms'],1)); \
[print('   ', r['rank'], r['doc_id'], '-', (r['text'] or '')[:70]) for r in b['results']]"
done
echo "=== demo OK ==="
