#!/usr/bin/env bash
# Complete pipeline with hardware autodetect: data -> mine -> train ->
# index -> eval -> (optional) serve. TPU-native analog of the reference's
# run_complete_pipeline.sh (GPU autodetect + CPU fallback there,
# reference: scripts/run_complete_pipeline.sh:36-47); here the detect is
# TPU-vs-CPU via jax.default_backend().
#
# Usage: ./scripts/run_complete_pipeline.sh
# Env:   DATASET/MAX_SAMPLES/EPOCHS/BATCH/STAGE, SERVE=1 to start the API.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${DATASET:-demo}
MAX_SAMPLES=${MAX_SAMPLES:-1000}
EPOCHS=${EPOCHS:-3}
BATCH=${BATCH:-16}
STAGE=${STAGE:-2}
OUT=${OUT:-artifacts/models/kd_student}
INDEX_OUT=${INDEX_OUT:-artifacts/index}
DATA_DIR=${DATA_DIR:-data}

BACKEND=$(python -c "import jax; print(jax.default_backend())" 2>/dev/null | tail -1)
if [[ "$BACKEND" == "tpu" ]]; then
  echo "=== TPU detected: full-precision recipe, batch $BATCH ==="
  TINY_FLAG=""
else
  echo "=== no TPU ($BACKEND): CPU fallback — tiny architectures ==="
  TINY_FLAG="--tiny"
  MAX_SAMPLES=$(( MAX_SAMPLES < 300 ? MAX_SAMPLES : 300 ))
fi

echo "=== [1/5] data ==="
if [[ "$DATASET" == "demo" ]]; then
  python -m sskd_tpu.cli.main demo-data --out "$DATA_DIR/raw/demo" --samples "$MAX_SAMPLES"
fi
python -m sskd_tpu.cli.main prepare --data-dir "$DATA_DIR" --dataset "$DATASET"
python -m sskd_tpu.cli.main integrity --data-dir "$DATA_DIR" --dataset "$DATASET"

echo "=== [2/5] train (stage $STAGE) ==="
python -m sskd_tpu.cli.main train $TINY_FLAG \
  --data-dir "$DATA_DIR" --dataset "$DATASET" \
  --max-samples "$MAX_SAMPLES" --stage "$STAGE" --epochs "$EPOCHS" \
  --batch-size "$BATCH" --output-dir "$OUT"

echo "=== [3/5] index ==="
python -m sskd_tpu.cli.main index build $TINY_FLAG \
  --model "$OUT/best_model" \
  --data "$DATA_DIR/chunks/$DATASET/train.parquet" \
  --out "$INDEX_OUT"
python -m sskd_tpu.cli.main index validate --dir "$INDEX_OUT"

echo "=== [4/5] eval ==="
python -m sskd_tpu.cli.main eval $TINY_FLAG \
  --model "$OUT/best_model" \
  --data "$DATA_DIR/raw/$DATASET/validation.jsonl" \
  --out "$OUT/eval_metrics.json"

echo "=== [5/5] serve ==="
if [[ "${SERVE:-0}" == "1" ]]; then
  exec python -m sskd_tpu.cli.main serve --model "$OUT/best_model" --index "$INDEX_OUT"
else
  echo "skipped (set SERVE=1); start with:"
  echo "  semantic-kd serve --model $OUT/best_model --index $INDEX_OUT"
fi
