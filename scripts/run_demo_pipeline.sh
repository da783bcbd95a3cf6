#!/usr/bin/env bash
# Demo pipeline (reference: scripts/run_demo_pipeline.sh — 200 samples,
# 2 epochs, bs 4, stage 1, CPU): vanilla eval -> KD train -> KD eval ->
# markdown report. Runs fully offline on the bundled synthetic dataset.
set -euo pipefail

cd "$(dirname "$0")/.."
export SSKD_PLATFORM=${SSKD_PLATFORM:-cpu}

SAMPLES=${SAMPLES:-200}
EPOCHS=${EPOCHS:-2}
BATCH=${BATCH:-4}
STAGE=${STAGE:-1}
WORK=${WORK:-artifacts/demo}
# tiny demo model + few steps need a demo-scale learning rate; the
# production default (2e-5) moves weights invisibly in 2 epochs
export SEMANTIC_KD_TRAINING__LEARNING_RATE=${LR:-0.005}
# the demo teacher is untrained (zero-egress host): its confidences sit at
# ~0.5, so the production threshold (0.6) would filter every negative
export SEMANTIC_KD_MINING__TEACHER_CONFIDENCE_THRESHOLD=${TEACHER_CONF:-0.0}

run() { python -m sskd_tpu.cli.main "$@"; }

echo "=== [1/5] demo data + prepare ==="
run demo-data --out "$WORK/data/raw/demo" --samples "$SAMPLES" > /dev/null
run prepare --data-dir "$WORK/data" --dataset demo > /dev/null

echo "=== [2/5] vanilla baseline eval ==="
run eval --tiny --model vanilla-student \
  --data "$WORK/data/raw/demo/train.jsonl" --max-samples 50 \
  --out "$WORK/vanilla_metrics.json" > /dev/null

echo "=== [3/5] KD training (stage $STAGE, $EPOCHS epochs, bs $BATCH) ==="
run train --tiny --data-dir "$WORK/data" --dataset demo \
  --output-dir "$WORK/run" --stage "$STAGE" --epochs "$EPOCHS" \
  --batch-size "$BATCH"

echo "=== [4/5] KD student eval ==="
run eval --model "$WORK/run/best_model" \
  --data "$WORK/data/raw/demo/train.jsonl" --max-samples 50 \
  --out "$WORK/kd_metrics.json" > /dev/null

echo "=== [5/5] report ==="
python - "$WORK" <<'EOF'
import json, sys
from pathlib import Path
work = Path(sys.argv[1])
vanilla = json.loads((work / "vanilla_metrics.json").read_text())
kd = json.loads((work / "kd_metrics.json").read_text())
lines = ["# KD demo report", "", "| metric | vanilla | kd_student | delta |", "|---|---|---|---|"]
for key in sorted(set(vanilla) & set(kd)):
    lines.append(f"| {key} | {vanilla[key]:.4f} | {kd[key]:.4f} | {kd[key]-vanilla[key]:+.4f} |")
report = "\n".join(lines) + "\n"
(work / "KD_REPORT.md").write_text(report)
print(report)
EOF
echo "report: $WORK/KD_REPORT.md"
