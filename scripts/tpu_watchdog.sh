#!/bin/bash
# Detached fallback v2: poll the axon relay; on recovery run the r5 queue
# unless the interactive session has claimed the device (/tmp/r5_claimed).
# Re-arms if the queue ran but the headline bench artifact never landed
# (tunnel flapped mid-queue) — up to MAX_ATTEMPTS full queue attempts.
MAX_ATTEMPTS=3
attempt=0
headline_ok() {
  python3 - <<'EOF'
import json, sys
try:
    r = json.load(open('/root/repo/artifacts/bench/bench_r05_interim.json'))
    sys.exit(0 if (r.get('value') or 0) > 0 else 1)
except Exception:
    sys.exit(1)
EOF
}
while true; do
  if [ -f /tmp/r5_claimed ]; then echo "claimed; watchdog idle"; sleep 300; continue; fi
  if timeout 3 bash -c 'echo > /dev/tcp/127.0.0.1/8083' 2>/dev/null; then
    date > /tmp/tpu_up_r5
    sleep 120  # grace period: let the interactive session claim first
    [ -f /tmp/r5_claimed ] && continue
    attempt=$((attempt+1))
    echo "=== queue attempt $attempt $(date) ===" >> /tmp/r5_queue_out.log
    bash /tmp/tpu_queue_r5.sh >> /tmp/r5_queue_out.log 2>&1
    if headline_ok; then echo "headline landed; watchdog done"; exit 0; fi
    if [ "$attempt" -ge "$MAX_ATTEMPTS" ]; then echo "max attempts; exiting"; exit 1; fi
    sleep 300  # tunnel flapped mid-queue: wait before re-probing
  else
    sleep 60
  fi
done
