#!/bin/bash
# Chained TPU backlog: wait for the decode A/B matrix (run_decode_ab.sh)
# to finish, then train yolov8s-pose on synthetic scenes at 640 — the
# remaining trained-weights-evidence item (docs/ROADMAP.md #3).
#
# Usage: bash scripts/run_post_ab_training.sh [ab_driver_log]
set -u
ABLOG="${1:-/tmp/decode_ab_driver.log}"
cd "$(dirname "$0")/.."

echo "[post-ab] waiting for A/B matrix to finish..." >&2
until grep -q "matrix done" "$ABLOG" 2>/dev/null; do sleep 120; done
echo "[post-ab] A/B done $(date -u +%H:%M:%S); starting s-scale training" >&2

for i in 1 2 3; do
    timeout 7200 python scripts/train_synthetic.py \
        -m yolov8s-pose --size 640 --steps 6000 \
        --out assets/yolov8s-pose-synthetic640.safetensors \
        > /tmp/train_s640.log 2>&1 && break
    echo "[post-ab] training attempt $i failed; retrying in 180s" >&2
    sleep 180
done
tail -3 /tmp/train_s640.log >&2
echo "[post-ab] done" >&2
