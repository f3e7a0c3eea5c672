#!/bin/bash
# Decode-lowering A/B matrix on the TPU (ROADMAP #4 experiments).
#
# Waits for the relay tunnel to come back, then runs bench.py for each
# (topk_impl, gather_impl) variant with retries around the relay's
# flaky remote-compile service. One JSON line per successful leg is
# appended to $OUT (default /tmp/decode_ab.jsonl) with the variant
# stamped in, so the matrix survives interruption and reruns skip
# nothing silently — rerun legs just append newer lines.
#
# Usage: bash scripts/run_decode_ab.sh [outfile]
set -u
OUT="${1:-/tmp/decode_ab.jsonl}"
cd "$(dirname "$0")/.."

probe() {
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float((x @ x).sum()))
" >/dev/null 2>&1
}

echo "[ab] waiting for TPU relay..." >&2
until probe; do
    echo "[ab] relay still down $(date -u +%H:%M:%S)" >&2
    sleep 120
done
echo "[ab] relay up $(date -u +%H:%M:%S)" >&2

run_leg() {
    local topk="$1" gather="$2" attempts=4
    for i in $(seq 1 $attempts); do
        echo "[ab] leg topk=$topk gather=$gather attempt $i" >&2
        line=$(POSEBYTE_TOPK_IMPL="$topk" POSEBYTE_GATHER_IMPL="$gather" \
               timeout 2400 python bench.py 2>/tmp/ab_leg_err.log | tail -1)
        if [ -n "$line" ] && echo "$line" | python -c \
            "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
            echo "$line" | python -c "
import json, sys
d = json.loads(sys.stdin.read())
d['topk_impl'] = '$topk'; d['gather_impl'] = '$gather'
print(json.dumps(d))" >> "$OUT"
            echo "[ab] leg topk=$topk gather=$gather OK" >&2
            return 0
        fi
        echo "[ab] leg failed: $(tail -2 /tmp/ab_leg_err.log)" >&2
        sleep 120
    done
    echo "[ab] leg topk=$topk gather=$gather EXHAUSTED" >&2
    return 1
}

# Baseline first (hot compile cache -> fast sanity + epoch anchor),
# then the exact variants, approx last (optional datum).
run_leg sort  index
run_leg bisect index
run_leg sort  onehot
run_leg bisect onehot
run_leg approx index
echo "[ab] matrix done -> $OUT" >&2
cat "$OUT"
