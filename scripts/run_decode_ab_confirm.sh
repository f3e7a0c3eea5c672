#!/bin/bash
# Interleaved confirmation A/B for the decode gather lowering.
#
# The full matrix (run_decode_ab.sh -> BENCH_DECODE_AB_r03.jsonl) ran
# its legs sequentially over ~an hour, so a single-digit-percent win
# could be relay drift: this driver interleaves the incumbent
# (sort/index) with the matrix winner (sort/onehot) A,B,A,B,A,B so
# each pair shares ambient conditions. Flip the DetectorConfig default
# only if B wins every adjacent pair.
#
# Usage: bash scripts/run_decode_ab_confirm.sh [outfile]
set -u
OUT="${1:-/tmp/decode_ab_confirm.jsonl}"
cd "$(dirname "$0")/.."

probe() {
    timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print('probe ok', float((x @ x).sum()))
" >/dev/null 2>&1
}

echo "[ab-confirm] waiting for TPU relay..." >&2
until probe; do
    echo "[ab-confirm] relay still down $(date -u +%H:%M:%S)" >&2
    sleep 120
done
echo "[ab-confirm] relay up $(date -u +%H:%M:%S)" >&2

run_leg() {
    local topk="$1" gather="$2" rep="$3" attempts=3
    for i in $(seq 1 $attempts); do
        echo "[ab-confirm] rep $rep topk=$topk gather=$gather attempt $i" >&2
        line=$(POSEBYTE_TOPK_IMPL="$topk" POSEBYTE_GATHER_IMPL="$gather" \
               timeout 2400 python bench.py 2>/tmp/ab_confirm_err.log | tail -1)
        if [ -n "$line" ] && echo "$line" | python -c \
            "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
            echo "$line" | python -c "
import json, sys
d = json.loads(sys.stdin.read())
d['topk_impl'] = '$topk'; d['gather_impl'] = '$gather'; d['rep'] = $rep
print(json.dumps(d))" >> "$OUT"
            echo "[ab-confirm] rep $rep $topk/$gather OK" >&2
            return 0
        fi
        echo "[ab-confirm] leg failed: $(tail -2 /tmp/ab_confirm_err.log)" >&2
        sleep 120
    done
    echo "[ab-confirm] rep $rep $topk/$gather EXHAUSTED" >&2
    return 1
}

for rep in 1 2 3; do
    run_leg sort index  "$rep"
    run_leg sort onehot "$rep"
done
echo "[ab-confirm] done -> $OUT" >&2
cat "$OUT"
