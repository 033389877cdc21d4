#!/bin/bash
# Same-session alternating fresh-JVM A/B: r2-tagged bench.py vs HEAD
# bench.py on the SAME testdata, interleaved so host drift cancels.
# Usage: bash scripts/bench_ab_r2_vs_head.sh [reps] [out]
set -u
REPS=${1:-3}
OUT=${2:-/tmp/bench_ab_r2_vs_head.jsonl}
: > "$OUT"
for i in $(seq 1 "$REPS"); do
  for v in r2 head; do
    if [ "$v" = r2 ]; then d=/tmp/wt_r2; else d=/root/repo; fi
    line=$(cd "$d" && timeout 900 python bench.py 2>/dev/null | tail -1)
    echo "{\"variant\": \"$v\", \"rep\": $i, \"bench\": $line}" >> "$OUT"
    echo "done $v rep $i"
  done
done
