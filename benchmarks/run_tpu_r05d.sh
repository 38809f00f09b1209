#!/bin/bash
# Round-5 TPU batch D: serving quantization end-to-end sweep (VERDICT r4
# item 6) on the RUN_r05 checkpoint, then the refreshed config sweep and
# the headline bench.
set -u
CKPT=${1:?path to a full-size ModelCross npz checkpoint}
OUT=${2:-/tmp/receipts_r05d.jsonl}
: > "$OUT"

run() {
  echo "=== $* ===" >&2
  timeout 1800 python -u "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "rc=$?" >&2
}

run benchmarks/bench_serve.py --checkpoint "$CKPT" --jit-cache .bench_jit_cache
run benchmarks/bench_serve.py --checkpoint "$CKPT" --jit-cache .bench_jit_cache --quantize int8
run benchmarks/bench_serve.py --checkpoint "$CKPT" --jit-cache .bench_jit_cache --quantize int8+attn
echo DONE >> "$OUT"
