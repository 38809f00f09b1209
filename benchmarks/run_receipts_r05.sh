#!/bin/bash
# Round-5 receipt batch (VERDICT r4 item 2): every run a fresh process,
# serial (the TPU is single-tenant), JSON lines appended to $OUT.
# Fast-knob set = the bench.py/bench_configs cross8 configuration.
set -u
OUT=${1:-/tmp/receipts_r05.jsonl}
: > "$OUT"
FAST="--tie scalar --act bfloat16 --gelu tanh --remat-policy save_attn_masks_ffn_qkv"

run() {
  echo "=== $* ===" >&2
  timeout 1200 python -u "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "rc=$?" >&2
}

# 1. stacked-init A/B, aug off, two repeats each (VERDICT weak #3/#4)
run benchmarks/mfu_lab.py --model cross8 --aug off $FAST --reps 16
run benchmarks/mfu_lab.py --model cross8 --aug off $FAST --reps 16 --stacked-init
run benchmarks/mfu_lab.py --model cross8 --aug off $FAST --reps 16
run benchmarks/mfu_lab.py --model cross8 --aug off $FAST --reps 16 --stacked-init
# 2. aug-on decomposition at the same knobs
run benchmarks/mfu_lab.py --model cross8 --aug on $FAST --reps 16
# 3. int8 vs int8+attn at the three geometries (VERDICT weak #5)
run benchmarks/bench_quant.py --model vit4
run benchmarks/bench_quant.py --model vit4 --attn
run benchmarks/bench_quant.py --model cross8
run benchmarks/bench_quant.py --model cross8 --attn
run benchmarks/bench_quant.py --model vitL6
run benchmarks/bench_quant.py --model vitL6 --attn
echo DONE >> "$OUT"

# NOTE: the two --stacked-init runs above were executed BEFORE the
# stacked-streams feature was removed (same round, after the negative
# receipt was recorded in docs/PERF_r05.md); mfu_lab no longer accepts
# the flag, so re-running this script verbatim will skip those two runs
# with an argparse error in the .err log.
