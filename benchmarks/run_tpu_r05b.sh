#!/bin/bash
# Round-5 TPU batch B: augmentation decomposition + post-flash-fix int8+attn
# re-runs.  Serial (single-tenant chip); JSON lines appended to $OUT.
set -u
OUT=${1:-/tmp/receipts_r05b.jsonl}
: > "$OUT"
FAST="--tie scalar --act bfloat16 --gelu tanh --remat-policy save_attn_masks_ffn_qkv"

run() {
  echo "=== $* ===" >&2
  timeout 1800 python -u "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "rc=$?" >&2
}

# 1. per-transform augmentation profile at cross8 geometry (verdict item 3)
run benchmarks/aug_profile.py --batch 8 --mods 3 --dtype bfloat16 --mode compact
run benchmarks/aug_profile.py --batch 8 --mods 3 --dtype float32 --mode compact
run benchmarks/aug_profile.py --batch 8 --mods 3 --dtype bfloat16 --mode vmap
# 2. aug-on step at bench.py's aug_dtype (the r4 judge number used bf16)
run benchmarks/mfu_lab.py --model cross8 --aug on $FAST --aug-dtype bfloat16 --reps 16
# 3. int8+attn AFTER the flash-kernel fix (ops/attention.py int8 branch)
run benchmarks/bench_quant.py --model vit4 --attn
run benchmarks/bench_quant.py --model cross8 --attn
run benchmarks/bench_quant.py --model vitL6 --attn
echo DONE >> "$OUT"
