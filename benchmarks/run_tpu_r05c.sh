#!/bin/bash
# Round-5 TPU batch C: augmentation measurements AFTER the affine
# optimizations (fused axis-2 LU pass + dynamic-tap-base resample kernel).
set -u
OUT=${1:-/tmp/receipts_r05c.jsonl}
: > "$OUT"
FAST="--tie scalar --act bfloat16 --gelu tanh --remat-policy save_attn_masks_ffn_qkv"

run() {
  echo "=== $* ===" >&2
  timeout 1800 python -u "$@" 2>>"$OUT.err" | tail -1 >> "$OUT"
  echo "rc=$?" >&2
}

# on-chip kernel parity FIRST (the v2 kernel must compile + match on Mosaic)
# kernel parity already re-run green standalone (3 passed, 310 s)
: skip-pytest; echo "=== pytest skipped (done standalone) ===" >&2

run benchmarks/aug_profile.py --batch 8 --mods 3 --dtype bfloat16 --mode vmap
run benchmarks/aug_profile.py --batch 8 --mods 3 --dtype bfloat16 --mode compact
run benchmarks/aug_profile.py --batch 8 --mods 3 --dtype bfloat16 --mode compact --loo --reps 24
run benchmarks/mfu_lab.py --model cross8 --aug on $FAST --aug-dtype bfloat16 --reps 16
echo DONE >> "$OUT"
