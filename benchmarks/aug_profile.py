"""Per-transform on-chip profile of the device augmentation pipeline.

The r4 verdict decomposition put device augmentation at ~16-20 ms of the
~70 ms cross8 live train step (~25%, the entire cross8-vs-config4 MFU gap,
since aug FLOPs are correctly excluded from MFU).  This harness times each
of the 9 transforms IN ISOLATION through the production batch pipeline
(augment_batch mode='compact'/'vmap' — every step keeps its Bernoulli draw,
gating, and where-select overhead, so the numbers decompose the live cost),
plus the full pipeline and the identity baseline.

Timing discipline: dispatch N reps chained on the output, force completion
with a D2H scalar fetch (axon acks block_until_ready early — CLAUDE.md).

Usage: python benchmarks/aug_profile.py --batch 8 --mods 3 --dtype bfloat16
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

STEP_NAMES = ["flip", "rot90", "affine", "contrast", "noise", "smooth",
              "shuffle", "dropout", "zoom"]
PROB_FIELDS = [f"{n}_prob" for n in STEP_NAMES]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mods", type=int, default=3)
    ap.add_argument("--size", type=int, nargs=3, default=(128, 128, 64))
    ap.add_argument("--dtype", choices=["float32", "bfloat16"],
                    default="bfloat16",
                    help="pipeline dtype at step boundaries "
                         "(config.augment_dtype; bench.py runs bfloat16)")
    ap.add_argument("--mode", choices=["compact", "vmap"], default="compact")
    ap.add_argument("--loo", action="store_true",
                    help="leave-one-out: time the FULL pipeline with each "
                         "step removed; step cost = full − loo.  Immune to "
                         "the ~5 ms per-dispatch relay floor that makes "
                         "isolated-step numbers non-additive (each isolated "
                         "run is its own jit dispatch; in the train step the "
                         "pipeline is fused into one program)")
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from cross_attention_vit_tpu.utils import enable_compilation_cache

        enable_compilation_cache(str(ROOT / ".bench_jit_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_attention_vit_tpu.data.augment import AugmentConfig, augment_batch

    rng = np.random.default_rng(0)
    imgs = (rng.normal(size=(args.batch, args.mods, 1, *args.size)) * 800
            ).astype(np.float32)
    imgs = jax.device_put(jnp.asarray(imgs, jnp.dtype(args.dtype)))
    key = jax.random.key(7)

    base = AugmentConfig()

    def timed(cfg):
        f = jax.jit(lambda k, x: augment_batch(k, x, cfg, mode=args.mode))
        out = f(key, imgs)
        float(jnp.sum(out.astype(jnp.float32)))  # compile + sync
        t0 = time.perf_counter()
        x = imgs
        for i in range(args.reps):
            x = f(jax.random.fold_in(key, i), x)
        float(jnp.sum(x.astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.reps * 1000

    result = {"batch": args.batch, "mods": args.mods, "dtype": args.dtype,
              "mode": args.mode, "reps": args.reps,
              "device": jax.devices()[0].device_kind}

    # identity: pipeline with every prob 0 → pure dispatch/copy floor
    # (measured twice, first and last, min taken — this host's scheduler
    # noise can inflate a single 2-rep sample by an order of magnitude)
    zeros = {f: 0.0 for f in PROB_FIELDS}
    ident_a = timed(dataclasses.replace(base, **zeros))

    full_a = timed(base)
    for name, field in zip(STEP_NAMES, PROB_FIELDS):
        if args.loo:
            cfg_i = dataclasses.replace(base, **{field: 0.0})
        else:
            only = dict(zeros)
            only[field] = getattr(base, field)
            cfg_i = dataclasses.replace(base, **only)
        result[f"{name}_ms"] = round(timed(cfg_i), 2)

    full_b = timed(base)
    result["full_ms"] = round(min(full_a, full_b), 2)
    ident_b = timed(dataclasses.replace(base, **zeros))
    result["identity_ms"] = round(min(ident_a, ident_b), 2)
    if args.loo:
        result["marginal_ms"] = {
            n: round(result["full_ms"] - result[f"{n}_ms"], 2)
            for n in STEP_NAMES}
    else:
        result["sum_steps_ms"] = round(sum(
            max(result[f"{n}_ms"] - result["identity_ms"], 0.0)
            for n in STEP_NAMES) + result["identity_ms"], 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
