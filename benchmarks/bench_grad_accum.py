"""Gradient-accumulation demo: ViT-Large-depth training that cannot fit
one-shot on a single v5e chip.

ModelVIT depth 24 (ViT-Large depth), 2 streams, FULL (128,128,64) spatial,
batch 32, device augmentation + dropout — the one-shot backward residual set
exceeds the 16 GB HBM even in bf16 (compile-time OOM; config-4's depth-12 set
already sits at 15.4 GB peak, docs/PERF_r03.md).  `grad_accum=4` scans 8-item
microbatches inside the jitted step: same full-batch-mean Adam update
(test_parallel.py::test_grad_accum_matches_one_shot), activations at 1/4
size — compiles and trains on the chip.

`--accum-impl unroll` is the default here: this host reaches its TPU through
a relay, and while-loop iterations pay host round-trips (17.6 s vs ~0.5 s
per step at config-4 geometry with identical device-op time).  On a
directly-attached runtime use 'scan'.

Prints one JSON line with step time / MFU / volumes-per-sec.
"""
import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=24)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--grad-accum", type=int, default=4)
    ap.add_argument("--accum-impl", choices=["scan", "unroll"],
                    default="unroll")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from cross_attention_vit_tpu.utils import enable_compilation_cache

        enable_compilation_cache(str(ROOT / ".bench_jit_cache"))

    import numpy as np
    import jax
    import jax.numpy as jnp

    from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.ops import layers as L
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step
    from cross_attention_vit_tpu.utils import flops as F

    L.TIE_KEY_MODE = "scalar"
    L.GELU_APPROX = True
    cfg = get_mgmt_config()
    modify_config(cfg, dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                            optim_params={"T_max": 250, "eta_min": 1e-6},
                            img_aug=True))
    modify_config(cfg, dict(num_layers=args.depth, dropout=0.1,
                            num_modalities=2))
    cfg.remat = False
    cfg.remat_policy = "save_attn_masks_ffn_qkv"
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    cfg.activation_dtype = "bfloat16"
    cfg.augment_dtype = "bfloat16"

    rng = np.random.default_rng(0)
    imgs = (rng.normal(size=(args.batch, 2, 1, *cfg.img_size)) * 800
            ).astype(np.float32)
    labels = rng.integers(0, 2, size=args.batch).astype(np.int32)
    imgs, labels = jax.device_put(imgs), jax.device_put(labels)
    params = model_vit.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    step = make_train_step(model_vit.apply, cfg, grad_accum=args.grad_accum,
                           accum_impl=args.accum_impl)
    lr = jnp.asarray(1e-4, jnp.float32)

    t0 = time.time()
    params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                  jax.random.key(1))
    loss = float(jnp.sum(aux["loss"]))  # D2H sync (block_until_ready lies here)
    compile_s = time.time() - t0

    times = []
    for i in range(args.reps):
        t0 = time.time()
        params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                      jax.random.fold_in(jax.random.key(2), i))
        float(jnp.sum(aux["probs"]))
        times.append(time.time() - t0)
    dt = float(np.median(times))
    fl = F.train_flops(F.model_vit_fwd_flops(cfg, args.batch))
    print(json.dumps({
        "metric": "vit_large_grad_accum_train_volumes_per_sec",
        "value": round(args.batch / dt, 2),
        "unit": "volumes/s (train step, batch 32 via 4x8 microbatches)",
        "train_step_ms": round(dt * 1000, 2),
        "mfu": round(F.mfu(fl, dt), 4),
        "grad_accum": args.grad_accum,
        "accum_impl": args.accum_impl,
        "compile_s": round(compile_s, 1),
        "loss": loss,
        "config": f"ModelVIT depth {args.depth}, 2 streams, full aug, bf16, "
                  f"batch {args.batch} (does NOT fit one-shot: compile-time "
                  f"HBM OOM)",
    }))


if __name__ == "__main__":
    main()
