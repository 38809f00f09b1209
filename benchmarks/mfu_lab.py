"""Train-step MFU lab — A/B harness for the round-3 perf knobs (real TPU).

One variant per process (a JAX backend initializes once); prints one JSON
line.  Timing follows the repo discipline: dispatch N steps, force completion
with a D2H scalar fetch (the axon relay acks block_until_ready early).

Knobs under test (all default-off → the baseline variant reproduces the
round-2 shipped configuration):

  --tie {scalar,full,none}      ops.layers.TIE_KEY_MODE: how dropout keys are
                                data-tied to their input ('full' barriers the
                                whole tensor and blocks fusion; 'scalar'
                                barriers a 1-element witness).
  --remat-policy {save_attn,save_attn_masks,full}
                                what the backward recompute skips.
  --act {float32,bfloat16}      activation storage dtype between ops.
  --dropout R --aug {on,off}    isolate the two measured overheads.
  --model {vit4,cross8}         config-4 geometry (ModelVIT depth 12, 2
                                streams, batch 32) or the live bench shape
                                (ModelCross 3-stream grid point, batch 8).

Usage: python benchmarks/mfu_lab.py --model vit4 --tie scalar --act bfloat16
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
    ap.add_argument("--model", choices=["vit4", "cross8"], default="vit4")
    ap.add_argument("--tie", choices=["scalar", "full", "none"], default="full")
    ap.add_argument("--remat-policy", default="save_attn",
                    choices=["save_attn", "save_attn_masks",
                             "save_attn_masks_ffn",
                             "save_attn_masks_ffn_qkv", "full"])
    ap.add_argument("--act", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--dropout", type=float, default=None,
                    help="override the model's dropout rate")
    ap.add_argument("--mask-bits", choices=["16", "8", "auto", "none"],
                    default="auto",
                    help="ops.layers.DROPOUT_BITS: uint16/uint8 threshold "
                         "masks ('auto': 8 when keep-prob is 8-bit-exact) "
                         "vs exact bernoulli ('none')")
    ap.add_argument("--aug", choices=["on", "off"], default="on")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable jax.checkpoint entirely (vit4 defaults to "
                         "remat=True); XLA keeps all backward residuals — "
                         "only viable when the activation set fits HBM")
    ap.add_argument("--aug-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="config.augment_dtype: pipeline dtype for the "
                         "device augmentation step boundaries")
    ap.add_argument("--gelu", choices=["exact", "tanh"], default="exact",
                    help="ops.layers.GELU_APPROX: tanh approximation "
                         "(torch nn.GELU(approximate='tanh') formula)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from cross_attention_vit_tpu.utils import enable_compilation_cache

        enable_compilation_cache(str(ROOT / ".bench_jit_cache"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                                 get_mgmt_cross_config,
                                                 modify_config)
    from cross_attention_vit_tpu.models import model_cross, model_vit
    from cross_attention_vit_tpu.ops import layers as L
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step
    from cross_attention_vit_tpu.utils import flops as F

    L.TIE_KEY_MODE = None if args.tie == "none" else args.tie
    L.DROPOUT_BITS = (None if args.mask_bits == "none" else
                      "auto" if args.mask_bits == "auto" else
                      int(args.mask_bits))
    L.GELU_APPROX = args.gelu == "tanh"

    common = dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                  optim_params={"T_max": 250, "eta_min": 1e-6},
                  img_aug=args.aug == "on")
    if args.model == "vit4":
        module = model_vit
        cfg = get_mgmt_config()
        modify_config(cfg, common)
        modify_config(cfg, dict(num_layers=12, dropout=0.1, num_modalities=2))
        cfg.remat = True
        batch, M = 32, 2
        fwd_flops_fn = lambda: F.model_vit_fwd_flops(cfg, batch)
    else:
        module = model_cross
        cfg = get_mgmt_cross_config()
        modify_config(cfg, common)
        modify_config(cfg, dict(dropout=0.25,
                                attn_order={"0": "1", "1": "2", "2": "0"},
                                num_modalities=3))
        batch, M = 8, 3
        fwd_flops_fn = lambda: F.model_cross_fwd_flops(cfg, batch)
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    cfg.activation_dtype = args.act
    cfg.augment_dtype = args.aug_dtype
    cfg.remat_policy = args.remat_policy if args.remat_policy != "full" else "full"
    if args.no_remat:
        cfg.remat = False
    if args.dropout is not None:
        cfg.dropout = args.dropout

    rng = np.random.default_rng(0)
    imgs = (rng.normal(size=(batch, M, 1, *cfg.img_size)) * 800).astype(np.float32)
    labels = rng.integers(0, 2, size=batch).astype(np.int32)
    imgs, labels = jax.device_put(imgs), jax.device_put(labels)

    params = module.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    step = make_train_step(module.apply, cfg)
    lr = jnp.asarray(1e-4, jnp.float32)

    t0 = time.perf_counter()
    params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                  jax.random.key(1))
    float(jnp.sum(aux["loss"]))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(args.reps):
        params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                      jax.random.fold_in(jax.random.key(1), i))
    float(jnp.sum(aux["loss"]))
    dt = (time.perf_counter() - t0) / args.reps

    print(json.dumps({
        "variant": {"model": args.model, "tie": args.tie,
                    "remat_policy": args.remat_policy, "act": args.act,
                    "mask_bits": args.mask_bits, "aug_dtype": args.aug_dtype,
                    "gelu": args.gelu, "dropout": cfg.dropout,
                    "aug": args.aug},
        "train_step_ms": round(dt * 1000, 2),
        "mfu": round(F.mfu(F.train_flops(fwd_flops_fn()), dt), 4),
        "volumes_per_sec": round(batch / dt, 2),
        "compile_s": round(compile_s, 1),
        "loss": float(aux["loss"]),
    }))


if __name__ == "__main__":
    main()
