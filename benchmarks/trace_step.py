"""Capture a device trace of a train step (real TPU).

--model vit4 (default) is the config-4 geometry (ModelVIT depth 12, 2
streams, batch 32); --model cross8 is the live bench shape (ModelCross
3-stream grid point, batch 8).  Writes a perfetto trace.json.gz under
--logdir; benchmarks/trace_report.py aggregates it into a per-op-category
table.  One variant per process.
"""
import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/jax-trace")
    ap.add_argument("--model", choices=["vit4", "cross8"], default="vit4")
    ap.add_argument("--aug", choices=["on", "off"], default="off")
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--gelu", choices=["exact", "tanh"], default="exact")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

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

    L.TIE_KEY_MODE = "scalar"
    L.GELU_APPROX = args.gelu == "tanh"
    if args.model == "vit4":
        cfg = get_mgmt_config()
        modify_config(cfg, dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                                optim_params={"T_max": 250, "eta_min": 1e-6},
                                img_aug=args.aug == "on"))
        modify_config(cfg, dict(num_layers=12, dropout=args.dropout,
                                num_modalities=2))
        model, B, M = model_vit, 32, 2
    else:
        # live bench shape: 3-stream ModelCross grid point, batch 8 (bench.py)
        cfg = get_mgmt_cross_config()
        modify_config(cfg, dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                                optim_params={"T_max": 250, "eta_min": 1e-6},
                                img_aug=args.aug == "on",
                                attn_order={"0": "1", "1": "2", "2": "0"}))
        modify_config(cfg, dict(dropout=args.dropout, num_modalities=3))
        model, B, M = model_cross, 8, 3
    cfg.remat = args.remat
    cfg.remat_policy = "save_attn_masks_ffn_qkv"
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    cfg.activation_dtype = "bfloat16"
    cfg.augment_dtype = "bfloat16"

    rng = np.random.default_rng(0)
    imgs = (rng.normal(size=(B, M, 1, *cfg.img_size)) * 800).astype(np.float32)
    labels = rng.integers(0, 2, size=B).astype(np.int32)
    imgs, labels = jax.device_put(imgs), jax.device_put(labels)

    params = model.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    step = make_train_step(model.apply, cfg)
    lr = jnp.asarray(1e-4, jnp.float32)

    params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                  jax.random.key(1))
    float(jnp.sum(aux["loss"]))  # compile + real sync

    jax.profiler.start_trace(args.logdir)
    for i in range(args.steps):
        params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                      jax.random.fold_in(jax.random.key(1), i))
    float(jnp.sum(aux["loss"]))
    jax.profiler.stop_trace()
    print("trace written to", args.logdir)


if __name__ == "__main__":
    main()
