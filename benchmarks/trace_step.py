"""Capture a device trace of the config-4 train step (real TPU).

Writes a perfetto trace.json.gz under --logdir; benchmarks/trace_report.py
aggregates it into a per-op-category table.  One variant per process.
"""
import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/jax-trace")
    ap.add_argument("--aug", choices=["on", "off"], default="off")
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.ops import layers as L
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step

    L.TIE_KEY_MODE = "scalar"
    cfg = get_mgmt_config()
    modify_config(cfg, dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                            optim_params={"T_max": 250, "eta_min": 1e-6},
                            img_aug=args.aug == "on"))
    modify_config(cfg, dict(num_layers=12, dropout=args.dropout,
                            num_modalities=2))
    cfg.remat = args.remat
    cfg.remat_policy = "save_attn_masks_ffn_qkv"
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    cfg.activation_dtype = "bfloat16"
    cfg.augment_dtype = "bfloat16"

    rng = np.random.default_rng(0)
    imgs = (rng.normal(size=(32, 2, 1, *cfg.img_size)) * 800).astype(np.float32)
    labels = rng.integers(0, 2, size=32).astype(np.int32)
    imgs, labels = jax.device_put(imgs), jax.device_put(labels)

    params = model_vit.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    step = make_train_step(model_vit.apply, cfg)
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
