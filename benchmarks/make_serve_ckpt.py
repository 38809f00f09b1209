"""Materialize a full-size ModelCross checkpoint for serving benchmarks.

bench_serve.py needs an npz checkpoint; live-training checkpoints are
transient (/tmp runs).  Serving latency depends only on shapes, not weight
values, so a seeded random init under the exact config InferenceServer
falls back to (drivers/serve.py:89-96, the no-sidecar-JSON path) is a
faithful stand-in.  CPU backend: keeps the single-tenant TPU free.

Usage: python benchmarks/make_serve_ckpt.py [--out /tmp/serve_ckpt.npz]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/serve_ckpt.npz")
    ap.add_argument("--img-types", nargs="+", default=["DWI", "SWI", "ASL"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cross_attention_vit_tpu.configs import (get_mgmt_cross_config,
                                                 modify_config)
    from cross_attention_vit_tpu.models import model_cross
    from cross_attention_vit_tpu.train.checkpoint import save_pytree

    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        num_modalities=len(args.img_types), dropout=0.0, lr=1e-4,
        weight_decay=0.0, label_smoothing=0.0, attn_order={},
        img_aug=False, optim_params={"T_max": 1, "eta_min": 0}))
    params = model_cross.init(jax.random.key(0), cfg)
    save_pytree(args.out, {"params": params})
    n = sum(int(p.size) for p in jax.tree.leaves(params))
    print(f"wrote {args.out} ({n/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
