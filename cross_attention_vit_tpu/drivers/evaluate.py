"""Evaluation driver: restore a checkpoint, run a split, report metrics.

Completes the reference's test loop (its test hooks only collect logits and
targets, model_cross.py:294-308 — no metric computation or reporting exists).
Supports the mesh for sharded multi-chip eval (BASELINE.md config 5).

CLI:
    python -m cross_attention_vit_tpu.drivers.evaluate \
        --checkpoint runs/checkpoints/cross/epoch=..npz --model cross \
        --labels .../labels.csv --data .../ucsf-data \
        --img-types DWI SWI ASL --attn-order 0:1,1:2,2:0 --only-available
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

import jax

from ..configs import get_mgmt_config, get_mgmt_cross_config, modify_config
from ..data.dataset import BrainDataset
from ..data.labels import clean_data, load_labels
from ..data.loader import PrefetchLoader, transfer_dtype_for
from ..models import model_cross, model_vit
from ..train.checkpoint import restore_pytree
from ..train.metrics import binary_auroc, compute_metrics
from ..train.trainer import Trainer

_FAMILIES = {"cross": (model_cross, get_mgmt_cross_config),
             "vit": (model_vit, get_mgmt_config)}


def evaluate(checkpoint: str | Path, model: str, data_df, *, folder: str,
             img_types, config_overrides=None, batch_size: int = 8,
             mesh=None) -> dict:
    """Returns the full metric dict over `data_df`.

    The architecture config is auto-loaded from the config JSON the
    CheckpointManager persists next to the weights; `config_overrides`
    applies on top (and is the fallback when no JSON exists)."""
    from ..train.checkpoint import load_config_for

    module, factory = _FAMILIES[model]
    cfg = load_config_for(checkpoint)
    if cfg is None:
        cfg = factory()
        modify_config(cfg, dict(num_modalities=len(img_types), dropout=0.0,
                                lr=1e-4, weight_decay=0.0, label_smoothing=0.0,
                                attn_order={}, img_aug=False,
                                optim_params={"T_max": 1, "eta_min": 0}))
    if config_overrides:
        modify_config(cfg, config_overrides)
    modify_config(cfg, {"img_aug": False})
    from ..ops.layers import apply_config_knobs

    apply_config_knobs(cfg)  # honor gelu_approx etc. saved with the run

    trainer = Trainer(module, cfg, max_epochs=0, mesh=mesh)
    trainer.init_state()
    like = {"params": trainer.params, "opt": trainer.opt_state,
            "epoch": jax.numpy.zeros((), jax.numpy.int32)}
    try:
        state = restore_pytree(checkpoint, like)
    except KeyError:
        # params-only checkpoint (e.g. migrated from a torch state dict via
        # drivers/convert.py — no optimizer moments to restore)
        state = restore_pytree(checkpoint, {"params": trainer.params})
    trainer.params = state["params"]
    if mesh is not None:
        from ..parallel import shard_params

        trainer.params = shard_params(trainer.params, mesh)

    n = len(data_df)
    if mesh is not None:
        data_axis = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
        if batch_size % data_axis:
            raise ValueError(f"batch_size {batch_size} must be divisible by "
                             f"the mesh data axis ({data_axis})")
        # pad the cohort to a full multiple of batch_size so every sharded
        # batch divides evenly; padded rows are trimmed from the outputs
        pad_n = (-n) % batch_size
        if pad_n:
            import pandas as pd

            data_df = pd.concat([data_df, data_df.iloc[:pad_n]])

    ds = BrainDataset(data_df, cfg, types=img_types, is_train=False,
                      folder=folder)
    loader = PrefetchLoader(ds, batch_size=batch_size, num_workers=4,
                            sharding=trainer.data_sharding,
                            transfer_dtype=transfer_dtype_for(cfg))
    logits, targets = trainer.test(loader)
    logits, targets = logits[:n], targets[:n]
    preds = logits.argmax(axis=1)
    metrics = {k: float(v) for k, v in jax.device_get(
        compute_metrics(jax.numpy.asarray(preds),
                        jax.numpy.asarray(targets))).items()}
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs = (probs / probs.sum(1, keepdims=True))[:, 1]
    metrics["auc_roc"] = float(binary_auroc(jax.numpy.asarray(probs),
                                            jax.numpy.asarray(targets)))
    metrics["n"] = int(len(targets))
    return metrics


def _parse_attn_order(text: str) -> dict:
    if not text:
        return {}
    return dict(pair.split(":") for pair in text.split(","))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="evaluate a checkpoint")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", choices=list(_FAMILIES), default="cross")
    p.add_argument("--labels", default="/root/reference/labels.csv")
    p.add_argument("--data", default="/root/reference/ucsf-data")
    p.add_argument("--img-types", nargs="+", default=["DWI", "SWI", "ASL"])
    p.add_argument("--attn-order", default="")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--only-available", action="store_true")
    p.add_argument("--mesh", default="",
                   help="e.g. 'data=4,model=2' for sharded eval")
    args = p.parse_args(argv)

    df = clean_data(load_labels(args.labels), "MGMT status")
    if args.only_available:
        from .experiments import filter_available

        df = filter_available(df, args.data)

    mesh = None
    if args.mesh:
        from ..parallel import make_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        mesh = make_mesh(int(spec.get("data", -1)), int(spec.get("model", 1)))

    overrides = {}
    if args.attn_order:
        overrides["attn_order"] = _parse_attn_order(args.attn_order)
    metrics = evaluate(args.checkpoint, args.model, df, folder=args.data,
                       img_types=tuple(args.img_types),
                       config_overrides=overrides,
                       batch_size=args.batch_size, mesh=mesh)
    print(json.dumps(metrics, indent=1))
    return metrics


if __name__ == "__main__":
    main()
