"""Checkpoint migration CLI: torch reference checkpoints ⇄ this framework.

A user of the PyTorch reference brings their trained weights here with one
command — the missing piece around models/convert.py's value-exact mapping:

  # torch/Lightning checkpoint → our npz (+ config JSON for provenance)
  python -m cross_attention_vit_tpu.drivers.convert \
      --torch-ckpt epoch=...ckpt --model cross \
      --img-types DWI SWI ASL --attn-order 0:1,1:2,2:0 --out migrated.npz

  # our checkpoint → reference-shaped torch state dict
  python -m cross_attention_vit_tpu.drivers.convert \
      --checkpoint runs/checkpoints/cross/epoch=..npz --model cross \
      --export --out reference_sd.pt

Accepted torch containers: a bare state_dict, Lightning's
{"state_dict": ...} (the reference trains LightningModules —
main_mist.py:216), and the legacy Trainer's {"model_state_dict": ...}
(other_model.py:341-351).  A "model." key prefix is stripped when present.
The produced npz carries {"params", "epoch"} plus a config JSON beside it,
so `drivers.evaluate --checkpoint migrated.npz` and `drivers.serve` work
directly (both fall back to params-only restore when no optimizer state is
in the file).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..configs import get_mgmt_config, get_mgmt_cross_config, modify_config
from ..models import convert as C
from ..models import model_cross, model_vit
from ..train.checkpoint import load_config_for, restore_pytree, save_pytree

_FAMILIES = {
    "cross": (model_cross, get_mgmt_cross_config,
              C.import_model_cross, C.export_model_cross),
    "vit": (model_vit, get_mgmt_config,
            C.import_model_vit, C.export_model_vit),
}


def _unwrap_state_dict(obj) -> dict:
    """Peel the known torch checkpoint containers down to a flat state dict
    of arrays, stripping a uniform 'model.' prefix if present."""
    for key in ("state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    if not isinstance(obj, dict):
        raise ValueError(f"unrecognized checkpoint container: {type(obj)}")
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
              else np.asarray(v)) for k, v in obj.items()}
    if sd and all(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()}
    return sd


def import_torch_checkpoint(torch_ckpt: str | Path, model: str, cfg,
                            out: str | Path) -> Path:
    """torch checkpoint file → our npz + config JSON; returns the npz path."""
    import torch

    _, _, imp, _ = _FAMILIES[model]
    obj = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
    sd = _unwrap_state_dict(obj)
    params = imp(sd, cfg)
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_pytree(out, {"params": params,
                      "epoch": np.zeros((), np.int32)})
    cfg_dict = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
    (out.parent / f"config_{out.stem}.json").write_text(
        json.dumps(cfg_dict, default=str, indent=1))
    return out


def export_torch_checkpoint(checkpoint: str | Path, model: str, cfg,
                            out: str | Path) -> Path:
    """Our npz → reference-shaped torch state dict (torch.save)."""
    import jax
    import torch

    module, _, _, exp = _FAMILIES[model]
    like = jax.eval_shape(lambda: module.init(jax.random.key(0), cfg))
    params = restore_pytree(checkpoint, {"params": like})["params"]
    sd = exp(jax.tree.map(np.asarray, params), cfg)
    out = Path(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out)
    return out


def _parse_attn_order(text: str) -> dict:
    if not text:
        return {}
    return dict(pair.split(":") for pair in text.split(","))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="migrate checkpoints torch ⇄ JAX")
    p.add_argument("--model", choices=list(_FAMILIES), default="cross")
    p.add_argument("--torch-ckpt", help="torch/Lightning checkpoint to import")
    p.add_argument("--checkpoint", help="our npz (for --export, or as the "
                                        "config source when its JSON exists)")
    p.add_argument("--export", action="store_true",
                   help="reverse direction: our npz → torch state dict")
    p.add_argument("--out", required=True)
    p.add_argument("--img-types", nargs="+", default=["DWI", "SWI", "ASL"])
    p.add_argument("--attn-order", default="")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="config overrides, parsed as Python literals")
    args = p.parse_args(argv)

    _, factory, _, _ = _FAMILIES[args.model]
    cfg = load_config_for(args.checkpoint) if args.checkpoint else None
    if cfg is None:
        cfg = factory()
        modify_config(cfg, dict(
            num_modalities=len(args.img_types), dropout=0.0, lr=1e-4,
            weight_decay=0.0, label_smoothing=0.0, img_aug=False,
            attn_order=_parse_attn_order(args.attn_order),
            optim_params={"T_max": 1, "eta_min": 0}))
    if args.attn_order:
        modify_config(cfg, {"attn_order": _parse_attn_order(args.attn_order)})
    for kv in args.set:
        key, _, value = kv.partition("=")
        import ast

        try:
            value = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            pass
        modify_config(cfg, {key: value})

    if args.export:
        if not args.checkpoint:
            p.error("--export needs --checkpoint")
        out = export_torch_checkpoint(args.checkpoint, args.model, cfg, args.out)
        print(f"exported torch state dict: {out}")
    else:
        if not args.torch_ckpt:
            p.error("import needs --torch-ckpt")
        out = import_torch_checkpoint(args.torch_ckpt, args.model, cfg, args.out)
        print(f"imported checkpoint: {out} (+ config_{Path(out).stem}.json)")


if __name__ == "__main__":
    main()
