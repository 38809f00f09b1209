"""torch ⇄ JAX weight conversion for the live model families.

Lets a user of the PyTorch reference migrate trained checkpoints: a torch
`state_dict` (as numpy arrays — `{k: v.numpy() for k, v in sd.items()}`)
imports into our param trees, and our params export back to reference-shaped
state dicts.

Key-name mapping follows the reference module trees exactly
(model_cross.py:152-185, modelv3.py:90-122):

  ModelCross                                ours
  ------------------------------------------------------------------
  pos_embedding / cls_token                 pos_embedding / cls_token
  patch_to_embedding.{weight,bias}          patch_to_embedding (kernel=Wᵀ)
  transformer.{b}.blocks.{m}.{j}.attn.*     multi_blocks[b].self_blocks[m][j]
      .norm.{weight,bias}                     .attn_norm
      .fn.to_qkv.weight (3H, H)               .attn.qkv.kernel (H,3,K,D)
      .fn.to_out.0.{weight,bias}              .attn.out (K,D,H)
  transformer.{b}.blocks.{m}.{j}.ffn.*        .ffn_norm / .ffn.fc1/.fc2
  transformer.{b}.fusion.{c}.attn.fn.wq/wk/wv/proj
                                            multi_blocks[b].cross_blocks[c].attn
  norm.{m}.* / mlp_head.{m}.{0,3}.*         norm[m] / mlp_head[m].fc1/.fc2

  ModelVIT: transformer.layers.{i}.{0,2}.* → layers[i]; head Sequential
  indices {0: LayerNorm, 1: fc1, 4: fc2} → head.

The heads-axis layouts are pure reshapes of the torch 2-D weights (see
ops/initializers.py), so conversion is exact (no renumbering of values).
"""

from __future__ import annotations

import numpy as np

from ..configs import Config


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _qkv_in(w, heads: int) -> np.ndarray:
    """torch to_qkv.weight (3H, H) → (H, 3, K, D)."""
    w = np.asarray(w)
    H = w.shape[1]
    return _t(w).reshape(H, 3, heads, H // heads)


def _qkv_out(k) -> np.ndarray:
    k = np.asarray(k)
    H = k.shape[0]
    return np.ascontiguousarray(k.reshape(H, -1).T)


def _head_in(w, heads: int) -> np.ndarray:
    """torch (H, H) weight → (H, K, D)."""
    w = np.asarray(w)
    H = w.shape[1]
    return _t(w).reshape(H, heads, H // heads)


def _head_out(w, heads: int) -> np.ndarray:
    """torch (H, H) weight → (K, D, H) (input axis is the merged heads)."""
    w = np.asarray(w)
    H = w.shape[1]
    return _t(w).reshape(heads, H // heads, H)


def _linear(sd, prefix: str) -> dict:
    p = {"kernel": _t(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _norm(sd, prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _self_block_from(sd, p: str, heads: int) -> dict:
    return {
        "attn_norm": _norm(sd, f"{p}.attn.norm"),
        "attn": {
            "qkv": {"kernel": _qkv_in(sd[f"{p}.attn.fn.to_qkv.weight"], heads)},
            "out": {"kernel": _head_out(sd[f"{p}.attn.fn.to_out.0.weight"], heads),
                    "bias": np.asarray(sd[f"{p}.attn.fn.to_out.0.bias"])},
        },
        "ffn_norm": _norm(sd, f"{p}.ffn.norm"),
        "ffn": {"fc1": _linear(sd, f"{p}.ffn.fn.net.0"),
                "fc2": _linear(sd, f"{p}.ffn.fn.net.3")},
    }


def import_model_cross(sd: dict, config: Config) -> dict:
    """torch ModelCross state_dict → model_cross param tree."""
    heads = config.num_heads
    M = config.num_modalities
    params = {
        "pos_embedding": np.asarray(sd["pos_embedding"]),
        "cls_token": np.asarray(sd["cls_token"]),
        "patch_to_embedding": _linear(sd, "patch_to_embedding"),
        "multi_blocks": [],
        "norm": [_norm(sd, f"norm.{m}") for m in range(M)],
        "mlp_head": [{"fc1": _linear(sd, f"mlp_head.{m}.0"),
                      "fc2": _linear(sd, f"mlp_head.{m}.3")}
                     for m in range(M)],
    }
    n_cross = len([k for k in sd if k.startswith("transformer.0.fusion.")
                   and k.endswith("attn.fn.wq.weight")])
    for b in range(config.num_multi_blocks):
        block = {
            "self_blocks": [
                [_self_block_from(sd, f"transformer.{b}.blocks.{m}.{j}", heads)
                 for j in range(config.num_self_blocks)]
                for m in range(M)
            ],
            "cross_blocks": [],
        }
        for c in range(n_cross):
            p = f"transformer.{b}.fusion.{c}"
            block["cross_blocks"].append({
                "attn_norm": _norm(sd, f"{p}.attn.norm"),
                "attn": {
                    **{name: {"kernel": _head_in(sd[f"{p}.attn.fn.{name}.weight"], heads),
                              "bias": np.asarray(sd[f"{p}.attn.fn.{name}.bias"])
                              .reshape(heads, -1)}
                       for name in ("wq", "wk", "wv")},
                    "proj": {"kernel": _head_out(sd[f"{p}.attn.fn.proj.weight"], heads),
                             "bias": np.asarray(sd[f"{p}.attn.fn.proj.bias"])},
                },
                "ffn_norm": _norm(sd, f"{p}.ffn.norm"),
                "ffn": {"fc1": _linear(sd, f"{p}.ffn.fn.net.0"),
                        "fc2": _linear(sd, f"{p}.ffn.fn.net.3")},
            })
        params["multi_blocks"].append(block)
    return params


def import_model_vit(sd: dict, config: Config) -> dict:
    """torch ModelVIT state_dict → model_vit param tree."""
    heads = config.num_heads
    return {
        "pos_embedding": np.asarray(sd["pos_embedding"]),
        "cls_token": np.asarray(sd["cls_token"]),
        "patch_to_embedding": _linear(sd, "patch_to_embedding"),
        "layers": [
            {
                "attn_norm": _norm(sd, f"transformer.layers.{i}.0.norm"),
                "attn": {
                    "qkv": {"kernel": _qkv_in(
                        sd[f"transformer.layers.{i}.0.fn.to_qkv.weight"], heads)},
                    "out": {"kernel": _head_out(
                        sd[f"transformer.layers.{i}.0.fn.to_out.0.weight"], heads),
                        "bias": np.asarray(
                            sd[f"transformer.layers.{i}.0.fn.to_out.0.bias"])},
                },
                "ffn_norm": _norm(sd, f"transformer.layers.{i}.2.norm"),
                "ffn": {"fc1": _linear(sd, f"transformer.layers.{i}.2.fn.net.0"),
                        "fc2": _linear(sd, f"transformer.layers.{i}.2.fn.net.3")},
            }
            for i in range(config.num_layers)
        ],
        "head": {
            "norm": _norm(sd, "mlp_head.0"),
            "fc1": _linear(sd, "mlp_head.1"),
            "fc2": _linear(sd, "mlp_head.4"),
        },
    }


# ---------------------------------------------------------------------------
# export (ours → reference-shaped state dict)
# ---------------------------------------------------------------------------

def _exp_linear(p: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _t(p["kernel"])
    if "bias" in p:
        out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_norm(p: dict, prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["scale"])
    out[f"{prefix}.bias"] = np.asarray(p["bias"])


def _exp_self_block(blk: dict, p: str, out: dict) -> None:
    _exp_norm(blk["attn_norm"], f"{p}.attn.norm", out)
    q = np.asarray(blk["attn"]["qkv"]["kernel"])
    out[f"{p}.attn.fn.to_qkv.weight"] = _t(q.reshape(q.shape[0], -1))
    o = np.asarray(blk["attn"]["out"]["kernel"])
    out[f"{p}.attn.fn.to_out.0.weight"] = _t(o.reshape(-1, o.shape[-1]))
    out[f"{p}.attn.fn.to_out.0.bias"] = np.asarray(blk["attn"]["out"]["bias"])
    _exp_norm(blk["ffn_norm"], f"{p}.ffn.norm", out)
    _exp_linear(blk["ffn"]["fc1"], f"{p}.ffn.fn.net.0", out)
    _exp_linear(blk["ffn"]["fc2"], f"{p}.ffn.fn.net.3", out)


def export_model_cross(params: dict, config: Config) -> dict:
    out = {
        "pos_embedding": np.asarray(params["pos_embedding"]),
        "cls_token": np.asarray(params["cls_token"]),
    }
    _exp_linear(params["patch_to_embedding"], "patch_to_embedding", out)
    for b, block in enumerate(params["multi_blocks"]):
        for m, stack in enumerate(block["self_blocks"]):
            for j, blk in enumerate(stack):
                _exp_self_block(blk, f"transformer.{b}.blocks.{m}.{j}", out)
        for c, blk in enumerate(block["cross_blocks"]):
            p = f"transformer.{b}.fusion.{c}"
            _exp_norm(blk["attn_norm"], f"{p}.attn.norm", out)
            for name in ("wq", "wk", "wv"):
                k = np.asarray(blk["attn"][name]["kernel"])
                out[f"{p}.attn.fn.{name}.weight"] = _t(k.reshape(k.shape[0], -1))
                out[f"{p}.attn.fn.{name}.bias"] = np.asarray(
                    blk["attn"][name]["bias"]).reshape(-1)
            pk = np.asarray(blk["attn"]["proj"]["kernel"])
            out[f"{p}.attn.fn.proj.weight"] = _t(pk.reshape(-1, pk.shape[-1]))
            out[f"{p}.attn.fn.proj.bias"] = np.asarray(blk["attn"]["proj"]["bias"])
            _exp_norm(blk["ffn_norm"], f"{p}.ffn.norm", out)
            _exp_linear(blk["ffn"]["fc1"], f"{p}.ffn.fn.net.0", out)
            _exp_linear(blk["ffn"]["fc2"], f"{p}.ffn.fn.net.3", out)
    for m, n in enumerate(params["norm"]):
        _exp_norm(n, f"norm.{m}", out)
    for m, head in enumerate(params["mlp_head"]):
        _exp_linear(head["fc1"], f"mlp_head.{m}.0", out)
        _exp_linear(head["fc2"], f"mlp_head.{m}.3", out)
    return out


def export_model_vit(params: dict, config: Config) -> dict:
    out = {
        "pos_embedding": np.asarray(params["pos_embedding"]),
        "cls_token": np.asarray(params["cls_token"]),
    }
    _exp_linear(params["patch_to_embedding"], "patch_to_embedding", out)
    for i, blk in enumerate(params["layers"]):
        _exp_norm(blk["attn_norm"], f"transformer.layers.{i}.0.norm", out)
        q = np.asarray(blk["attn"]["qkv"]["kernel"])
        out[f"transformer.layers.{i}.0.fn.to_qkv.weight"] = \
            _t(q.reshape(q.shape[0], -1))
        o = np.asarray(blk["attn"]["out"]["kernel"])
        out[f"transformer.layers.{i}.0.fn.to_out.0.weight"] = \
            _t(o.reshape(-1, o.shape[-1]))
        out[f"transformer.layers.{i}.0.fn.to_out.0.bias"] = \
            np.asarray(blk["attn"]["out"]["bias"])
        _exp_norm(blk["ffn_norm"], f"transformer.layers.{i}.2.norm", out)
        _exp_linear(blk["ffn"]["fc1"], f"transformer.layers.{i}.2.fn.net.0", out)
        _exp_linear(blk["ffn"]["fc2"], f"transformer.layers.{i}.2.fn.net.3", out)
    _exp_norm(params["head"]["norm"], "mlp_head.0", out)
    _exp_linear(params["head"]["fc1"], "mlp_head.1", out)
    _exp_linear(params["head"]["fc2"], "mlp_head.4", out)
    return out
