"""CNN-stem ViT (v1 legacy family) — UNet-style stem + Conv3d patch embed +
pre-norm encoder + single-logit BCE head.

Capability parity with the reference's model.py `ViT` (broken in the
reference — it reads config keys no config defines, model.py:84-90, 110-141;
here the required keys have defaults so the family actually runs):

  * CNNEncoder (model.py:55-75): DoubleConv(in→c0) then two Down blocks
    (maxpool2 + DoubleConv) → ÷4 spatial, encoder_channels[2] channels —
    conv+ReLU only, no BatchNorm, so this model is stateless;
  * Embeddings (model.py:79-104): Conv3d(c2→hidden_size, kernel=stride=
    patches.grid) patch embed, flatten, CLS (zeros-init) + pos-embed
    (N(0,1) — model.py:89 draws randn and _init_weights never re-draws it);
  * multi-modal fusion by concatenating per-modality embeddings, keeping the
    CLS only from stream 0 (model.py:258);
  * Encoder (model.py:181-214): pre-norm blocks, eps 1e-6 LayerNorms,
    separate biased Q/K/V projections, GELU MLP, final encoder LayerNorm;
  * head: Linear(hidden_size, 1) on the CLS, squeezed → BCEWithLogits
    (model.py:223, 239, 275, 286);
  * optimizer contract: Adam(1e-3) + ReduceLROnPlateau(0.1, patience 5) on
    val_loss (model.py:322-334).

Config keys (with working defaults): hidden_size (128), patches_grid
((8,8,8)), transformer_num_layers (4), transformer_num_heads (8),
transformer_mlp_dim (512), transformer_dropout_rate (0.0),
transformer_attention_dropout_rate (0.0), encoder_channels, down_factor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops import initializers as init_ops
from ..ops.layers import (RngStream, dropout, gelu, layernorm, linear,
                          promote_input)
from ..ops.losses import bce_with_logits
from ..ops.conv import conv3d, max_pool3d, relu


def _defaults(config: Config) -> dict:
    return {
        "hidden_size": config.get("hidden_size", 128),
        "grid": tuple(config.get("patches_grid", (8, 8, 8))),
        "num_layers": config.get("transformer_num_layers", 4),
        "num_heads": config.get("transformer_num_heads", 8),
        "mlp_dim": config.get("transformer_mlp_dim", 512),
        "drop": config.get("transformer_dropout_rate", 0.0),
        "attn_drop": config.get("transformer_attention_dropout_rate", 0.0),
    }


def _double_conv_init(kg, cin, cout):
    def conv(ci, co):
        return {"kernel": init_ops.kaiming_normal_fan_out(
                    kg(), (co, ci, 3, 3, 3), fan_out=co * 27),
                "bias": init_ops.zeros((co,))}
    return {"conv1": conv(cin, cout), "conv2": conv(cout, cout)}


def _double_conv_apply(p, x):
    x = relu(conv3d(p["conv1"], x, padding=1))
    return relu(conv3d(p["conv2"], x, padding=1))


def _block_init(kg, H, mlp):
    return {
        "attn_norm": init_ops.layernorm_params(H),
        "q": init_ops.linear_params(kg(), H, H, init=init_ops.xavier_normal),
        "k": init_ops.linear_params(kg(), H, H, init=init_ops.xavier_normal),
        "v": init_ops.linear_params(kg(), H, H, init=init_ops.xavier_normal),
        "out": init_ops.linear_params(kg(), H, H, init=init_ops.xavier_normal),
        "ffn_norm": init_ops.layernorm_params(H),
        "fc1": init_ops.linear_params(kg(), H, mlp, init=init_ops.xavier_normal),
        "fc2": init_ops.linear_params(kg(), mlp, H, init=init_ops.xavier_normal),
    }


def _block_apply(p, x, heads, drop, attn_drop, rng, train):
    # pre-norm attention with separate Q/K/V (model.py:124-178, 190-201)
    h = layernorm(p["attn_norm"], x, eps=1e-6)
    B, N, C = h.shape
    d = C // heads

    def split(t):
        return t.reshape(B, N, heads, d).transpose(0, 2, 1, 3)

    q, k, v = (split(linear(p[n], h)) for n in ("q", "k", "v"))
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) / jnp.sqrt(float(d))
    attn = jax.nn.softmax(dots, axis=-1)
    attn = dropout(attn, attn_drop, rng, train).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(B, N, C)
    o = dropout(linear(p["out"], o), attn_drop, rng, train)
    x = x + o

    h = layernorm(p["ffn_norm"], x, eps=1e-6)
    h = dropout(gelu(linear(p["fc1"], h)), drop, rng, train)
    h = dropout(linear(p["fc2"], h), drop, rng, train)
    return x + h


def init(key: jax.Array, config: Config):
    d = _defaults(config)
    H = d["hidden_size"]
    c0, c1, c2 = config.encoder_channels
    D, Hh, W = config.img_size
    down = 2 ** config.down_factor
    g = d["grid"]
    n_patches = (D // (down * g[0])) * (Hh // (down * g[1])) * (W // (down * g[2]))

    kg = init_ops.KeyGen(key)
    params = {
        "stem": {
            "inc": _double_conv_init(kg, config.in_channels, c0),
            "down1": _double_conv_init(kg, c0, c1),
            "down2": _double_conv_init(kg, c1, c2),
        },
        "patch_embed": {
            "kernel": init_ops.kaiming_normal_fan_out(
                kg(), (H, c2) + g, fan_out=H * g[0] * g[1] * g[2]),
            "bias": init_ops.zeros((H,)),
        },
        "cls_token": init_ops.zeros((1, 1, H)),      # model.py:88 zeros
        "pos_embed": jax.random.normal(kg(), (1, n_patches + 1, H)),  # N(0,1)
        "blocks": [_block_init(kg, H, d["mlp_dim"]) for _ in range(d["num_layers"])],
        "encoder_norm": init_ops.layernorm_params(H),
        "final": init_ops.linear_params(kg(), H, 1, init=init_ops.xavier_normal),
    }
    return params


def _embed(params, config, d, vol, rng, train):
    """CNN stem → Conv3d patch embed → CLS + pos (model.py:91-104)."""
    h = _double_conv_apply(params["stem"]["inc"], vol)
    h = _double_conv_apply(params["stem"]["down1"], max_pool3d(h, 2))
    h = _double_conv_apply(params["stem"]["down2"], max_pool3d(h, 2))
    h = conv3d(params["patch_embed"], h, stride=d["grid"])
    B, C = h.shape[0], h.shape[1]
    h = h.reshape(B, C, -1).transpose(0, 2, 1)     # (B, N, H)
    cls = jnp.broadcast_to(params["cls_token"].astype(h.dtype), (B, 1, C))
    h = jnp.concatenate([cls, h], axis=1)
    return h + params["pos_embed"].astype(h.dtype)


def apply(params: dict, config: Config, img: jax.Array,
          labels: jax.Array | None = None, train: bool = False,
          rng: jax.Array | None = None):
    """img (B, M, C, D, H, W) → logits (B,) [single BCE logit], loss?"""
    img = promote_input(img)
    d = _defaults(config)
    rngs = RngStream(rng)
    M = img.shape[1]

    streams = [_embed(params, config, d, img[:, m], rngs, train)
               for m in range(M)]
    # CLS kept only from stream 0; other streams contribute patch tokens
    x = jnp.concatenate([streams[0]] + [s[:, 1:] for s in streams[1:]], axis=1)

    for blk in params["blocks"]:
        x = _block_apply(blk, x, d["num_heads"], d["drop"], d["attn_drop"],
                         rngs, train)
    x = layernorm(params["encoder_norm"], x, eps=1e-6)

    logits = linear(params["final"], x[:, 0])[:, 0].astype(jnp.float32)
    if labels is None:
        return logits
    return logits, bce_with_logits(logits, labels)
