"""ModelVIT — single-stream 3D ViT baseline.

TPU-native re-design of the reference baseline (reference modelv3.py:90-176):
all modalities' patch tokens are embedded with one shared Linear and
concatenated into one sequence plus one CLS token; pos-embedding spans
`num_patches·M + 1`; `num_layers` pre-norm transformer blocks each wrap their
residual branches in row-mode StochasticDepth (rates hardwired 0 in the
reference, modelv3.py:74 — configurable here via `drop_path_rate`); the head
is LayerNorm→Linear(H→mlp)→GELU→Dropout→Linear(mlp→classes)→Dropout on CLS;
loss is plain cross-entropy (no smoothing wired, modelv3.py:146).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops import initializers as init_ops
from ..ops.attention import self_attention
from ..ops.layers import (RngStream, dropout, feed_forward, layernorm, linear,
                          promote_input, stochastic_depth_row)
from ..ops.losses import cross_entropy
from ..ops.patchify import num_patches, patchify_3d


def _layer_params(kg, H: int, mlp: int, heads: int) -> dict:
    return {
        "attn_norm": init_ops.layernorm_params(H),
        "attn": {
            "qkv": init_ops.fused_qkv_params(kg(), H, heads),
            "out": init_ops.head_out_params(kg(), H, heads),
        },
        "ffn_norm": init_ops.layernorm_params(H),
        "ffn": {
            "fc1": init_ops.linear_params(kg(), H, mlp),
            "fc2": init_ops.linear_params(kg(), mlp, H),
        },
    }


def init(key: jax.Array, config: Config) -> dict:
    assert all(config.img_size[i] % config.patch_size[i] == 0 for i in range(3)), \
        "image dimensions must be divisible by the patch size"
    H, mlp = config.hidden_dim, config.mlp_dim
    N = num_patches(config.img_size, config.patch_size) * config.num_modalities
    p1, p2, p3 = config.patch_size
    patch_dim = p1 * p2 * p3 * config.in_channels

    kg = init_ops.KeyGen(key)
    layers = [_layer_params(kg, H, mlp, config.num_heads)
              for _ in range(config.num_layers)]
    if config.get("pipeline_stages", 0) > 1:
        # PP layout: per-layer trees stacked on a leading depth axis so the
        # trunk shards over the mesh 'pipe' axis (parallel/pipeline.py);
        # Adam is elementwise, so optimizer state inherits the layout.
        from ..parallel.pipeline import stack_layers

        layers = stack_layers(layers)
    return {
        "pos_embedding": init_ops.trunc_or_normal_02(kg(), (1, N + 1, H)),
        "cls_token": init_ops.trunc_or_normal_02(kg(), (1, 1, H)),
        "patch_to_embedding": init_ops.linear_params(kg(), patch_dim, H),
        "layers": layers,
        "head": {
            "norm": init_ops.layernorm_params(H),
            "fc1": init_ops.linear_params(kg(), H, mlp),
            "fc2": init_ops.linear_params(kg(), mlp, config.num_classes),
        },
    }


def apply(params: dict, config: Config, img: jax.Array,
          labels: jax.Array | None = None, train: bool = False,
          rng: jax.Array | None = None):
    """Forward pass: img (B, M, C, D, H, W) → logits (B, num_classes) or
    (logits, loss) when labels given (reference modelv3.py:123-147)."""
    img = promote_input(img)
    cdt = jnp.dtype(config.compute_dtype) if config.compute_dtype != "float32" else None
    # activation storage dtype between ops: bfloat16 halves the HBM traffic
    # of every elementwise op (LN/GELU/dropout/residual) while matmuls keep
    # f32 accumulation (ops.layers.linear) and softmax/LN internals stay f32.
    # float32 (default) preserves the parity contract bit-for-bit.
    adt = jnp.dtype(config.get("activation_dtype", "float32"))
    impl = "flash" if config.use_flash_attention else "xla"
    drop_path = config.get("drop_path_rate", 0.0)
    rngs = RngStream(rng)
    B, M = img.shape[0], img.shape[1]

    tokens = []
    for m in range(M):
        x = patchify_3d(img[:, m], config.patch_size).astype(adt)
        tokens.append(linear(params["patch_to_embedding"], x, cdt))
    x = jnp.concatenate(tokens, axis=1)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(x.dtype)
    x = dropout(x, config.dropout, rngs, train)

    def layer_fn(layer, x, key):
        # explicit per-layer key → deterministic dropout under remat recompute
        local = RngStream(key)
        a = self_attention(layer["attn"], layernorm(layer["attn_norm"], x),
                           config.num_heads, config.dropout, local, train,
                           compute_dtype=cdt, impl=impl)
        x = stochastic_depth_row(a, drop_path, local, train) + x
        f = feed_forward(layer["ffn"], layernorm(layer["ffn_norm"], x),
                         config.dropout, local, train, compute_dtype=cdt)
        x = stochastic_depth_row(f, drop_path, local, train) + x
        return x

    if config.get("remat", False):
        from ..ops.layers import remat_wrap

        layer_fn = remat_wrap(layer_fn, config)

    pp = config.get("pipeline_stages", 0)
    if pp > 1:
        # GPipe over the mesh 'pipe' axis (serial-equivalent fallback when no
        # pipeline mesh is active) — parallel/pipeline.py for the schedule.
        from ..parallel.pipeline import pipeline_layers, stacked_depth

        depth = stacked_depth(params["layers"])
        keys = jax.random.split(rngs() if train else jax.random.key(0), depth)
        x = pipeline_layers(
            params["layers"], layer_fn, x, keys,
            num_microbatches=config.get("pipeline_microbatches", pp))
    else:
        for layer in params["layers"]:
            x = layer_fn(layer, x, rngs() if train else jax.random.key(0))

    h = params["head"]
    cls_out = layernorm(h["norm"], x[:, 0])
    cls_out = linear(h["fc1"], cls_out, cdt)
    cls_out = jax.nn.gelu(cls_out, approximate=False)
    cls_out = dropout(cls_out, config.dropout, rngs, train)
    cls_out = linear(h["fc2"], cls_out, cdt)
    logits = dropout(cls_out, config.dropout, rngs, train).astype(jnp.float32)

    if labels is None:
        return logits
    loss = cross_entropy(logits, labels)  # no label smoothing (modelv3.py:146)
    return logits, loss
