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
from ..ops.attention import attention_impl, self_attention
from ..ops.layers import (RngStream, dropout, feed_forward, layernorm, linear,
                          promote_input, stochastic_depth_row)
from ..ops.losses import cross_entropy
from ..ops.patchify import num_patches, patchify_3d


def _moe_fields(config: Config) -> tuple[int, int]:
    """(num_experts, every): expert parallelism is on when num_experts > 1.

    config.moe_experts = E swaps the trunk FFNs for a GShard-style MoE
    (parallel/moe.py) — a framework growth path past the reference's dense
    FFN (reference model_cross.py:19-31); `moe_every = k` converts every
    k-th layer (default 1 = all; GShard's convention is 2)."""
    return (int(config.get("moe_experts", 0)),
            max(1, int(config.get("moe_every", 1))))


def _layer_params(kg, H: int, mlp: int, heads: int) -> dict:
    # heads==1 quirk: `to_out = nn.Identity()` when num_heads == 1 and
    # dim_head == hidden_dim (reference modelv3.py:53-57) — see
    # models/model_cross._self_block_params.
    project_out = not (heads == 1 and H // heads == H)
    attn = {"qkv": init_ops.fused_qkv_params(kg(), H, heads)}
    if project_out:
        attn["out"] = init_ops.head_out_params(kg(), H, heads)
    return {
        "attn_norm": init_ops.layernorm_params(H),
        "attn": attn,
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
    moe_experts, moe_every = _moe_fields(config)
    layers = []
    for i in range(config.num_layers):
        lp = _layer_params(kg, H, mlp, config.num_heads)
        if moe_experts > 1 and i % moe_every == moe_every - 1:
            # MoE trunk layer: the ffn subtree becomes router + stacked
            # experts (parallel/moe.py init_moe_ffn); apply detects the
            # "experts" key, and parallel/sharding's experts/* rule shards
            # the stacked kernels over the mesh 'expert' axis.
            from ..parallel.moe import init_moe_ffn

            lp["ffn"] = init_moe_ffn(kg(), H, mlp, moe_experts)
        layers.append(lp)
    if config.get("pipeline_stages", 0) > 1:
        if moe_experts > 1:
            raise ValueError(
                "pipeline_stages does not compose with moe_experts (the "
                "GPipe schedule does not thread the MoE balance loss)")
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
    impl = attention_impl(config)  # 'ring' when config.seq_parallel > 1
    drop_path = config.get("drop_path_rate", 0.0)
    moe_experts, _ = _moe_fields(config)
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

    def ffn_fn(layer, h, local):
        if "experts" in layer["ffn"]:
            # MoE trunk layer (config.moe_experts): GShard routing over the
            # ambient expert mesh (Trainer sets it — parallel/moe.py); output
            # dropout matches the dense FFN's trailing dropout, the internal
            # per-expert GELU path carries none.  Returns the Switch balance
            # loss for the training objective.
            from ..parallel.moe import active_expert_mesh, moe_ffn

            f, aux = moe_ffn(
                layer["ffn"], h,
                num_selected=int(config.get("moe_num_selected", 2)),
                capacity_factor=float(config.get("moe_capacity_factor", 1.25)),
                mesh=active_expert_mesh())
            f = dropout(f, config.dropout, local, train)
            return f, aux["balance_loss"]
        return feed_forward(layer["ffn"], h, config.dropout, local, train,
                            compute_dtype=cdt), jnp.zeros((), jnp.float32)

    def layer_fn_bal(layer, x, key):
        # explicit per-layer key → deterministic dropout under remat recompute
        local = RngStream(key)
        a = self_attention(layer["attn"], layernorm(layer["attn_norm"], x),
                           config.num_heads, config.dropout, local, train,
                           compute_dtype=cdt, impl=impl)
        x = stochastic_depth_row(a, drop_path, local, train) + x
        f, bal = ffn_fn(layer, layernorm(layer["ffn_norm"], x), local)
        x = stochastic_depth_row(f, drop_path, local, train) + x
        return x, bal

    if config.get("remat", False):
        from ..ops.layers import remat_wrap

        layer_fn_bal = remat_wrap(layer_fn_bal, config)

    balance = jnp.zeros((), jnp.float32)
    pp = config.get("pipeline_stages", 0)
    if pp > 1:
        # GPipe over the mesh 'pipe' axis (serial-equivalent fallback when no
        # pipeline mesh is active) — parallel/pipeline.py for the schedule.
        # (init rejects moe_experts + PP, so the dropped balance is always 0.)
        from ..parallel.pipeline import pipeline_layers, stacked_depth

        depth = stacked_depth(params["layers"])
        keys = jax.random.split(rngs() if train else jax.random.key(0), depth)
        x = pipeline_layers(
            params["layers"], lambda l, h, k: layer_fn_bal(l, h, k)[0], x,
            keys, num_microbatches=config.get("pipeline_microbatches", pp))
    else:
        for layer in params["layers"]:
            x, bal = layer_fn_bal(layer, x,
                                  rngs() if train else jax.random.key(0))
            balance = balance + bal

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
    if moe_experts > 1 and train:
        # Switch/GShard auxiliary load-balance term — training objective
        # only, so eval/checkpoint val_loss stays pure CE (comparable with
        # dense runs); mean over the MoE layers (uniform routing → ~1.0
        # regardless of how many layers are converted).
        n_moe = sum(1 for layer in params["layers"]
                    if "experts" in layer["ffn"])
        loss = loss + (float(config.get("moe_balance_weight", 0.01))
                       * balance / max(1, n_moe))
    return logits, loss
