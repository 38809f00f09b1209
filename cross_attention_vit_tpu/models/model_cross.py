"""ModelCross — multi-stream ViT with CLS-token cross-attention fusion.

TPU-native re-design of the reference's namesake model
(reference model_cross.py:152-241):

  * one shared patch embedding, CLS token, and positional embedding applied to
    every modality stream (model_cross.py:167-169, 193-198);
  * `num_multi_blocks` MultiScaleBlocks, each holding per-modality stacks of
    `num_self_blocks` pre-norm self-attention blocks plus one CLS-query
    cross-attention block per `attn_order` entry (model_cross.py:116-148);
  * in a cross block only the CLS is the query; the attention residual adds
    the CLS slice (model_cross.py:112) and the fused CLS is re-concatenated
    with its own stream's patch tokens (model_cross.py:140-142);
  * per-modality LayerNorm + MLP heads on CLS, logits averaged over
    modalities, cross-entropy with label smoothing (model_cross.py:203-212).

Functional style: `init(key, config) -> params`, `apply(params, config, img,
labels, train, rng) -> (logits, loss)`.  Python loops over modalities/blocks
unroll at trace time (M ≤ 3, 2 blocks), leaving XLA a flat GEMM pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops import initializers as init_ops
from ..ops.attention import (attention_impl, cross_attention_cls,
                             self_attention)
from ..ops.layers import (RngStream, dropout, feed_forward, layernorm,
                          linear, mlp_head, promote_input)
from ..ops.losses import cross_entropy
from ..ops.patchify import num_patches, patchify_3d


def _reject_removed_stacked_streams(config: Config) -> None:
    """`config.stacked_streams` was REMOVED in round 5: (M·B)-batched trunk
    ops with stacked per-stream weights measured slower than the plain
    per-stream loop twice on v5e (apply-time stacking +7 ms, docs/PERF_r03.md;
    init-time pre-stacked params +4.2 ms, docs/PERF_r05.md).  Reject instead
    of silently ignoring so configs saved by round-3/4 checkpoints fail
    loudly."""
    if config.get("stacked_streams", False):
        raise ValueError(
            "config.stacked_streams was removed (measured negative twice on "
            "v5e; see docs/PERF_r05.md) — drop the flag: the per-stream "
            "trunk loop IS the fast path")


def _attn_pairs(config: Config) -> list[tuple[int, int]]:
    """Cross-attention routing as (cls_stream, token_stream) pairs, in the
    ascending-stream order the reference iterates (model_cross.py:135-144)."""
    order = config.attn_order
    pairs = []
    for i in range(config.num_modalities):
        if str(i) in order:
            j = int(order[str(i)])
            if not 0 <= j < config.num_modalities:
                raise ValueError(
                    f"attn_order[{i!r}] = {j} is out of range for "
                    f"num_modalities={config.num_modalities}")
            pairs.append((i, j))
    return pairs


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _self_block_params(kg, H: int, mlp: int, heads: int,
                       moe_experts: int = 0) -> dict:
    # heads==1 quirk: `to_out = nn.Identity()` when num_heads == 1 and
    # dim_head == hidden_dim (reference model_cross.py:37,45-48) — dim_head
    # is H // heads, so heads==1 always triggers it; the "out" params are
    # omitted and ops.attention.self_attention skips projection + dropout.
    project_out = not (heads == 1 and H // heads == H)
    attn = {"qkv": init_ops.fused_qkv_params(kg(), H, heads)}
    if project_out:
        attn["out"] = init_ops.head_out_params(kg(), H, heads)
    if moe_experts > 1:
        # MoE stream-trunk layer (config.moe_experts, same convention as
        # model_vit): the ffn subtree becomes router + stacked experts
        # (parallel/moe.py init_moe_ffn); apply detects the "experts" key and
        # parallel/sharding's experts/* rule shards the stacked kernels over
        # the mesh 'expert' axis.  Each STREAM keeps its own experts+router —
        # consistent with the reference's per-modality FFN weights
        # (model_cross.py:19-31, 122).
        from ..parallel.moe import init_moe_ffn

        ffn = init_moe_ffn(kg(), H, mlp, moe_experts)
    else:
        ffn = {
            "fc1": init_ops.linear_params(kg(), H, mlp),
            "fc2": init_ops.linear_params(kg(), mlp, H),
        }
    return {
        "attn_norm": init_ops.layernorm_params(H),
        "attn": attn,
        "ffn_norm": init_ops.layernorm_params(H),
        "ffn": ffn,
    }


def _cross_block_params(kg, H: int, mlp: int, heads: int) -> dict:
    return {
        "attn_norm": init_ops.layernorm_params(H),
        "attn": {
            "wq": init_ops.head_in_params(kg(), H, heads),
            "wk": init_ops.head_in_params(kg(), H, heads),
            "wv": init_ops.head_in_params(kg(), H, heads),
            "proj": init_ops.head_out_params(kg(), H, heads),
        },
        "ffn_norm": init_ops.layernorm_params(H),
        "ffn": {
            "fc1": init_ops.linear_params(kg(), H, mlp),
            "fc2": init_ops.linear_params(kg(), mlp, H),
        },
    }


def init(key: jax.Array, config: Config) -> dict:
    """Build the parameter pytree.

    Inits match the reference distributions: xavier-uniform Linears with zero
    bias, ones/zeros LayerNorm, N(0, 0.02) pos-embedding and CLS
    (model_cross.py:214-241).
    """
    assert all(config.img_size[i] % config.patch_size[i] == 0 for i in range(3)), \
        "image dimensions must be divisible by the patch size"
    H, mlp = config.hidden_dim, config.mlp_dim
    M = config.num_modalities
    N = num_patches(config.img_size, config.patch_size)
    p1, p2, p3 = config.patch_size
    patch_dim = p1 * p2 * p3 * config.in_channels

    from .model_vit import _moe_fields

    _reject_removed_stacked_streams(config)
    moe_experts, moe_every = _moe_fields(config)

    def _site_experts(mb: int, layer: int) -> int:
        # per-stream depth index mb·num_self_blocks + layer, converted every
        # moe_every-th layer (model_vit convention); cross-block FFNs stay
        # dense — they see one CLS token per step, so GShard routing would
        # dispatch a single token per batch row (all capacity, no sparsity).
        idx = mb * config.num_self_blocks + layer
        on = moe_experts > 1 and idx % moe_every == moe_every - 1
        return moe_experts if on else 0

    kg = init_ops.KeyGen(key)
    params = {
        "pos_embedding": init_ops.trunc_or_normal_02(kg(), (1, N + 1, H)),
        "cls_token": init_ops.trunc_or_normal_02(kg(), (1, 1, H)),
        "patch_to_embedding": init_ops.linear_params(kg(), patch_dim, H),
        "multi_blocks": [
            {
                "self_blocks": [
                    [_self_block_params(kg, H, mlp, config.num_heads,
                                        moe_experts=_site_experts(mb, layer))
                     for layer in range(config.num_self_blocks)]
                    for _ in range(M)
                ],
                "cross_blocks": [
                    _cross_block_params(kg, H, mlp, config.num_heads)
                    for _ in _attn_pairs(config)
                ],
            }
            for mb in range(config.num_multi_blocks)
        ],
        "norm": [init_ops.layernorm_params(H) for _ in range(M)],
        "mlp_head": [
            {
                "fc1": init_ops.linear_params(kg(), H, mlp),
                "fc2": init_ops.linear_params(kg(), mlp, config.num_classes),
            }
            for _ in range(M)
        ],
    }
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _self_block(p: dict, x: jax.Array, config: Config, rng: RngStream,
                train: bool, cdt, impl: str) -> tuple[jax.Array, jax.Array]:
    """Pre-norm self-attention block (reference model_cross.py:64-72).

    Returns (x, balance_loss) — balance is the Switch/GShard auxiliary term
    when the FFN site is MoE (config.moe_experts, same detection convention
    as model_vit.apply), else a zero scalar."""
    x = self_attention(p["attn"], layernorm(p["attn_norm"], x),
                       config.num_heads, config.dropout, rng, train,
                       compute_dtype=cdt, impl=impl) + x
    h = layernorm(p["ffn_norm"], x)
    if "experts" in p["ffn"]:
        from ..parallel.moe import active_expert_mesh, moe_ffn

        f, aux = moe_ffn(
            p["ffn"], h,
            num_selected=int(config.get("moe_num_selected", 2)),
            capacity_factor=float(config.get("moe_capacity_factor", 1.25)),
            mesh=active_expert_mesh())
        f = dropout(f, config.dropout, rng, train)
        return f + x, aux["balance_loss"]
    f = feed_forward(p["ffn"], h, config.dropout, rng, train,
                     compute_dtype=cdt)
    return f + x, jnp.zeros((), jnp.float32)


def _cross_block(p: dict, x: jax.Array, config: Config, rng: RngStream,
                 train: bool, cdt) -> jax.Array:
    """CLS-query cross block; attention residual is the CLS slice only
    (reference model_cross.py:104-114)."""
    fused = cross_attention_cls(p["attn"], layernorm(p["attn_norm"], x),
                                config.num_heads, config.dropout, rng, train,
                                compute_dtype=cdt) + x[:, 0:1]
    fused = feed_forward(p["ffn"], layernorm(p["ffn_norm"], fused),
                         config.dropout, rng, train, compute_dtype=cdt) + fused
    return fused  # (B, 1, H)


def _multi_scale_block(p: dict, streams: list[jax.Array], config: Config,
                       rng: RngStream, train: bool, cdt,
                       impl: str) -> tuple[list[jax.Array], jax.Array]:
    """Per-stream self-attention stacks then attn_order-routed CLS fusion
    (reference model_cross.py:128-148).  Returns (streams, balance_loss).

    The M per-stream stacks run as separate batch-B ops on purpose: batching
    them into (M·B)-batch ops with stacked weights ('stacked_streams') was
    measured NEGATIVE twice on v5e — +7 ms at cross8 with apply-time weight
    stacking (docs/PERF_r03.md) and +4.2 ms with init-time pre-stacked params
    (docs/PERF_r05.md) — and the feature was removed in round 5."""
    remat = bool(config.get("remat", False))
    balance = jnp.zeros((), jnp.float32)

    def blk_fn(blk_params, x, key):
        # a fresh RngStream per block keyed by an explicit argument keeps
        # dropout deterministic under jax.checkpoint's backward recompute
        return _self_block(blk_params, x, config, RngStream(key), train,
                           cdt, impl)

    if remat:
        from ..ops.layers import remat_wrap

        blk_fn = remat_wrap(blk_fn, config)

    attn = []
    for m, x in enumerate(streams):
        for blk in p["self_blocks"][m]:
            x, bal = blk_fn(blk, x, rng() if train else jax.random.key(0))
            balance = balance + bal
        attn.append(x)

    routing = dict(_attn_pairs(config))  # validated (cls_stream -> token_stream)
    outs = []
    cross_count = 0
    for i in range(len(attn)):
        if i in routing:
            j = routing[i]
            tmp = jnp.concatenate([attn[i][:, 0:1], attn[j][:, 1:]], axis=1)
            tmp = _cross_block(p["cross_blocks"][cross_count], tmp, config, rng, train, cdt)
            outs.append(jnp.concatenate([tmp, attn[i][:, 1:]], axis=1))
            cross_count += 1
        else:
            outs.append(attn[i])
    return outs, balance


def apply(params: dict, config: Config, img: jax.Array,
          labels: jax.Array | None = None, train: bool = False,
          rng: jax.Array | None = None):
    """Forward pass.

    img: (B, M, C, D, H, W) float; labels: (B,) int.
    Returns logits (B, num_classes), or (logits, loss) when labels given —
    mirroring `forward(img, labels) -> (x, loss)` (model_cross.py:186-212).
    """
    img = promote_input(img)
    cdt = jnp.dtype(config.compute_dtype) if config.compute_dtype != "float32" else None
    # activation storage dtype (see model_vit.apply): bf16 halves elementwise
    # HBM traffic; matmul accumulation stays f32; default f32 = exact parity
    adt = jnp.dtype(config.get("activation_dtype", "float32"))
    # config.seq_parallel > 1 → 'ring' (sequence parallelism over the 'seq'
    # mesh axis); only the per-stream SELF attention rides the ring — the
    # CLS-query cross attention is a 1×N sliver (GSPMD gathers its keys)
    impl = attention_impl(config)
    _reject_removed_stacked_streams(config)
    rngs = RngStream(rng)
    B = img.shape[0]
    M = img.shape[1]

    streams = []
    for m in range(M):
        x = patchify_3d(img[:, m], config.patch_size).astype(adt)
        x = linear(params["patch_to_embedding"], x, cdt)
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + params["pos_embedding"].astype(x.dtype)
        x = dropout(x, config.dropout, rngs, train)
        streams.append(x)

    balance = jnp.zeros((), jnp.float32)
    for block in params["multi_blocks"]:
        streams, bal = _multi_scale_block(block, streams, config, rngs, train,
                                          cdt, impl)
        balance = balance + bal

    streams = [layernorm(params["norm"][i], streams[i]) for i in range(M)]
    per_mod_logits = [
        mlp_head(params["mlp_head"][i], streams[i][:, 0], config.dropout,
                 rngs, train, compute_dtype=cdt)
        for i in range(M)
    ]
    logits = jnp.mean(jnp.stack(per_mod_logits), axis=0).astype(jnp.float32)

    if labels is None:
        return logits
    loss = cross_entropy(logits, labels, config.label_smoothing)
    if int(config.get("moe_experts", 0)) > 1 and train:
        # Switch/GShard auxiliary load-balance term — TRAIN objective only
        # (eval/checkpoint val_loss stays pure CE, comparable with dense
        # runs); mean over the MoE sites, the model_vit convention.
        n_moe = sum(1 for blk in params["multi_blocks"]
                    for stream in blk.get("self_blocks", [])
                    for layer in stream if "experts" in layer["ffn"])
        loss = loss + (float(config.get("moe_balance_weight", 0.01))
                       * balance / max(1, n_moe))
    return logits, loss
