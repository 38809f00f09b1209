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
from ..ops.attention import (_sdpa, attention_impl, cross_attention_cls,
                             self_attention)
from ..ops.layers import (RngStream, dropout, feed_forward, gelu, layernorm,
                          linear, mlp_head, promote_input)
from ..ops.losses import cross_entropy
from ..ops.patchify import num_patches, patchify_3d


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

def _self_block_params(kg, H: int, mlp: int, heads: int) -> dict:
    # heads==1 quirk: `to_out = nn.Identity()` when num_heads == 1 and
    # dim_head == hidden_dim (reference model_cross.py:37,45-48) — dim_head
    # is H // heads, so heads==1 always triggers it; the "out" params are
    # omitted and ops.attention.self_attention skips projection + dropout.
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

    kg = init_ops.KeyGen(key)
    params = {
        "pos_embedding": init_ops.trunc_or_normal_02(kg(), (1, N + 1, H)),
        "cls_token": init_ops.trunc_or_normal_02(kg(), (1, 1, H)),
        "patch_to_embedding": init_ops.linear_params(kg(), patch_dim, H),
        "multi_blocks": [
            {
                "self_blocks": [
                    [_self_block_params(kg, H, mlp, config.num_heads)
                     for _ in range(config.num_self_blocks)]
                    for _ in range(M)
                ],
                "cross_blocks": [
                    _cross_block_params(kg, H, mlp, config.num_heads)
                    for _ in _attn_pairs(config)
                ],
            }
            for _ in range(config.num_multi_blocks)
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


def stack_stream_params(params: dict, config: Config) -> dict:
    """Pre-stack the per-stream trunk weights onto a leading modality axis.

    Converts every `multi_blocks[i]["self_blocks"]` (an M×L nested list of
    per-stream block trees) into `"self_blocks_stacked"` — a length-L list of
    trees whose leaves carry a leading (M, ...) axis.  The stacked-stream
    apply path (`config.stacked_streams`) then consumes the leaves directly,
    eliminating the per-step `jnp.stack` of ~600 MB of trunk params that made
    apply-time stacking a measured negative (docs/PERF_r03.md).  Done once,
    outside the step — the optimizer updates the stacked leaves in place
    (Adam is elementwise, so training dynamics are unchanged).

    Round-trips exactly with `unstack_stream_params` (checkpoints should be
    saved unstacked for interop with evaluate/serve/convert)."""
    M = config.num_modalities
    out = dict(params)
    out["multi_blocks"] = []
    for blk in params["multi_blocks"]:
        sb = blk["self_blocks"]
        stacked = [
            jax.tree.map(lambda *ls: jnp.stack(ls),
                         *[sb[m][layer] for m in range(M)])
            for layer in range(len(sb[0]))
        ]
        out["multi_blocks"].append(
            {"self_blocks_stacked": stacked, "cross_blocks": blk["cross_blocks"]})
    return out


def unstack_stream_params(params: dict, config: Config) -> dict:
    """Inverse of `stack_stream_params`: back to the per-stream M×L layout."""
    M = config.num_modalities
    out = dict(params)
    out["multi_blocks"] = []
    for blk in params["multi_blocks"]:
        st = blk["self_blocks_stacked"]
        sb = [[jax.tree.map(lambda l, m=m: l[m], layer) for layer in st]
              for m in range(M)]
        out["multi_blocks"].append(
            {"self_blocks": sb, "cross_blocks": blk["cross_blocks"]})
    return out


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _self_block(p: dict, x: jax.Array, config: Config, rng: RngStream,
                train: bool, cdt, impl: str) -> jax.Array:
    """Pre-norm self-attention block (reference model_cross.py:64-72)."""
    x = self_attention(p["attn"], layernorm(p["attn_norm"], x),
                       config.num_heads, config.dropout, rng, train,
                       compute_dtype=cdt, impl=impl) + x
    x = feed_forward(p["ffn"], layernorm(p["ffn_norm"], x),
                     config.dropout, rng, train, compute_dtype=cdt) + x
    return x


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


# ---------------------------------------------------------------------------
# stream-stacked trunk (config.stacked_streams) — batches the M per-modality
# self-attention stacks into single (M·B)-batch ops.  Same math per stream
# (each keeps its own weights, stacked on a leading modality axis at apply
# time); one flash-kernel call and one batched GEMM replace M smaller ones,
# cutting per-op dispatch/fixed costs at small batch.  Off by default: train-
# mode dropout masks realize differently (one draw per layer instead of one
# per (stream, layer)) — same distribution, different bits.
# ---------------------------------------------------------------------------

def _linear_s(p: dict, x: jax.Array, cdt) -> jax.Array:
    """Per-stream Linear on stacked streams: (M,B,N,F) @ (M,F,G) + (M,G)."""
    out_dtype = x.dtype
    op = cdt if cdt is not None else out_dtype
    y = jnp.einsum("mbnf,mfg->mbng", x.astype(op), p["kernel"].astype(op),
                   preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[:, None, None, :]
    return y.astype(out_dtype)


def _layernorm_s(p: dict, x: jax.Array) -> jax.Array:
    """LayerNorm with per-stream (M,H) scale/bias on (M,B,N,H) input."""
    return layernorm({"scale": p["scale"][:, None, None, :],
                      "bias": p["bias"][:, None, None, :]}, x)


def _feed_forward_s(p: dict, x: jax.Array, rate: float, rng: RngStream,
                    train: bool, cdt) -> jax.Array:
    from jax.ad_checkpoint import checkpoint_name

    h = gelu(_linear_s(p["fc1"], x, cdt))
    h = dropout(h, rate, rng, train)
    h = checkpoint_name(h, "ffn_hidden")
    h = _linear_s(p["fc2"], h, cdt)
    return dropout(h, rate, rng, train)


def _self_attention_s(p: dict, x: jax.Array, rate: float, rng: RngStream,
                      train: bool, cdt, impl: str) -> jax.Array:
    """Fused-QKV self-attention on stacked streams (M,B,N,H) with per-stream
    weights (M,H,3,K,D) / (M,K,D,H) — one (M·B)-batch kernel call."""
    from jax.ad_checkpoint import checkpoint_name

    in_dtype = x.dtype
    if cdt is not None:
        x = x.astype(cdt)
    kernel = p["qkv"]["kernel"].astype(x.dtype)
    M, B, N, H = x.shape
    if impl == "flash":
        from ..kernels.flash_attention import flash_attention_qkv_tn

        # GEMM-native transposed layout, same as the unstacked path
        # (ops/attention.py): batched over m, output N-minor
        qkv = jnp.einsum("mbnh,mhskd->smbkdn", x, kernel,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        qkv = checkpoint_name(qkv, "qkv")
        s, _, _, K, D, Nn = qkv.shape
        out = flash_attention_qkv_tn(qkv.reshape(3, M * B, K, D, Nn),
                                     D ** -0.5)
        out = checkpoint_name(out.reshape(M, B, K, D, Nn), "attn_out")
        if "out" not in p:  # heads==1 Identity quirk (ops/attention.py)
            return jnp.transpose(out, (0, 1, 4, 2, 3)).reshape(M, B, Nn, K * D) \
                .astype(in_dtype)
        y = jnp.einsum("mbkdn,mkdh->mbnh", out,
                       p["out"]["kernel"].astype(out.dtype),
                       preferred_element_type=jnp.float32)
    else:
        qkv = jnp.einsum("mbnh,mhskd->smbknd", x, kernel,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        qkv = checkpoint_name(qkv, "qkv")
        q, k, v = qkv[0], qkv[1], qkv[2]          # (M, B, K, N, D)
        K, D = q.shape[2], q.shape[-1]
        out = _sdpa(q.reshape(M * B, K, N, D), k.reshape(M * B, K, N, D),
                    v.reshape(M * B, K, N, D), D ** -0.5)
        out = checkpoint_name(out.reshape(M, B, K, N, D), "attn_out")
        if "out" not in p:  # heads==1 Identity quirk (ops/attention.py)
            return jnp.transpose(out, (0, 1, 3, 2, 4)).reshape(M, B, N, K * D) \
                .astype(in_dtype)
        y = jnp.einsum("mbknd,mkdh->mbnh", out,
                       p["out"]["kernel"].astype(out.dtype),
                       preferred_element_type=jnp.float32)
    y = (y + p["out"]["bias"].astype(jnp.float32)[:, None, None, :]
         ).astype(in_dtype)
    return dropout(y, rate, rng, train).astype(in_dtype)


def _self_block_s(p: dict, x: jax.Array, config: Config, rng: RngStream,
                  train: bool, cdt, impl: str) -> jax.Array:
    x = _self_attention_s(p["attn"], _layernorm_s(p["attn_norm"], x),
                          config.dropout, rng, train, cdt, impl) + x
    x = _feed_forward_s(p["ffn"], _layernorm_s(p["ffn_norm"], x),
                        config.dropout, rng, train, cdt) + x
    return x


def _multi_scale_block(p: dict, streams: list[jax.Array], config: Config,
                       rng: RngStream, train: bool, cdt, impl: str) -> list[jax.Array]:
    """Per-stream self-attention stacks then attn_order-routed CLS fusion
    (reference model_cross.py:128-148)."""
    remat = bool(config.get("remat", False))
    prestacked = "self_blocks_stacked" in p  # stack_stream_params tree layout
    stacked = prestacked or (
        bool(config.get("stacked_streams", False)) and len(streams) > 1)

    if stacked:
        def blk_fn_s(blk_params, x, key):
            return _self_block_s(blk_params, x, config, RngStream(key), train,
                                 cdt, impl)

        if remat:
            from ..ops.layers import remat_wrap

            blk_fn_s = remat_wrap(blk_fn_s, config)

        xs = jnp.stack(streams)                      # (M, B, N, H)
        if prestacked:
            layers_s = p["self_blocks_stacked"]      # no per-step stack cost
        else:
            layers_s = [
                jax.tree.map(
                    lambda *leaves: jnp.stack(leaves),
                    *[p["self_blocks"][m][layer] for m in range(len(streams))])
                for layer in range(len(p["self_blocks"][0]))]
        for blk in layers_s:
            xs = blk_fn_s(blk, xs, rng() if train else jax.random.key(0))
        attn = [xs[m] for m in range(len(streams))]
    else:
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
                x = blk_fn(blk, x, rng() if train else jax.random.key(0))
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
    return outs


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
    if impl == "ring" and (config.get("stacked_streams", False) or
                           any("self_blocks_stacked" in b
                               for b in params["multi_blocks"])):
        raise ValueError("seq_parallel does not compose with stacked_streams")
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

    for block in params["multi_blocks"]:
        streams = _multi_scale_block(block, streams, config, rngs, train, cdt, impl)

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
    return logits, loss
