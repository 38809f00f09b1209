"""Attention ops: multi-head self-attention and CLS-query cross-attention.

Reference semantics (model_cross.py:33-102):
  * Self-attention (`Attention`): one fused **bias-free** QKV projection
    Linear(H → 3H) chunked into thirds, heads split as
    'b n (h d) -> b h n d', scale head_dim**-0.5, softmax, AV, output
    projection + dropout.  No dropout on attention probabilities.
  * Cross-attention (`CrossAttention`): separate **biased** wq/wk/wv;
    queries come from the CLS token only (x[:, 0:1]), so attn is (B,H,1,N);
    dropout on both the attention probabilities and the projected output.

TPU-first layout: kernels carry an explicit heads axis (see
ops/initializers.py) so the QKV projection emits (B, heads, N, d) directly
from one einsum/GEMM — no post-GEMM reshard — and tensor parallelism shards
the heads axis Megatron-style: qkv/wq/wk/wv are column-split, out/proj are
row-split with a compiler-inserted psum.

The XLA path is a straight batched-GEMM formulation (MXU-bound at these
sizes: N≈513, d=64).  `impl="flash"` dispatches to the Pallas fused kernel in
kernels/flash_attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import RngStream, dropout


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
          attn_dropout: float = 0.0, rng: RngStream | None = None,
          train: bool = False) -> jax.Array:
    """Scaled-dot-product attention on (B, K, N, d) operands.

    Softmax runs in float32 regardless of compute dtype (bf16 logits lose
    too much for parity); both GEMMs accumulate in float32 via
    preferred_element_type.
    """
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    if attn_dropout and train:
        attn = dropout(attn, attn_dropout, rng, train)
    attn = attn.astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def attention_impl(config) -> str:
    """SDPA implementation a config selects: 'ring' (sequence parallelism —
    config.seq_parallel > 1 routes through parallel/ring.sharded_ring_sdpa,
    overriding use_flash_attention: the Pallas kernel is single-device and SP
    exists precisely because one device can't hold the sequence), else
    'flash' (Pallas kernel) or 'xla'."""
    if config.get("seq_parallel", 0) > 1:
        return "ring"
    return "flash" if config.use_flash_attention else "xla"


def self_attention(params: dict, x: jax.Array, num_heads: int,
                   dropout_rate: float, rng: RngStream, train: bool,
                   compute_dtype=None, impl: str = "xla") -> jax.Array:
    """Fused-QKV multi-head self-attention (reference model_cross.py:33-61).

    params: {"qkv": {"kernel": (H, 3, K, D)},
             "out": {"kernel": (K, D, H), "bias": (H,)}}

    heads==1 quirk: the reference builds `to_out = nn.Identity()` when
    `num_heads == 1 and dim_head == hidden_dim` (model_cross.py:37,45-48;
    modelv3.py:53-57) — no output projection AND no output dropout (the
    Identity replaces the whole Sequential).  Models reproduce it by
    omitting the "out" params (dim_head = H // heads, so heads==1 always
    satisfies the condition); apply detects the absence here.
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    from jax.ad_checkpoint import checkpoint_name

    if "kernel_q" in params["qkv"]:
        # int8 w8a8 attention projections (models/quantize attn=True,
        # inference-only): qkv/out GEMMs run int8 on the MXU, the SDPA
        # between them stays float (softmax numerics) — ops/quant.py.
        # The SDPA keeps the Pallas flash kernel when the config selects it:
        # round 4 ran _sdpa unconditionally here, and the flash drop tripled
        # config-4 int8+attn forward time (107 → 286 ms, docs/PERF_r05.md) —
        # the int8 GEMM gain can never buy back a dense f32 (B,K,N,N)
        # materialization.
        from .quant import attn_out_projection, qkv_projection

        qkv = qkv_projection(params["qkv"], x)            # (3, B, K, N, D)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if impl == "flash":
            from ..kernels.flash_attention import flash_attention

            out = flash_attention(q, k, v, q.shape[-1] ** -0.5)
        else:
            out = _sdpa(q, k, v, q.shape[-1] ** -0.5)
        if "out" not in params:  # heads==1 Identity quirk (see docstring)
            b, kk, n, d = out.shape
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, kk * d) \
                .astype(in_dtype)
        if "kernel_q" in params["out"]:
            y = attn_out_projection(params["out"], out)   # (B, N, H) f32
        else:
            y = jnp.einsum("bknd,kdh->bnh", out,
                           params["out"]["kernel"].astype(out.dtype),
                           preferred_element_type=jnp.float32)
        y = (y + params["out"]["bias"].astype(jnp.float32)).astype(in_dtype)
        return dropout(y, dropout_rate, rng, train).astype(in_dtype)

    kernel = params["qkv"]["kernel"].astype(x.dtype)

    if impl == "flash":
        # Transposed orientation: the QKV GEMM's natural TPU output layout
        # is N-minor, which is exactly the row-major layout of a logical
        # (…, D, N) array — feeding the tn kernel this way removes the
        # per-layer HBM relayout copies XLA otherwise inserts at the Pallas
        # boundary (~55 ms/step at config 4, 2026-08-17 trace).
        # Fused projection+attention custom_vjp: the backward megakernel
        # contracts dq/dk/dv against x and Wqkv in VMEM, so the dqkv
        # cotangent never materializes in HBM (kernels/flash_attention.py
        # fused_qkv_attention — bf16 short-N; other operands fall back to
        # the unfused composition inside the same op).  Note: qkv is now
        # internal to the custom_vjp, so remat_policy='…_qkv' has no target
        # on this path — with the bf16 residual set, config-4 scale runs
        # remat-free anyway (docs/PERF_r03.md).
        from ..kernels.flash_attention import fused_qkv_attention
        out = checkpoint_name(fused_qkv_attention(x, kernel), "attn_out")
        if "out" not in params:  # heads==1 Identity quirk (see docstring)
            b, k, d, n = out.shape
            return jnp.transpose(out, (0, 3, 1, 2)).reshape(b, n, k * d) \
                .astype(in_dtype)
        out_k = params["out"]["kernel"].astype(out.dtype)
        y = jnp.einsum("bkdn,kdh->bnh", out, out_k,
                       preferred_element_type=jnp.float32)
    else:
        qkv = jnp.einsum("bnh,hskd->sbknd", x, kernel,
                         preferred_element_type=jnp.float32)  # (3,B,K,N,D)
        qkv = qkv.astype(x.dtype)
        qkv = checkpoint_name(qkv, "qkv")
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = q.shape[-1] ** -0.5
        if impl == "ring":
            # sequence parallelism (config.seq_parallel): exact ring
            # attention over the ambient 'seq' mesh axis — parallel/ring.py
            # (dense-fallback bit-identical when no seq mesh is active)
            from ..parallel.ring import sharded_ring_sdpa
            sdpa = sharded_ring_sdpa
        else:
            sdpa = _sdpa
        # Named for selective rematerialization: config remat_policy=
        # 'save_attn' keeps the attention output so the backward recompute
        # skips the SDPA — one (B, N, H) residual per layer (67 MB bf16 at
        # batch 32).
        out = checkpoint_name(sdpa(q, k, v, scale), "attn_out")
        if "out" not in params:  # heads==1 Identity quirk (see docstring)
            b, kk, n, d = out.shape
            return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, kk * d) \
                .astype(in_dtype)
        out_k = params["out"]["kernel"].astype(out.dtype)
        y = jnp.einsum("bknd,kdh->bnh", out, out_k,
                       preferred_element_type=jnp.float32)
    y = (y + params["out"]["bias"].astype(jnp.float32)).astype(in_dtype)
    y = dropout(y, dropout_rate, rng, train)
    return y.astype(in_dtype)


def _head_in(p: dict, x: jax.Array) -> jax.Array:
    """(B, N, H) @ (H, K, D) → (B, K, N, D) with per-head bias."""
    y = jnp.einsum("bnh,hkd->bknd", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)[None, :, None, :]
    return y.astype(x.dtype)


def cross_attention_cls(params: dict, x: jax.Array, num_heads: int,
                        dropout_rate: float, rng: RngStream, train: bool,
                        compute_dtype=None) -> jax.Array:
    """CLS-query cross-attention (reference model_cross.py:74-102).

    x is (B, N, H) = [fused-CLS ; other-stream tokens]; only x[:, 0:1] forms
    queries, so the output is a single fused CLS token (B, 1, H).

    params: {"wq","wk","wv": {"kernel": (H,K,D), "bias": (K,D)},
             "proj": {"kernel": (K,D,H), "bias": (H,)}}
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    head_dim = params["wq"]["kernel"].shape[-1]
    scale = head_dim ** -0.5

    q = _head_in(params["wq"], x[:, 0:1])  # (B, K, 1, D)
    k = _head_in(params["wk"], x)           # (B, K, N, D)
    v = _head_in(params["wv"], x)

    out = _sdpa(q, k, v, scale, attn_dropout=dropout_rate, rng=rng, train=train)
    proj = params["proj"]
    y = jnp.einsum("bknd,kdh->bnh", out, proj["kernel"].astype(out.dtype),
                   preferred_element_type=jnp.float32)
    y = (y + proj["bias"].astype(jnp.float32)).astype(in_dtype)
    y = dropout(y, dropout_rate, rng, train)
    return y.astype(in_dtype)
