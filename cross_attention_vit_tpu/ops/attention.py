"""Attention ops: multi-head self-attention and CLS-query cross-attention.

Reference semantics (model_cross.py:33-102):
  * Self-attention (`Attention`): one fused **bias-free** QKV projection
    Linear(H → 3H) chunked into thirds, heads split as
    'b n (h d) -> b h n d', scale head_dim**-0.5, softmax, AV, output
    projection + dropout.  No dropout on attention probabilities.
  * Cross-attention (`CrossAttention`): separate **biased** wq/wk/wv;
    queries come from the CLS token only (x[:, 0:1]), so attn is (B,H,1,N);
    dropout on both the attention probabilities and the projected output.

The XLA path below is a straight batched-GEMM formulation (MXU-bound at these
sizes: N≈513, d=64).  `impl="flash"` dispatches to the Pallas fused kernel in
kernels/flash_attention.py once sequence/batch shapes support it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import RngStream, dropout, linear


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """'b n (h d) -> b h n d' (reference model_cross.py:53)."""
    B, N, HD = x.shape
    d = HD // num_heads
    return x.reshape(B, N, num_heads, d).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """'b h n d -> b n (h d)' (reference model_cross.py:60)."""
    B, H, N, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, N, H * d)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
          attn_dropout: float = 0.0, rng: RngStream | None = None,
          train: bool = False) -> jax.Array:
    """Scaled-dot-product attention on (B, H, N, d) operands.

    Softmax runs in float32 regardless of compute dtype (bf16 logits lose
    too much for parity); the two GEMMs accumulate in float32 via
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


def self_attention(params: dict, x: jax.Array, num_heads: int,
                   dropout_rate: float, rng: RngStream, train: bool,
                   compute_dtype=None, impl: str = "xla") -> jax.Array:
    """Fused-QKV multi-head self-attention (reference model_cross.py:33-61).

    params: {"qkv": {"kernel": (H, 3H)}, "out": {"kernel": (H, H), "bias": (H,)}}
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    qkv = linear(params["qkv"], x)  # (B, N, 3H); column layout [q | k | v]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    head_dim = q.shape[-1] // num_heads
    scale = head_dim ** -0.5
    q, k, v = (_split_heads(t, num_heads) for t in (q, k, v))

    if impl == "flash":
        from ..kernels.flash_attention import flash_attention
        out = flash_attention(q, k, v, scale)
    else:
        out = _sdpa(q, k, v, scale)

    out = _merge_heads(out)
    out = linear(params["out"], out)
    out = dropout(out, dropout_rate, rng, train)
    return out.astype(in_dtype)


def cross_attention_cls(params: dict, x: jax.Array, num_heads: int,
                        dropout_rate: float, rng: RngStream, train: bool,
                        compute_dtype=None) -> jax.Array:
    """CLS-query cross-attention (reference model_cross.py:74-102).

    x is (B, N, H) = [fused-CLS ; other-stream tokens]; only x[:, 0:1] forms
    queries, so the output is a single fused CLS token (B, 1, H).

    params: {"wq","wk","wv","proj"} each {"kernel","bias"}.
    """
    in_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    B, N, C = x.shape
    head_dim = C // num_heads
    scale = head_dim ** -0.5

    q = _split_heads(linear(params["wq"], x[:, 0:1]), num_heads)  # (B,H,1,d)
    k = _split_heads(linear(params["wk"], x), num_heads)           # (B,H,N,d)
    v = _split_heads(linear(params["wv"], x), num_heads)

    out = _sdpa(q, k, v, scale, attn_dropout=dropout_rate, rng=rng, train=train)
    out = _merge_heads(out)                       # (B, 1, C)
    out = linear(params["proj"], out)
    out = dropout(out, dropout_rate, rng, train)
    return out.astype(in_dtype)
