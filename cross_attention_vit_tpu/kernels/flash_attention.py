"""Fused attention Pallas TPU kernel.

Replaces the naive XLA path's HBM round-trip of the (B, K, N, N) attention
matrix (at the live geometry — N=513, 16 heads, batch 8 — that tensor is
134 MB in f32 per forward) with one kernel per (batch, head) that keeps
QKᵀ, the f32 softmax, and AV entirely in VMEM:

    per program: q,k,v (N̂, 64) → dots (N̂, N̂) f32 → softmax → out (N̂, 64)

N̂ is N padded to the f32 sublane multiple (8); padded key columns are masked
to −inf before the softmax so results are exact.  VMEM footprint at N=513:
3·(520·64·4) + 520²·4 ≈ 1.5 MB — far under the ~16 MB budget, so no online
(streaming) softmax is needed at these sequence lengths; the kernel stays a
single fused block, which is the fastest shape for short sequences.

Backward: custom VJP recomputes attention via the XLA formulation (the
standard recompute trade — saves the N² tensor at the cost of one extra
forward matmul pair).  A Pallas backward is a follow-up optimization.

Semantics match ops.attention._sdpa exactly (no dropout inside — the live
self-attention applies no attention-prob dropout, reference model_cross.py:57).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    """Single-block path: the whole (N̂, N̂) score matrix fits VMEM — fastest
    shape for the live geometry (N ≈ 513)."""
    q = q_ref[0, 0]  # (N̂, D̂)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    dots = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (N̂, N̂)
    n_pad = dots.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, dots.shape, 1)
        dots = jnp.where(col < n_valid, dots, -jnp.inf)
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_kernel_blocked(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         n_valid: int, block_kv: int):
    """Online-softmax path for long sequences: one q block per program,
    streaming over KV chunks with running (max, sum, acc) — VMEM holds only
    (BQ, block_kv) scores at a time, so sequence length is bounded by HBM,
    not by the N² score matrix.  This is the growth path SURVEY.md §5 asks
    for (longer sequences at smaller patch sizes) without a ring/Ulysses
    layer."""
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D̂)
    bq, d = q.shape
    n_pad = k_ref.shape[2]
    num_kv = n_pad // block_kv

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, 0, pl.ds(i * block_kv, block_kv)].astype(jnp.float32)
        vb = v_ref[0, 0, pl.ds(i * block_kv, block_kv)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (BQ, block_kv)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_kv
        s = jnp.where(col < n_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vb, preferred_element_type=jnp.float32)
        return m_new, l, acc

    init = (jnp.full((bq, 1), -jnp.inf, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, d), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, num_kv, body, init)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


# above this sequence length, switch from the single-block kernel to the
# online-softmax streaming kernel (the N² f32 score block at 1024 is 4 MB)
_SINGLE_BLOCK_MAX = 1024
_BLOCK_Q = 512
_BLOCK_KV = 512


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array,
                   scale: float) -> jax.Array:
    B, K, N, D = q.shape
    d_pad = _round_up(D, 128)
    single = N <= _SINGLE_BLOCK_MAX
    n_pad = _round_up(N, 8) if single else _round_up(N, _BLOCK_Q)
    if n_pad != N or d_pad != D:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))

    # interpret mode lets the sharding/unit tests exercise the kernel on the
    # CPU backend (Mosaic only compiles for real TPUs)
    interpret = jax.default_backend() != "tpu"

    if single:
        grid = (B, K)
        spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_attn_kernel, scale=scale, n_valid=N),
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, K, n_pad, d_pad), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * K * (n_pad * n_pad * d_pad * 2),
                bytes_accessed=4 * B * K * n_pad * d_pad * 4,
                transcendentals=B * K * n_pad * n_pad),
            interpret=interpret,
        )(q, k, v)
        return out[:, :, :N, :D]

    grid = (B, K, n_pad // _BLOCK_Q)
    q_spec = pl.BlockSpec((1, 1, _BLOCK_Q, d_pad),
                          lambda b, h, i: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, n_pad, d_pad),
                           lambda b, h, i: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_attn_kernel_blocked, scale=scale, n_valid=N,
                block_kv=_BLOCK_KV),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, n_pad, d_pad), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (n_pad * n_pad * d_pad * 2),
            bytes_accessed=4 * B * K * n_pad * d_pad * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :N, :D]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, n_valid: int):
    """Recompute-form flash backward, one (batch, head) per program.

    Recomputes the softmax from q,k (nothing saved beyond the inputs), then
        dv = Pᵀ dO
        ds = P ⊙ (dO vᵀ − rowsum(dO ⊙ O)) · scale
        dq = ds k,   dk = dsᵀ q
    All (N̂, N̂) intermediates live in VMEM; at N=520 that is ~4 MB of
    scratch, well inside budget."""
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32)
    k = k_ref[0, 0].astype(f32)
    v = v_ref[0, 0].astype(f32)
    do = do_ref[0, 0].astype(f32)

    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32) * scale
    n_pad = s.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)

    o = jnp.dot(p, v, preferred_element_type=f32)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)          # (N̂, 1)
    dv = jax.lax.dot_general(p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32)       # Pᵀ dO
    dp = jax.lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32)       # dO vᵀ
    ds = p * (dp - delta) * scale
    dq = jnp.dot(ds, k, preferred_element_type=f32)
    dk = jax.lax.dot_general(ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32)       # dsᵀ q

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, do, scale):
    B, K, N, D = q.shape
    n_pad = _round_up(N, 8)
    d_pad = _round_up(D, 128)
    if n_pad != N or d_pad != D:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)]
        q, k, v, do = (jnp.pad(t, pad) for t in (q, k, v, do))

    spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, K, n_pad, d_pad), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * K * n_pad * n_pad * d_pad,
            bytes_accessed=7 * B * K * n_pad * d_pad * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, do)
    return (dq[:, :, :N, :D], dk[:, :, :N, :D], dv[:, :, :N, :D])


def _reference_sdpa(q, k, v, scale):
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    scale: float) -> jax.Array:
    """Fused SDPA on (B, K, N, D) operands; exact softmax, f32 accumulation."""
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


# Whether to run the fused Pallas backward instead of the XLA recompute VJP.
# Measured on v5e at the live geometry (2,16,513,64): Pallas 1.88 ms vs XLA
# 1.66 ms — XLA's fused recompute wins at short sequences, so it stays the
# default; the kernel is kept (tested, correct) as the basis for a blocked
# long-sequence backward.
USE_PALLAS_BACKWARD = False


def _bwd(scale, residuals, g):
    q, k, v = residuals
    if USE_PALLAS_BACKWARD and q.shape[2] <= _SINGLE_BLOCK_MAX:
        return _flash_backward_pallas(q, k, v, g, scale)
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_sdpa(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
