"""Fused attention Pallas TPU kernel.

Replaces the naive XLA path's HBM round-trip of the (B, K, N, N) attention
matrix (at the live geometry — N=513, 16 heads, batch 8 — that tensor is
134 MB in f32 per forward) with fused kernels that keep QKᵀ, the f32
softmax, and AV in VMEM.

Two regimes, switched on sequence length:

  * N ≤ 1040 — single-block kernel, one program per (batch, head): the whole
    (N̂, N̂) score matrix fits VMEM (≤ 4.3 MB f32), which is the fastest
    shape for short sequences (the live models' N = 513, and the 2-stream
    concatenated ViT's N = 1025 — measured 2.1× faster than streaming there).
  * N > 1040 — **streaming online-softmax kernel**: the grid gains a KV axis
    and Mosaic pipelines (block_q, block_kv) tiles HBM→VMEM while running
    (max, sum, acc) scratch carries the softmax state across KV steps.  VMEM
    holds only one (BQ, D) query tile, one (BKV, D) KV tile pair and the
    (BQ, BKV) partial scores — sequence length is bounded by HBM.  The
    forward also emits the per-row logsumexp, which the **blocked backward**
    (two accumulator kernels: dK/dV over a Q-streaming grid, dQ over a
    KV-streaming grid) consumes, so long-sequence training never
    materializes N² either.  This is the growth path SURVEY.md §5 asks for
    (longer sequences at smaller patch sizes) without a ring/Ulysses layer.

N̂ is N rounded up (sublane multiple 8 short, block multiple long).  The
single-block kernels take it as a RAGGED Pallas block over the true-N array
— Mosaic masks the boundary DMA and drops out-of-bounds stores, and the
kernel zero-fills the unspecified rows it must not read (_row_zero) — so no
XLA pad/slice pair surrounds the calls (those cost ~50 ms/step at config 4,
2026-08-17 trace).  The streaming regime still zero-pads externally to a
block multiple.  Padded key columns are masked to −inf before the softmax
so results are exact either way.

Short-sequence backward: fused single-block Pallas kernel (recompute form,
all (N̂, N̂) intermediates in VMEM) — measured bf16 backward-only on v5e:
5.06 ms vs 8.74 ms for the XLA-recompute VJP at (32,16,513,64) and 12.1 vs
27.3 ms at (32,16,1025,64); the XLA path materializes the (B,K,N,N)
probabilities in HBM and loses ground as batch·N² grows.  Set
USE_PALLAS_BACKWARD=False to fall back to the XLA recompute VJP.

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


# Head-dim alignment for kernel blocks.  Mosaic pads VMEM tiles to the
# (sublane, 128) lane grid internally, so a 64-lane block is legal — and at
# the models' D=64 it HALVES every kernel operand's HBM footprint and DMA
# versus rounding D up to 128, and deletes the XLA-level pad/slice pair
# around every kernel call (measured config-4 train step: 35 ms/step of pad
# ops alone, trace 2026-08-17).  The MXU time is unchanged either way (a
# 64-wide pass occupies the same 128-lane tile).  8 = f32 sublane quantum.
_D_ALIGN = 8


def _d_pad(D: int) -> int:
    return _round_up(D, _D_ALIGN)


def _interpret() -> bool:
    # interpret mode lets the sharding/unit tests exercise the kernels on the
    # CPU backend (Mosaic only compiles for real TPUs)
    return jax.default_backend() != "tpu"


def _dot_prec(dt):
    """MXU precision for a kernel matmul with operand dtype `dt`.

    f32 operands: HIGHEST — the MXU multiplies bf16 natively, so a default-
    precision f32 dot is a single truncated pass (measured on v5e: 4.6e-3
    normalized deviation from the 6-pass result at N=1025).  An f32 caller
    asked for f32 accuracy; give it the full decomposition (the f32 path is
    not the training path, so the 6x pass cost is irrelevant).  bf16
    operands: default (native rate)."""
    return jax.lax.Precision.HIGHEST if dt == jnp.float32 else None


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _row_zero(x: jax.Array, n_valid: int) -> jax.Array:
    """Zero rows ≥ n_valid of an (N̂, D̂) tile.

    Ragged-N blocks (block taller than the array's N) read unspecified values
    in the out-of-bounds rows; zeroing them reproduces exactly the math of an
    externally zero-padded operand (and guards the 0·NaN → NaN hazard in the
    matmuls that contract against masked-out probability columns).  One VPU
    select over N̂·D̂ elements — noise next to the N̂² softmax."""
    if x.shape[0] == n_valid:
        return x
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < n_valid, x, 0)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    """Single-block path: the whole (N̂, N̂) score matrix fits VMEM — fastest
    shape for the live geometry (N ≈ 513).

    Operands arrive as ragged blocks (block N̂ = N rounded up to the sublane
    quantum ≥ the array's true N) — no XLA-level pad/slice pair around the
    call; the 2026-08-17 config-4 trace priced those at ~50 ms/step."""
    q = q_ref[0, 0]  # (N̂, D̂)
    k = k_ref[0, 0]
    v = _row_zero(v_ref[0, 0], n_valid)
    dots = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_prec(q.dtype)) * scale  # (N̂, N̂)
    n_pad = dots.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, dots.shape, 1)
        dots = jnp.where(col < n_valid, dots, -jnp.inf)
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    out = jnp.dot(attn, v, preferred_element_type=jnp.float32,
                  precision=_dot_prec(v.dtype))
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_kernel_stream(q_ref, k_ref, v_ref, o_ref, lse_ref,
                        m_ref, l_ref, acc_ref, *,
                        scale: float, n_valid: int, block_kv: int):
    """Streaming online-softmax: grid (B, K, n_q, n_kv) with the KV axis
    innermost ('arbitrary' — it carries state); (m, l, acc) scratch persists
    across KV steps of one query tile.  Only (BQ, D) + 2·(BKV, D) operand
    tiles and the (BQ, BKV) partial scores are live in VMEM."""
    j = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0, 0]                       # (BQ, D̂) — input dtype on the MXU
    kb = k_ref[0, 0]                      # (BKV, D̂)
    vb = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_prec(q.dtype)) * scale  # (BQ, BKV)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    s = jnp.where(col < n_valid, s, -jnp.inf)

    m_prev = m_ref[...][:, :1]            # (BQ, 1)
    l_prev = l_ref[...][:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(vb.dtype), vb, preferred_element_type=jnp.float32,
        precision=_dot_prec(vb.dtype))
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_kv - 1)
    def _done():
        l = l_ref[...][:, :1]
        o_ref[0, 0] = (acc_ref[...] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = m_ref[...] + jnp.log(l_ref[...])


# Above this sequence length, switch from the single-block kernel to the
# online-softmax streaming kernel.  1040 (not 1024) so the 2-stream
# concatenated-ViT geometry N = 2·512 + 1 CLS = 1025 stays on the
# single-block path: measured on v5e at (32,16,1025,64) bf16, single-block
# (pads to 1032, 4.3 MB f32 scores) runs the forward in 7.8 ms vs 16.5 ms
# for the streaming kernel (whose 512-blocks pad 1025→1536, 2.25× the
# score FLOPs).  The VMEM ceiling is the backward kernel's three (N̂, N̂)
# f32 buffers (s, p, ds — 12.8 MB at N̂=1032), which is why the cutoff
# stops just past the live geometry instead of climbing further.
_SINGLE_BLOCK_MAX = 1040
_BLOCK_Q = 512
_BLOCK_KV = 512
_LANES = 128  # f32 lane width: lse/delta rows are lane-broadcast


def _flash_forward(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   with_lse: bool = False):
    B, K, N, D = q.shape
    d_pad = _d_pad(D)
    single = N <= _SINGLE_BLOCK_MAX
    n_pad = _round_up(N, 8) if single else _round_up(N, _BLOCK_Q)
    if d_pad != D:
        # D is the contraction dim of QKᵀ — garbage lanes would corrupt valid
        # scores, so a non-aligned D keeps the external zero-pad (never hit
        # by the live models, D=64).
        pad = [(0, 0), (0, 0), (0, 0), (0, d_pad - D)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
    if not single and n_pad != N:
        q, k, v = (jnp.pad(t, [(0, 0), (0, 0), (0, n_pad - N), (0, 0)])
                   for t in (q, k, v))

    if single:
        # Ragged blocks: the block is N̂ = round_up(N, 8) rows tall over an
        # N-row array — Mosaic masks the boundary DMA, out-of-bounds stores
        # are dropped, and the kernel zero-fills the garbage rows it must not
        # read (see _row_zero).  No XLA pad/slice pair around the call.
        assert not with_lse, "lse is only emitted by the streaming kernel"
        grid = (B, K)
        spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_attn_kernel, scale=scale, n_valid=N),
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, K, N, d_pad), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * K * (n_pad * n_pad * d_pad * 2),
                bytes_accessed=4 * B * K * n_pad * d_pad * 4,
                transcendentals=B * K * n_pad * n_pad),
            interpret=_interpret(),
        )(q, k, v)
        return out if d_pad == D else out[..., :D]

    # n_pad is rounded to _BLOCK_Q; a KV block size that doesn't also divide
    # it would silently truncate the key range (the grid below floors) —
    # observed during block-size tuning as a wrong checksum, not an error.
    assert n_pad % _BLOCK_KV == 0, (
        f"_BLOCK_KV={_BLOCK_KV} must divide n_pad={n_pad} "
        f"(= N rounded up to _BLOCK_Q={_BLOCK_Q}) or keys are dropped")
    grid = (B, K, n_pad // _BLOCK_Q, n_pad // _BLOCK_KV)
    q_spec = pl.BlockSpec((1, 1, _BLOCK_Q, d_pad),
                          lambda b, h, i, j: (b, h, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, _BLOCK_KV, d_pad),
                           lambda b, h, i, j: (b, h, j, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, 1, _BLOCK_Q, _LANES),
                            lambda b, h, i, j: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        partial(_attn_kernel_stream, scale=scale, n_valid=N,
                block_kv=_BLOCK_KV),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(q_spec, lse_spec),
        out_shape=(jax.ShapeDtypeStruct((B, K, n_pad, d_pad), q.dtype),
                   jax.ShapeDtypeStruct((B, K, n_pad, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((_BLOCK_Q, _LANES), jnp.float32),
                        pltpu.VMEM((_BLOCK_Q, _LANES), jnp.float32),
                        pltpu.VMEM((_BLOCK_Q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (n_pad * n_pad * d_pad * 2),
            bytes_accessed=4 * B * K * n_pad * d_pad * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(q, k, v)
    out = out[:, :, :N, :D]
    if with_lse:
        return out, lse[:, :, :N, 0]
    return out


# ---------------------------------------------------------------------------
# backward — single-block (short N; kept behind USE_PALLAS_BACKWARD)
# ---------------------------------------------------------------------------

def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                     scale: float, n_valid: int):
    """Recompute-form flash backward, one (batch, head) per program.

    Recomputes the softmax from q,k (nothing saved beyond the inputs), then
        dv = Pᵀ dO
        ds = P ⊙ (dO vᵀ − rowsum(dO ⊙ O)) · scale
        dq = ds k,   dk = dsᵀ q
    All (N̂, N̂) intermediates live in VMEM; at N=520 that is ~4 MB of
    scratch, well inside budget.

    Matmul operands stay in the INPUT dtype (bf16 for training) with f32
    accumulation — the MXU runs f32×f32 at a fraction of its bf16 rate, and
    bf16 operands match both the forward kernel (which feeds the MXU bf16
    and casts P to v.dtype before AV) and XLA's own backward of the bf16
    einsum formulation.  Softmax and the ds elementwise algebra stay f32."""
    f32 = jnp.float32
    # Ragged blocks (see _attn_kernel): zero the unspecified out-of-bounds
    # rows so the cross-row accumulations (dv = Pᵀ dO, dk = dsᵀ q) see
    # exactly the externally-zero-padded math — a garbage (worst case NaN)
    # row in any operand would otherwise leak into valid dk/dv rows through
    # the 0·NaN hazard.
    q = _row_zero(q_ref[0, 0], n_valid)
    k = _row_zero(k_ref[0, 0], n_valid)
    v = _row_zero(v_ref[0, 0], n_valid)
    do = _row_zero(do_ref[0, 0], n_valid)

    s = jax.lax.dot_general(q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32,
                            precision=_dot_prec(q.dtype)) * scale
    n_pad = s.shape[-1]
    if n_valid < n_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    pb = p.astype(v.dtype)

    o = jnp.dot(pb, v, preferred_element_type=f32,
                precision=_dot_prec(v.dtype))
    delta = jnp.sum(do.astype(f32) * o, axis=-1, keepdims=True)  # (N̂, 1)
    dv = jax.lax.dot_general(pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(v.dtype))     # Pᵀ dO
    dp = jax.lax.dot_general(do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(v.dtype))     # dO vᵀ
    ds = p * (dp - delta) * scale
    dsb = ds.astype(v.dtype)
    dq = jnp.dot(dsb, k, preferred_element_type=f32,
                 precision=_dot_prec(k.dtype))
    dk = jax.lax.dot_general(dsb, q, dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(q.dtype))     # dsᵀ q

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_backward_pallas(q, k, v, do, scale):
    B, K, N, D = q.shape
    n_pad = _round_up(N, 8)
    d_pad = _d_pad(D)
    if d_pad != D:  # D is contracted in QKᵀ — see _flash_forward
        pad = [(0, 0), (0, 0), (0, 0), (0, d_pad - D)]
        q, k, v, do = (jnp.pad(t, pad) for t in (q, k, v, do))

    # ragged N blocks; the kernel zero-fills out-of-bounds rows (_row_zero)
    spec = pl.BlockSpec((1, 1, n_pad, d_pad), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((B, K, N, d_pad), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # f32 inputs at N̂=1032 need ~17 MB of scoped VMEM (the three
            # (N̂,N̂) f32 buffers + the HIGHEST-precision dot's hi/lo operand
            # splits) — just past the 16 MB default; v5e has 128 MB physical
            vmem_limit_bytes=(24 * 1024 * 1024
                              if q.dtype == jnp.float32 else None)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * K * n_pad * n_pad * d_pad,
            bytes_accessed=7 * B * K * n_pad * d_pad * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(q, k, v, do)
    if d_pad != D:
        return (dq[..., :D], dk[..., :D], dv[..., :D])
    return dq, dk, dv


# ---------------------------------------------------------------------------
# backward — blocked (long N): dK/dV stream over Q, dQ streams over KV
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale: float, n_valid: int, block_kv: int):
    """Grid (B, K, n_kv, n_q): for one KV tile, accumulate dK/dV over all Q
    tiles.  P is recomputed per tile from the saved logsumexp — padded-Q rows
    contribute nothing because their dO rows are zero."""
    i = pl.program_id(3)
    n_q = pl.num_programs(3)
    jkv = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[...] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[...] = jnp.zeros(dv_acc.shape, jnp.float32)

    f32 = jnp.float32
    q = q_ref[0, 0]                        # (BQ, D̂) — input dtype on the MXU
    kb = k_ref[0, 0]                       # (BKV, D̂)
    vb = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]             # (BQ, 1)
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32,
                            precision=_dot_prec(q.dtype)) * scale  # (BQ, BKV)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jkv * block_kv
    s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jnp.exp(s - lse)                   # exact softmax rows via saved lse
    pb = p.astype(vb.dtype)

    dv_acc[...] += jax.lax.dot_general(
        pb, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=_dot_prec(vb.dtype))     # Pᵀ dO
    dp = jax.lax.dot_general(do, vb, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(vb.dtype))
    ds = p * (dp - delta) * scale
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(vb.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=_dot_prec(q.dtype))      # dsᵀ q

    @pl.when(i == n_q - 1)
    def _done():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_acc, *,
                   scale: float, n_valid: int, block_kv: int):
    """Grid (B, K, n_q, n_kv): for one Q tile, accumulate dQ over KV tiles."""
    j = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros(dq_acc.shape, jnp.float32)

    f32 = jnp.float32
    q = q_ref[0, 0]                        # input dtype on the MXU
    kb = k_ref[0, 0]
    vb = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, :1]
    delta = delta_ref[0, 0][:, :1]

    s = jax.lax.dot_general(q, kb, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32,
                            precision=_dot_prec(q.dtype)) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    s = jnp.where(col < n_valid, s, -jnp.inf)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(do, vb, dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(vb.dtype))
    ds = p * (dp - delta) * scale
    dq_acc[...] += jnp.dot(ds.astype(vb.dtype), kb,
                           preferred_element_type=f32,
                           precision=_dot_prec(kb.dtype))

    @pl.when(j == n_kv - 1)
    def _done():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _flash_backward_blocked(q, k, v, o, lse, do, scale):
    """Blocked recompute backward for long sequences: never materializes the
    (N, N) score matrix — VMEM holds (BQ/BKV, D̂) tiles and one (BQ, BKV)
    partial per step, so backward memory is bounded by HBM like the forward."""
    B, K, N, D = q.shape
    n_pad = _round_up(N, _BLOCK_Q)
    d_pad = _d_pad(D)
    if n_pad != N or d_pad != D:
        pad = [(0, 0), (0, 0), (0, n_pad - N), (0, d_pad - D)]
        q, k, v, o, do = (jnp.pad(t, pad) for t in (q, k, v, o, do))

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                              # (B, K, n_pad)
    lse = jnp.pad(lse, [(0, 0), (0, 0), (0, n_pad - N)])
    # lane-broadcast the per-row scalars so tiles stay (sublane, 128)-aligned
    lse_b = jnp.broadcast_to(lse[..., None], (B, K, n_pad, _LANES))
    delta_b = jnp.broadcast_to(delta[..., None], (B, K, n_pad, _LANES))

    n_q, n_kv = n_pad // _BLOCK_Q, n_pad // _BLOCK_KV
    shape = jax.ShapeDtypeStruct((B, K, n_pad, d_pad), q.dtype)

    # dK/dV: KV-major grid, Q innermost (state axis)
    q_spec_i = pl.BlockSpec((1, 1, _BLOCK_Q, d_pad),
                            lambda b, h, jk, i: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    kv_spec_o = pl.BlockSpec((1, 1, _BLOCK_KV, d_pad),
                             lambda b, h, jk, i: (b, h, jk, 0),
                             memory_space=pltpu.VMEM)
    row_spec_i = pl.BlockSpec((1, 1, _BLOCK_Q, _LANES),
                              lambda b, h, jk, i: (b, h, i, 0),
                              memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        partial(_bwd_dkv_kernel, scale=scale, n_valid=N, block_kv=_BLOCK_KV),
        grid=(B, K, n_kv, n_q),
        in_specs=[q_spec_i, kv_spec_o, kv_spec_o, q_spec_i, row_spec_i,
                  row_spec_i],
        out_specs=(kv_spec_o, kv_spec_o),
        out_shape=(shape, shape),
        scratch_shapes=[pltpu.VMEM((_BLOCK_KV, d_pad), jnp.float32),
                        pltpu.VMEM((_BLOCK_KV, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * K * n_pad * n_pad * d_pad,
            bytes_accessed=8 * B * K * n_pad * d_pad * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(q, k, v, do, lse_b, delta_b)

    # dQ: Q-major grid, KV innermost (state axis)
    q_spec_o = pl.BlockSpec((1, 1, _BLOCK_Q, d_pad),
                            lambda b, h, i, j: (b, h, i, 0),
                            memory_space=pltpu.VMEM)
    kv_spec_i = pl.BlockSpec((1, 1, _BLOCK_KV, d_pad),
                             lambda b, h, i, j: (b, h, j, 0),
                             memory_space=pltpu.VMEM)
    row_spec_o = pl.BlockSpec((1, 1, _BLOCK_Q, _LANES),
                              lambda b, h, i, j: (b, h, i, 0),
                              memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        partial(_bwd_dq_kernel, scale=scale, n_valid=N, block_kv=_BLOCK_KV),
        grid=(B, K, n_q, n_kv),
        in_specs=[q_spec_o, kv_spec_i, kv_spec_i, q_spec_o, row_spec_o,
                  row_spec_o],
        out_specs=q_spec_o,
        out_shape=shape,
        scratch_shapes=[pltpu.VMEM((_BLOCK_Q, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * B * K * n_pad * n_pad * d_pad,
            bytes_accessed=6 * B * K * n_pad * d_pad * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(q, k, v, do, lse_b, delta_b)

    return (dq[:, :, :N, :D], dk[:, :, :N, :D], dv[:, :, :N, :D])


# ---------------------------------------------------------------------------
# transposed-operand ("tn") single-block kernels: (B, K, D, N) operands
# ---------------------------------------------------------------------------
#
# Why a second orientation exists: Pallas mandates default (row-major)
# layouts, so a (B, K, N, D) operand must arrive D-minor — but the QKV
# projection GEMM on TPU naturally writes its output N-MINOR (physically
# (b, k, d, n); XLA fuses that transpose into the GEMM epilogue for free,
# e.g. the cross-attention head-in fusions in the 2026-08-17 config-4
# trace), and XLA then inserts a real HBM round-trip copy per operand to
# re-materialize D-minor for the kernel (~55 ms/step at config 4: 28 ms of
# %copy + 15 ms slice fusions + 15 ms add fusions).  Declaring the kernel
# operands as LOGICAL (B, K, D, N) makes the row-major layout Pallas wants
# identical to the physical layout the GEMMs want on both sides of the
# kernel, and the copies become bitcasts.
#
# In-kernel everything stays expressible as dot_general with no transposes:
#     s     = qᵀ·k        contract D      (Nq, Nk)
#     outᵀ  = v·pᵀ        contract Nk     (D, Nq)
#     delta = (do⊙o)ᵀ·1   contract D      (Nq, 1)   (MXU ones-vector trick)
#     dvᵀ   = do·p        contract Nq     (D, Nk)
#     dp    = doᵀ·v       contract D      (Nq, Nk)
#     dqᵀ   = k·dsᵀ       contract Nk     (D, Nq)
#     dkᵀ   = q·ds        contract Nq     (D, Nk)
# The softmax keeps its (Nq, Nk) orientation — row reductions unchanged.
# N sits on the LANE dim and the blocks carry the FULL array N (see
# _tn_specs) — Mosaic pads the tiles internally with correct masking, so
# the _col_zero / -inf guards below only activate if a caller ever blocks
# the lane dim (today they are compile-time no-ops: n_valid == N).


def _col_zero(x: jax.Array, n_valid: int) -> jax.Array:
    """Zero columns ≥ n_valid of a (D̂, N̂) tile (see _row_zero)."""
    if x.shape[1] == n_valid:
        return x
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < n_valid, x, 0)


def _attn_kernel_tn(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                    n_valid: int):
    o_ref[0, 0] = _tn_fwd_math(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                               scale, n_valid).astype(o_ref.dtype)


def _tn_fwd_math(q, k, v, scale: float, n_valid: int):
    """(D̂, N̂) array-level forward, shared by the split and stacked kernels."""
    v = _col_zero(v, n_valid)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_prec(q.dtype)) * scale        # (N̂q, N̂k)
    if n_valid < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    # softmax with the normalizing division folded PAST the AV matmul: the
    # div is an (N̂, N̂) VPU pass; scaling the (D̂, N̂) output by the per-row
    # reciprocal is N̂·D̂ — and numerically slightly better (the sum of
    # e·v is scaled once in f32 instead of rounding each p to bf16 after
    # division).
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)      # (N̂q, 1)
    out = jax.lax.dot_general(                        # v·eᵀ → (D̂, N̂q)
        v, e.astype(v.dtype), dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_prec(v.dtype))
    return out * r.reshape(1, -1)


def _attn_bwd_kernel_tn(q_ref, k_ref, v_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, *,
                        scale: float, n_valid: int):
    dq, dk, dv = _tn_bwd_math(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
                              do_ref[0, 0], scale, n_valid)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _tn_bwd_math(q, k, v, do, scale: float, n_valid: int, o=None):
    """(D̂, N̂) array-level backward, shared by the split and stacked kernels.

    When the caller passes the SAVED forward output `o`, the v·pᵀ recompute
    is skipped — one of the six MXU passes.  The stacked model path does:
    `out` is already live in HBM as the out-projection wgrad's residual, so
    saving it costs no extra memory."""
    f32 = jnp.float32
    q = _col_zero(q, n_valid)             # (D̂, N̂)
    k = _col_zero(k, n_valid)
    v = _col_zero(v, n_valid)
    do = _col_zero(do, n_valid)

    s = jax.lax.dot_general(q, k, dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=f32,
                            precision=_dot_prec(q.dtype)) * scale  # (Nq, Nk)
    if n_valid < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_valid, s, -jnp.inf)
    # normalization folded out of the (N̂, N̂) plane (see _tn_fwd_math):
    # e is the unnormalized softmax numerator, r the per-q-row reciprocal
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)                     # (N̂q, N̂k)
    r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)      # (N̂q, 1)
    eb = e.astype(v.dtype)

    if o is None:
        o = jax.lax.dot_general(v, eb,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=f32,
                                precision=_dot_prec(v.dtype)
                                ) * r.reshape(1, -1)   # (D̂, N̂q)
    # delta[i] = Σ_d do[d,i]·o[d,i] — contract D on the MXU against a ones
    # vector instead of transposing a (1, N̂) sublane reduction into (N̂, 1)
    dd = (do.astype(f32) * o)
    ones = jnp.ones((dd.shape[0], 8), f32)
    delta = jax.lax.dot_general(
        dd, ones, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)[:, :1]         # (N̂q, 1)
    # HIGHEST: dd is f32 and a default-precision pass would truncate it to
    # bf16 on the MXU; this dot is (N̂, D̂)·(D̂, 8) — noise either way in time

    # dvᵀ[d,j] = Σ_i do[d,i]·p[i,j] = Σ_i (do[d,i]·r[i])·e[i,j] — the row
    # reciprocal rides on the (D̂, N̂) do instead of an (N̂, N̂) division
    do_r = (do.astype(f32) * r.reshape(1, -1)).astype(v.dtype)
    dv = jax.lax.dot_general(do_r, eb,
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(v.dtype))  # (D̂, N̂k)
    dp = jax.lax.dot_general(do, v,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(v.dtype))  # (N̂q, N̂k)
    # ds = p⊙(dp − delta)·scale with p = e·r folded as a row broadcast
    ds = (e * ((dp - delta) * (r * scale))).astype(v.dtype)
    dq = jax.lax.dot_general(k, ds,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(k.dtype))  # (D̂, N̂q)
    dk = jax.lax.dot_general(q, ds,
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=f32,
                             precision=_dot_prec(q.dtype))  # (D̂, N̂k)
    return dq, dk, dv


def _tn_specs(B, K, D, N):
    # The LANE dim of a Pallas block must be 128-divisible or the FULL array
    # dim — so the tn blocks carry the true N and Mosaic handles the
    # internal tile padding itself (masking padded lanes in contractions and
    # reductions); no explicit ragged handling is needed in this
    # orientation.  The sublane dim D must be 8-divisible (asserted).
    spec = pl.BlockSpec((1, 1, D, N), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    return spec


def _flash_forward_tn(q, k, v, scale):
    B, K, D, N = q.shape
    assert D % _D_ALIGN == 0, "tn kernel requires an aligned head dim"
    spec = _tn_specs(B, K, D, N)
    n_pad = _round_up(N, _LANES)
    return pl.pallas_call(
        partial(_attn_kernel_tn, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, K, D, N), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (n_pad * n_pad * D * 2),
            bytes_accessed=4 * B * K * n_pad * D * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(q, k, v)


def _flash_backward_tn(q, k, v, do, scale):
    B, K, D, N = q.shape
    assert D % _D_ALIGN == 0, "tn kernel requires an aligned head dim"
    n_pad = _round_up(N, _LANES)
    spec = _tn_specs(B, K, D, N)
    shape = jax.ShapeDtypeStruct((B, K, D, N), q.dtype)
    return pl.pallas_call(
        partial(_attn_bwd_kernel_tn, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=(24 * 1024 * 1024
                              if q.dtype == jnp.float32 else None)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * K * n_pad * n_pad * D,
            bytes_accessed=7 * B * K * n_pad * D * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(q, k, v, do)


# --- stacked-QKV entry point: one (3, B, K, D, N) operand/cotangent --------
#
# The fused projection emits qkv as ONE tensor; feeding it to the kernel
# unsplit (block (3,1,1,D,N)) and emitting dqkv unsplit removes the XLA
# slice fusions on the forward and the concat ("add_bitcast") fusions on the
# backward — ~16 ms/step at config 4 (2026-08-17 HLO study).


def _attn_kernel_qkv_tn(qkv_ref, o_ref, *, scale: float, n_valid: int):
    # one whole-block load, then array indexing — Mosaic cannot slice a
    # sub-ref on an unaligned lane dim, but register-level indexing is free
    qkv = qkv_ref[...]                    # (3, 1, 1, D̂, N̂)
    out = _tn_fwd_math(qkv[0, 0, 0], qkv[1, 0, 0], qkv[2, 0, 0],
                       scale, n_valid)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _attn_bwd_kernel_qkv_tn(qkv_ref, do_ref, o_ref, dqkv_ref, *,
                            scale: float, n_valid: int):
    qkv = qkv_ref[...]
    dq, dk, dv = _tn_bwd_math(qkv[0, 0, 0], qkv[1, 0, 0], qkv[2, 0, 0],
                              do_ref[0, 0], scale, n_valid,
                              o=o_ref[0, 0])
    dqkv_ref[...] = jnp.stack([dq, dk, dv]
                              ).astype(dqkv_ref.dtype)[:, None, None]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def flash_attention_qkv_tn(qkv: jax.Array, scale: float) -> jax.Array:
    """Fused SDPA on a stacked (3, B, K, D, N) qkv operand → (B, K, D, N).

    The model's flash path (ops/attention.py self_attention) uses this form;
    see flash_attention_tn for the orientation rationale."""
    if qkv.shape[4] > _SINGLE_BLOCK_MAX:
        return flash_attention_tn(qkv[0], qkv[1], qkv[2], scale)
    return _flash_forward_qkv_tn(qkv, scale)


def _flash_forward_qkv_tn(qkv, scale):
    _, B, K, D, N = qkv.shape
    assert D % _D_ALIGN == 0, "tn kernel requires an aligned head dim"
    qkv_spec = pl.BlockSpec((3, 1, 1, D, N), lambda b, h: (0, b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = _tn_specs(B, K, D, N)
    n_pad = _round_up(N, _LANES)
    return pl.pallas_call(
        partial(_attn_kernel_qkv_tn, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[qkv_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, D, N), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * (n_pad * n_pad * D * 2),
            bytes_accessed=4 * B * K * n_pad * D * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(qkv)


def _qkv_tn_fwd(qkv, scale):
    out = flash_attention_qkv_tn(qkv, scale)
    # `out` is already kept alive as the out-projection wgrad's residual, so
    # saving it here is free — and lets the backward kernel skip the v·pᵀ
    # output recompute (one of its six MXU passes)
    return out, (qkv, out)


def _qkv_tn_bwd(scale, residuals, g):
    qkv, out = residuals
    _, B, K, D, N = qkv.shape
    if N > _SINGLE_BLOCK_MAX:
        bnd = lambda t: jnp.swapaxes(t, 2, 3)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: flash_attention(q_, k_, v_, scale),
            bnd(qkv[0]), bnd(qkv[1]), bnd(qkv[2]))
        dq, dk, dv = vjp(bnd(g))
        return (jnp.stack([bnd(dq), bnd(dk), bnd(dv)]),)
    assert D % _D_ALIGN == 0, "tn kernel requires an aligned head dim"
    n_pad = _round_up(N, _LANES)
    qkv_spec = pl.BlockSpec((3, 1, 1, D, N), lambda b, h: (0, b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = _tn_specs(B, K, D, N)
    dqkv = pl.pallas_call(
        partial(_attn_bwd_kernel_qkv_tn, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[qkv_spec, do_spec, do_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((3, B, K, D, N), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # f32 at N̂=1025: three (N̂,N̂) f32 buffers + HIGHEST-precision
            # operand splits + the whole stacked qkv block ≈ 27 MB scoped
            # (measured OOM at 24 MB); v5e has 128 MB physical VMEM
            vmem_limit_bytes=(32 * 1024 * 1024
                              if qkv.dtype == jnp.float32 else None)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * K * n_pad * n_pad * D,
            bytes_accessed=7 * B * K * n_pad * D * 4,
            transcendentals=B * K * n_pad * n_pad),
        interpret=_interpret(),
    )(qkv, g, out)
    return (dqkv,)


flash_attention_qkv_tn.defvjp(_qkv_tn_fwd, _qkv_tn_bwd)


# ---------------------------------------------------------------------------
# fused qkv-projection + attention (forward unchanged; megakernel backward)
# ---------------------------------------------------------------------------
#
# The last structural cost at the kernel boundary (2026-08-18 trace) is the
# backward's dqkv tensor: XLA materializes it in HBM TWICE — once d-minor
# for the wgrad GEMM, once for the dgrad (~24 ms/step of relayout copies at
# config 4).  Widening the differentiated unit to x·Wqkv → attention lets
# ONE Pallas backward program per (batch, head) keep dq/dk/dv in VMEM and
# contract them immediately:
#     dx  (B, N, H)  — accumulated over the head grid axis in a f32 scratch,
#                      written once per batch row (k is 'arbitrary'/serial)
#     dW  (K, H, 3D) — accumulated over the batch grid axis in a persistent
#                      f32 scratch, flushed on the last batch row
# dqkv never exists in HBM.  bf16-only (the training path): the f32 parity
# path keeps the unfused einsum AD, whose residual set in f32 would blow the
# scoped-VMEM budget here anyway.


def _fused_qkv_bwd_kernel(qkv_ref, g_ref, o_ref, x_ref, w_ref,
                          dx_ref, dw_ref, dx_acc, dw_acc, *,
                          scale: float, n_valid: int):
    b = pl.program_id(0)
    h = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_h = pl.num_programs(1)
    f32 = jnp.float32

    qkv = qkv_ref[...]                     # (3, 1, 1, D̂, N̂)
    dq, dk, dv = _tn_bwd_math(qkv[0, 0, 0], qkv[1, 0, 0], qkv[2, 0, 0],
                              g_ref[0, 0], scale, n_valid, o=o_ref[0, 0])
    dstack = jnp.concatenate([dq, dk, dv], axis=0)      # (3D̂, N̂) f32
    dsb = dstack.astype(qkv.dtype)

    x = x_ref[0]                           # (N̂, H) input dtype
    wk = w_ref[0]                          # (3D̂, H)

    @pl.when(h == 0)
    def _init_dx():
        dx_acc[...] = jnp.zeros(dx_acc.shape, f32)

    # dx[n, :] += Σ_{s,d} dqkv[sd, n] · W[sd, :]
    dx_acc[...] += jax.lax.dot_general(
        dsb, wk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=_dot_prec(dsb.dtype))

    @pl.when(h == n_h - 1)
    def _emit_dx():
        dx_ref[0] = dx_acc[...].astype(dx_ref.dtype)

    @pl.when(b == 0)
    def _init_dw():
        dw_acc[h] = jnp.zeros(dw_acc.shape[1:], f32)

    # dW_k[:, sd] += Σ_n x[n, :]ᵀ · dqkv[sd, n]ᵀ
    dw_acc[h] += jax.lax.dot_general(
        x, dsb, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=f32, precision=_dot_prec(dsb.dtype))

    @pl.when(b == n_b - 1)
    def _emit_dw():
        dw_ref[0] = dw_acc[h].astype(dw_ref.dtype)


def _fused_qkv_bwd(x, w, qkv, out, g, scale):
    """Megakernel backward: returns (dx (B,N,H), dw (H,3,K,D))."""
    _, B, K, D, N = qkv.shape
    H = x.shape[-1]
    # (H, 3, K, D) → (K, 3D, H): per-head slabs with legal block tiling
    wt = jnp.transpose(w, (2, 1, 3, 0)).reshape(K, 3 * D, H).astype(x.dtype)

    qkv_spec = pl.BlockSpec((3, 1, 1, D, N), lambda b, h: (0, b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    dn_spec = _tn_specs(B, K, D, N)
    x_spec = pl.BlockSpec((1, N, H), lambda b, h: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, 3 * D, H), lambda b, h: (h, 0, 0),
                          memory_space=pltpu.VMEM)
    dx_spec = pl.BlockSpec((1, N, H), lambda b, h: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    dw_spec = pl.BlockSpec((1, H, 3 * D), lambda b, h: (h, 0, 0),
                           memory_space=pltpu.VMEM)

    dx, dwt = pl.pallas_call(
        partial(_fused_qkv_bwd_kernel, scale=scale, n_valid=N),
        grid=(B, K),
        in_specs=[qkv_spec, dn_spec, dn_spec, x_spec, w_spec],
        out_specs=(dx_spec, dw_spec),
        out_shape=(jax.ShapeDtypeStruct((B, N, H), x.dtype),
                   jax.ShapeDtypeStruct((K, H, 3 * D), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((N, H), jnp.float32),
                        pltpu.VMEM((K, H, 3 * D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # both axes carry accumulator state — serial grid
            dimension_semantics=("arbitrary", "arbitrary"),
            # ~45 MB scoped: the (N̂,N̂) f32 planes + x/w blocks + the two
            # accumulators (dW alone is 12.6 MB at config-4 geometry);
            # v5e has 128 MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * K * N * (5 * N * D + 2 * 3 * D * H),
            bytes_accessed=B * K * N * D * 20 + B * N * H * 4,
            transcendentals=B * K * N * N),
        interpret=_interpret(),
    )(qkv, g, out, x, wt)
    # (K, H, 3D) → (H, 3, K, D) param layout
    dw = jnp.transpose(dwt.reshape(K, H, 3, D), (1, 2, 0, 3))
    return dx, dw.astype(w.dtype)


# bf16-only megakernel backward switch (see block comment above); the f32
# parity path and long sequences use the plain einsum-AD composition.
#
# MEASURED NEGATIVE RESULT (2026-08-18, config 4, v5e): the megakernel does
# kill the dqkv relayout copies (41 → 6.7 ms/step of %copy in the device
# trace) — but the in-kernel dgrad/wgrad contractions run ~50% MXU and
# SERIALIZE with the attention dots instead of overlapping the way XLA's
# standalone GEMMs overlap with neighboring fusions: per-program time 8.7 →
# 16.4 µs, backward lane 53.3 → 100.5 ms/step, net step +8 ms (359.7 →
# 367.8).  XLA's copy+GEMM schedule wins; default stays False.  The code
# remains as an option (and a receipt) — a future 2-heads-per-program
# variant would widen the contractions to 384 and might flip the sign.
FUSED_QKV_GRADS = False


def _qkv_project_tn(x, w):
    qkv = jnp.einsum("bnh,hskd->sbkdn", x, w.astype(x.dtype),
                     preferred_element_type=jnp.float32)  # (3, B, K, D, N)
    return qkv.astype(x.dtype)


@jax.custom_vjp
def fused_qkv_attention(x: jax.Array, w: jax.Array) -> jax.Array:
    """QKV projection + fused SDPA: (B, N, H) x, (H, 3, K, D) w → (B, K, D, N).

    Forward is the same einsum + flash_attention_qkv_tn the model ran
    before; the backward runs the megakernel when FUSED_QKV_GRADS and the
    operands are bf16 short-sequence, else the unfused composition."""
    qkv = _qkv_project_tn(x, w)
    return flash_attention_qkv_tn(qkv, qkv.shape[3] ** -0.5)


def _fused_qkv_fwd(x, w):
    qkv = _qkv_project_tn(x, w)
    out = flash_attention_qkv_tn(qkv, qkv.shape[3] ** -0.5)
    return out, (x, w, qkv, out)


def _fused_qkv_bwd_rule(residuals, g):
    x, w, qkv, out = residuals
    scale = qkv.shape[3] ** -0.5
    use_mega = (FUSED_QKV_GRADS and qkv.dtype == jnp.bfloat16
                and qkv.shape[4] <= _SINGLE_BLOCK_MAX
                and qkv.shape[3] % _D_ALIGN == 0)
    if use_mega:
        return _fused_qkv_bwd(x, w, qkv, out, g, scale)
    # unfused: dqkv through the stacked kernel, then the einsum transposes
    (dqkv,) = _qkv_tn_bwd(scale, (qkv, out), g)
    dx = jnp.einsum("sbkdn,hskd->bnh", dqkv.astype(x.dtype),
                    w.astype(x.dtype), preferred_element_type=jnp.float32
                    ).astype(x.dtype)
    dw = jnp.einsum("bnh,sbkdn->hskd", x, dqkv.astype(x.dtype),
                    preferred_element_type=jnp.float32).astype(w.dtype)
    return dx, dw


fused_qkv_attention.defvjp(_fused_qkv_fwd, _fused_qkv_bwd_rule)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_tn(q: jax.Array, k: jax.Array, v: jax.Array,
                       scale: float) -> jax.Array:
    """Fused SDPA on TRANSPOSED (B, K, D, N) operands → (B, K, D, N) output.

    Same math as flash_attention; this orientation matches the physical
    layout the surrounding GEMMs produce/consume so XLA inserts no copies.
    Long sequences (N > _SINGLE_BLOCK_MAX) fall back to the streaming ND
    path via two transposes — amortized by the O(N²) kernel work there."""
    if q.shape[3] > _SINGLE_BLOCK_MAX:
        bnd = lambda t: jnp.swapaxes(t, 2, 3)
        return bnd(flash_attention(bnd(q), bnd(k), bnd(v), scale))
    return _flash_forward_tn(q, k, v, scale)


def _tn_fwd(q, k, v, scale):
    if q.shape[3] > _SINGLE_BLOCK_MAX:
        return flash_attention_tn(q, k, v, scale), (q, k, v)
    return _flash_forward_tn(q, k, v, scale), (q, k, v)


def _tn_bwd(scale, residuals, g):
    q, k, v = residuals
    if q.shape[3] > _SINGLE_BLOCK_MAX:
        bnd = lambda t: jnp.swapaxes(t, 2, 3)
        _, vjp = jax.vjp(
            lambda q_, k_, v_: flash_attention(q_, k_, v_, scale),
            bnd(q), bnd(k), bnd(v))
        dq, dk, dv = vjp(bnd(g))
        return bnd(dq), bnd(dk), bnd(dv)
    return _flash_backward_tn(q, k, v, g, scale)


flash_attention_tn.defvjp(_tn_fwd, _tn_bwd)


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------

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
    if q.shape[2] <= _SINGLE_BLOCK_MAX:
        return _flash_forward(q, k, v, scale), (q, k, v, None, None)
    out, lse = _flash_forward(q, k, v, scale, with_lse=True)
    return out, (q, k, v, out, lse)


# Whether to run the fused single-block Pallas backward instead of the XLA
# recompute VJP at short sequence lengths.  Measured on v5e in bf16,
# backward-only: (8,16,513,64) Pallas 2.82 ms vs XLA 3.15 ms;
# (32,16,513,64) 5.06 vs 8.74 ms; (32,16,1025,64) 12.1 vs 27.3 ms — the
# XLA recompute materializes the (B,K,N,N) probabilities in HBM and falls
# further behind as batch·N² grows, so the fused kernel is the default.
# (An earlier tiny-batch (2,16,513,64) measurement had XLA ahead by 12%;
# that regime is not the training workload.)  Long sequences
# (N > _SINGLE_BLOCK_MAX) always take the blocked Pallas backward.
USE_PALLAS_BACKWARD = True


def _bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    if o is not None:  # long sequence: blocked backward from saved (o, lse)
        return _flash_backward_blocked(q, k, v, o, lse, g, scale)
    if USE_PALLAS_BACKWARD:
        return _flash_backward_pallas(q, k, v, g, scale)
    _, vjp = jax.vjp(lambda q_, k_, v_: _reference_sdpa(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
