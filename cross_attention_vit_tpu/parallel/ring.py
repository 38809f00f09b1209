"""Ring attention: exact sequence-parallel attention over a mesh axis.

The reference never shards the sequence axis — its attention is always a
full dense (B,H,N,N) softmax on one GPU (model_cross.py:55-59), and SURVEY
§5's long-context row notes parity needs none.  This module is the growth
path past a single chip's HBM: tokens are sharded over a mesh axis, each
device holds a (B, K, N/P, D) slice of q/k/v, and exact full attention is
computed by rotating the k/v blocks around the ring with `lax.ppermute`
while an online-softmax accumulator (the same running (m, l, acc) recurrence
as kernels/flash_attention.py) folds in one block per step.  P-1 ring steps
overlap compute with neighbor ICI transfers; no device ever materializes the
(N, N) score matrix or the full k/v.

Composition with the single-chip kernels: per-step local blocks are
(N/P, N/P) attention — at long N each block is itself flash-kernel material,
so on-chip streaming (kernels/flash_attention.py) handles within-device
scale and the ring handles across-device scale.  Here each block runs as
plain XLA dot_generals (MXU-bound at block sizes ≥ 512), which keeps the op
differentiable through `lax.scan` + `ppermute`'s transpose rule — the
backward is itself a ring program, derived by AD rather than hand-scheduled.

Numerics match ops/attention._sdpa: scores and softmax statistics accumulate
in float32 regardless of input dtype; the p·v matmul accumulates f32 via
preferred_element_type.  The MATH is exact (same online-softmax recurrence
as the dense reference) — ulp-level on CPU (tests/test_ring.py, 8 virtual
devices) and at HIGHEST matmul precision on TPU.  At TPU-DEFAULT matmul
precision both this path and _sdpa round MXU inputs to bf16 mantissas, and
the ring's padded key blocks tile/round differently from the dense dot, so
the two drift by up to ~2e-3 on v5e while both staying within first-order
bf16 rounding of the exact answer (tests_tpu/test_fallbacks_onchip.py
derives and pins that bound).  Precision is left at default deliberately:
the score/p·v GEMMs are the entire SP FLOP budget.

Model integration (`config.seq_parallel = P`): ops/attention.self_attention
dispatches its SDPA through `sharded_ring_sdpa` when the ambient seq mesh
(set_seq_mesh — the Trainer sets it from its mesh, the same convention as
parallel/pipeline.set_pipeline_mesh) carries a 'seq' axis.  The live ViT
sequences (512·M+1 tokens — the +1 CLS makes N ragged) don't divide by P, so
the global wrapper zero-pads N up to a multiple of P and masks the padded
KEY positions inside the ring (exactly — see `ring_attention`'s n_valid).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Ambient sequence-parallel mesh: models read this instead of threading a
# Mesh through every apply() signature (same convention as
# parallel/pipeline._ACTIVE_MESH).  None → dense fallback, same math.
_ACTIVE_MESH: Mesh | None = None


def set_seq_mesh(mesh: Mesh | None) -> None:
    """Set (or clear, with None) the mesh sharded_ring_sdpa uses by default."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_seq_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   scale: float, axis_name: str, axis_size: int,
                   n_valid: int | None = None,
                   force_ring: bool = False) -> jax.Array:
    """Per-shard body: call inside `shard_map` over `axis_name`.

    q, k, v: (B, K, N/P, D) local sequence shards (P = axis_size).  Returns
    the (B, K, N/P, D) attention output for the local queries, exact over
    the GLOBAL key/value sequence.  Non-causal (the ViTs attend fully).

    n_valid: global count of REAL key/value positions when the sequence was
    zero-padded up to a multiple of P (sharded_ring_sdpa does this for the
    ViTs' ragged 512·M+1 sequences).  Padded keys get score -1e30: exact,
    because once any real key's score enters the running max, the correction
    factor exp(-1e30 − m) underflows to exactly 0 and flushes any transient
    padded contribution out of the accumulator (every query row sees real
    keys — n_valid ≥ 1 — so the transient never survives to the output).
    Padded QUERY rows compute garbage; the caller slices them off.

    force_ring=True runs the scan body even at axis_size 1 (the ppermute is
    then an identity hop) — lets the on-chip lane (tests_tpu) exercise the
    ring's online-softmax math on a single real device.
    """
    if axis_size == 1 and not force_ring:
        from ..ops.attention import _sdpa
        return _sdpa(q, k, v, scale)
    f32 = jnp.float32
    b, heads, n_loc, d = q.shape
    m0 = jnp.full((b, heads, n_loc), -jnp.inf, f32)
    l0 = jnp.zeros((b, heads, n_loc), f32)
    acc0 = jnp.zeros((b, heads, n_loc, d), f32)
    # each step: fold the currently-held k/v block, then pass it to the next
    # rank (single-hop neighbor exchange — rides ICI, never DCN)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    rank = lax.axis_index(axis_name)
    masked = n_valid is not None and n_valid < axis_size * n_loc

    def body(carry, step):
        m, l, acc, kb, vb = carry
        dots = jnp.einsum("bknd,bkmd->bknm", q, kb,
                          preferred_element_type=f32) * scale
        if masked:
            # at scan step s this rank holds the block that started on rank
            # (rank - s) mod P → its global positions are src·n_loc + [0, n_loc)
            src = (rank - step) % axis_size
            pos = src * n_loc + jnp.arange(n_loc)
            dots = jnp.where(pos < n_valid, dots, jnp.asarray(-1e30, f32))
        m_new = jnp.maximum(m, dots.max(-1))
        p_blk = jnp.exp(dots - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + p_blk.sum(-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bknm,bkmd->bknd", p_blk.astype(vb.dtype), vb,
            preferred_element_type=f32)
        kb = lax.ppermute(kb, axis_name, perm)
        vb = lax.ppermute(vb, axis_name, perm)
        return (m_new, l, acc, kb, vb), None

    (m, l, acc, _, _), _ = lax.scan(body, (m0, l0, acc0, k, v),
                                    jnp.arange(axis_size))
    return (acc / l[..., None]).astype(q.dtype)


def ring_sdpa(mesh: Mesh, axis_name: str = "seq"):
    """Global-array wrapper: returns sdpa(q, k, v, scale) whose sequence axis
    is sharded over `mesh`'s `axis_name` (batch stays on 'data' if the mesh
    has one).  Drop-in for ops/attention._sdpa on (B, K, N, D) operands;
    N must divide by the axis size.
    """
    try:
        from jax import shard_map
        rep_kw = {"check_vma": False}
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}

    axis_size = mesh.shape[axis_name]
    batch = "data" if "data" in mesh.shape else None
    spec = P(batch, None, axis_name, None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, **rep_kw)
    def _sharded(q, k, v):
        return ring_attention(q, k, v, scale=q.shape[-1] ** -0.5,
                              axis_name=axis_name, axis_size=axis_size)

    def apply(q, k, v):
        sharding = NamedSharding(mesh, spec)
        q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
        return _sharded(q, k, v)

    return apply


def _shard_map_partial(mesh: Mesh, axis_name: str):
    """shard_map manual over {axis_name} only — 'data'/'model' stay
    GSPMD-auto inside the body (the parallel/pipeline.py convention), so SP
    composes with DP/TP in one jit."""
    try:
        sm = jax.shard_map
        return lambda f, in_specs, out_specs: sm(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            axis_names={axis_name}, check_vma=False)
    except AttributeError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map
        return lambda f, in_specs, out_specs: shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            auto=frozenset(n for n in mesh.axis_names if n != axis_name),
            check_rep=False)


def sharded_ring_sdpa(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                      mesh: Mesh | None = None,
                      axis_name: str = "seq") -> jax.Array:
    """In-jit drop-in for ops/attention._sdpa on (B, K, N, D) operands with
    the sequence axis sharded over the mesh's `axis_name`.

    This is the model-path entry (`config.seq_parallel` routes
    ops/attention.self_attention here): callable inside the jitted train
    step, composing with GSPMD-auto 'data'/'model' axes.  N is zero-padded up
    to a multiple of the axis size and the padded keys are masked exactly
    (ring_attention n_valid); the padded query rows are sliced off.  Falls
    back to the dense _sdpa bit-identically when no mesh / axis is active.
    """
    if mesh is None:
        mesh = _ACTIVE_MESH
    p_seq = mesh.shape.get(axis_name, 1) if mesh is not None else 1
    if p_seq <= 1:
        from ..ops.attention import _sdpa
        return _sdpa(q, k, v, scale)

    n = q.shape[2]
    pad = (-n) % p_seq
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(x, widths) for x in (q, k, v))

    spec = P(None, None, axis_name, None)
    wrap = _shard_map_partial(mesh, axis_name)
    out = wrap(
        functools.partial(ring_attention, scale=scale, axis_name=axis_name,
                          axis_size=p_seq, n_valid=n if pad else None),
        (spec, spec, spec), spec)(q, k, v)
    return out[:, :, :n] if pad else out
