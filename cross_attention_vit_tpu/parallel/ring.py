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
preferred_element_type.  Exactness (vs the dense reference) is ulp-level,
not approximate — tested in tests/test_ring.py on an 8-virtual-device mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   scale: float, axis_name: str, axis_size: int) -> jax.Array:
    """Per-shard body: call inside `shard_map` over `axis_name`.

    q, k, v: (B, K, N/P, D) local sequence shards (P = axis_size).  Returns
    the (B, K, N/P, D) attention output for the local queries, exact over
    the GLOBAL key/value sequence.  Non-causal (the ViTs attend fully).
    """
    if axis_size == 1:
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

    def body(carry, _):
        m, l, acc, kb, vb = carry
        dots = jnp.einsum("bknd,bkmd->bknm", q, kb,
                          preferred_element_type=f32) * scale
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

    (m, l, acc, _, _), _ = lax.scan(body, (m0, l0, acc0, k, v), None,
                                    length=axis_size)
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
