"""Pipeline parallelism (GPipe) over a 'pipe' mesh axis.

The reference has no pipeline story (SURVEY.md §2.3: "Pipeline parallel:
NO") — at 44-255 M params its models fit one accelerator.  A framework that
scales past that needs one, and on TPU the idiomatic shape is NOT torch-style
rank-to-stage process code: it is a single SPMD program where

  * the transformer trunk's per-layer parameter trees are *stacked* on a
    leading depth axis and sharded over 'pipe' (stage s holds layers
    [s·L, (s+1)·L));
  * the batch is split into microbatches and a `lax.scan` over
    `num_microbatches + num_stages - 1` ticks runs the GPipe schedule, with
    `jax.lax.ppermute` rotating activations stage→stage+1 over ICI;
  * reverse-mode AD through the scan+ppermute yields the reverse schedule
    (backward bubble included) automatically — no hand-written backward
    pipeline;
  * 'pipe' is manual (shard_map) while 'data'/'model' stay GSPMD-auto, so
    DP batch sharding and head-aligned TP compose with PP in one jit.

Bubble fraction is the classic (S-1)/(MB+S-1); pick num_microbatches ≥ 4·S
to amortize.  Dropout semantics under PP are *defined* here as
per-(layer, microbatch) masks: key_l folded with the microbatch index —
the same independence a larger batch would have (matching the grad-accum
convention in train/trainer.py).  The serial fallback implements identical
semantics, so mesh and mesh-less paths agree bit-for-bit with dropout ON
(tested in tests/test_pipeline.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Ambient pipeline mesh: models read this instead of threading a Mesh object
# through every apply() signature (same module-level-knob convention as
# ops.layers.TIE_KEY_MODE).  None → serial fallback, same math.
_ACTIVE_MESH: Mesh | None = None


def set_pipeline_mesh(mesh: Mesh | None) -> None:
    """Set (or clear, with None) the mesh pipeline_layers uses by default."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_pipeline_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def stack_layers(layers: list) -> dict:
    """Stack a list of identically-shaped per-layer param trees into one tree
    whose leaves carry a leading depth axis — the layout PP shards over
    'pipe' and `lax.scan` consumes."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layers(stacked, depth: int) -> list:
    """Inverse of stack_layers (for checkpoint interop with the list form)."""
    return [jax.tree.map(lambda a: a[i], stacked) for i in range(depth)]


def stacked_depth(stacked) -> int:
    return jax.tree.leaves(stacked)[0].shape[0]


def _microbatch(x: jax.Array, num_microbatches: int) -> jax.Array:
    """(B, ...) → (MB, B/MB, ...) with STRIDED grouping: microbatch i holds
    the rows {b : b % MB == i}.

    Strided (not contiguous-block) grouping is what makes GPipe compose with
    contiguous-block DP batch sharding without communication: each data
    shard contributes an equal contiguous slice to EVERY microbatch, so the
    (MB, micro) tensor is dim-1 'data'-shardable and the exit merge is a
    local transpose+reshape.  Contiguous grouping instead puts whole
    microbatches on single data shards — GSPMD then has to fully replicate
    the activations at the shard_map boundary ("Involuntary full
    rematerialization", the r3 multichip-dryrun warning).  The grouping
    depends only on MB, so the serial fallback stays bit-identical to the
    SPMD schedule (same rows → same microbatch index → same dropout fold).
    """
    B = x.shape[0]
    if B % num_microbatches:
        raise ValueError(f"batch {B} not divisible by "
                         f"num_microbatches={num_microbatches}")
    mb = x.reshape(B // num_microbatches, num_microbatches, *x.shape[1:])
    return jnp.swapaxes(mb, 0, 1)


def _unmicrobatch(out: jax.Array) -> jax.Array:
    """Inverse of _microbatch: (MB, micro, ...) → (B, ...) in original row
    order (row b sits at [b % MB, b // MB])."""
    mb, micro = out.shape[:2]
    return jnp.swapaxes(out, 0, 1).reshape(mb * micro, *out.shape[2:])


def _serial_reference(stacked, layer_fn, x, keys, num_microbatches: int):
    """Mesh-less path: identical microbatch split + per-(layer, microbatch)
    key folding, executed sequentially.  Bit-identical to the SPMD schedule
    (same ops in the same f32 order per microbatch)."""
    depth = stacked_depth(stacked)
    mbs = _microbatch(x, num_microbatches)

    def run_mb(_, j):
        h = jax.lax.dynamic_index_in_dim(mbs, j, 0, keepdims=False)

        def run_layer(h, li):
            layer = jax.tree.map(lambda a: a[li], stacked)
            k = jax.random.fold_in(keys[li], j)
            return layer_fn(layer, h, k), None

        h, _ = jax.lax.scan(run_layer, h, jnp.arange(depth))
        return None, h

    _, out = jax.lax.scan(run_mb, None, jnp.arange(num_microbatches))
    return _unmicrobatch(out)


def pipeline_layers(stacked, layer_fn, x, keys, *,
                    num_microbatches: int, mesh: Mesh | None = None,
                    data_axis: str = "data"):
    """Run `layer_fn` over `stacked` layers with a GPipe schedule.

    stacked   : param tree, every leaf (depth, ...) — see stack_layers.
    layer_fn  : (layer_params, x, key) → x, the per-layer body (exactly the
                signature models/model_vit.py uses for its trunk loop).
    x         : (B, ...) activations entering the trunk.
    keys      : (depth,) PRNG keys, one per layer; folded with the
                microbatch index inside the schedule.
    mesh      : mesh with a 'pipe' axis; defaults to the ambient mesh set by
                set_pipeline_mesh.  None (or pipe size 1) → serial fallback.
    """
    if mesh is None:
        mesh = _ACTIVE_MESH
    S = mesh.shape.get("pipe", 1) if mesh is not None else 1
    if S <= 1:
        return _serial_reference(stacked, layer_fn, x, keys, num_microbatches)

    depth = stacked_depth(stacked)
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by pipe={S} stages")
    L = depth // S
    MB = num_microbatches
    d_size = mesh.shape.get(data_axis, 1)
    if d_size > 1 and (x.shape[0] // d_size) % MB:
        raise ValueError(
            f"per-data-shard batch {x.shape[0]}/{d_size} not divisible by "
            f"num_microbatches={MB} — the strided microbatch layout needs "
            f"every data shard to contribute equally to every microbatch "
            f"(raise the batch or lower pipeline_microbatches)")
    mbs = _microbatch(x, MB)
    # microbatches stay batch-sharded over 'data' (GSPMD-auto inside the
    # manual-'pipe' shard_map); params/keys shard their depth axis over
    # 'pipe'.  With the strided grouping this constraint is what the entry
    # reshape propagates anyway — comm-free in AND out (no involuntary
    # replicates at the shard_map boundary).
    if d_size > 1:
        mbs = jax.lax.with_sharding_constraint(
            mbs, NamedSharding(mesh, P(None, data_axis)))

    def body(stage_tree, mbs, stage_keys):
        # local leaves: (L, ...) — this stage's contiguous layer block
        s_idx = jax.lax.axis_index("pipe")
        state = jnp.zeros(mbs.shape[1:], mbs.dtype)
        outputs = jnp.zeros_like(mbs)

        def tick(carry, t):
            state, outputs = carry
            j = t - s_idx                      # microbatch index at this stage
            jc = jnp.clip(j, 0, MB - 1)
            first_in = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, MB - 1), 0, keepdims=False)
            h = jnp.where(s_idx == 0, first_in, state)
            for li in range(L):
                layer = jax.tree.map(lambda a: a[li], stage_tree)
                h = layer_fn(layer, h, jax.random.fold_in(stage_keys[li], jc))
            valid = (s_idx == S - 1) & (j >= 0) & (j < MB)
            upd = jax.lax.dynamic_update_index_in_dim(outputs, h, jc, 0)
            outputs = jnp.where(valid, upd, outputs)
            state = jax.lax.ppermute(
                h, "pipe", [(i, (i + 1) % S) for i in range(S)])
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(MB + S - 1))
        # only the last stage holds real outputs; psum replicates them back
        outputs = jnp.where(s_idx == S - 1, outputs, jnp.zeros_like(outputs))
        return jax.lax.psum(outputs, "pipe")

    out = jax.shard_map(body, mesh=mesh,
                        in_specs=(P("pipe"), P(), P("pipe")),
                        out_specs=P(), axis_names={"pipe"},
                        check_vma=False)(stacked, mbs, keys)
    return _unmicrobatch(out)


def pipeline_param_spec(base_spec: P) -> P:
    """Prefix a per-layer TP spec with the stacked depth axis over 'pipe'."""
    return P("pipe", *base_spec)


def bubble_fraction(num_stages: int, num_microbatches: int) -> float:
    """GPipe idle fraction: (S-1)/(MB+S-1)."""
    return (num_stages - 1) / (num_microbatches + num_stages - 1)
