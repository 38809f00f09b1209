"""Sharding rules: param-path → PartitionSpec.

Data parallelism: batches are sharded on the mesh 'data' axis; GSPMD inserts
the gradient psum — the DDP all-reduce equivalent (SURVEY.md §2.3).

Tensor parallelism (Megatron-style, head-aligned — the layouts in
ops/initializers.py make this a pure axis shard, no reshards):

  qkv kernel   (H, 3, K, D) → P(None, None, 'model', None)   column-split
  wq/wk/wv     (H, K, D)    → P(None, 'model', None)          column-split
      bias     (K, D)       → P('model', None)
  out/proj     (K, D, H)    → P('model', None, None)          row-split → psum
  ffn/head fc1 (H, mlp)     → P(None, 'model')                column-split
      bias     (mlp,)       → P('model')
  fc2          (mlp, out)   → P('model', None)                row-split → psum
  everything else            replicated

Row splits shard the contracting (input) dim, so even the 2-wide
classification head fc2 shards cleanly — only its mlp input axis is split.

FSDP / ZeRO (`fsdp=True`): every large parameter additionally shards its
largest still-free axis over the 'data' axis.  Params, gradients, and Adam
moments then live distributed across DP ranks (optim.init's zeros_like
inherits the placement); GSPMD inserts the per-layer all-gather at use and
turns the gradient all-reduce into a reduce-scatter — the FSDP/ZeRO-3
schedule, derived entirely from sharding annotations (no wrapper modules).
The reference has no equivalent (SURVEY.md §2.3: "Gradient accumulation /
ZeRO / FSDP: NO"); at 44-255 M params it never needed one, but a framework
that scales past a single chip's HBM does.
"""

from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Parameters smaller than this stay replicated under FSDP: gathering a few
# KB per layer costs more in latency than the memory it saves (the same
# min-size convention as torch FSDP's min_num_params wrapping policy).
FSDP_MIN_SIZE = 2 ** 15


def _spec_for(path: tuple[str, ...], ndim: int) -> P:
    names = [p for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    grand = names[-3] if len(names) >= 3 else ""

    # MoE expert subtree (parallel/moe.py init_moe_ffn): fc1/fc2 kernels are
    # STACKED 3-D (E, H, mlp)/(E, mlp, H), biases (E, ·) — the leading E axis
    # shards over 'expert'; matching the dense fc1/fc2 rules below on these
    # leaves would shard the wrong axis.  The (H, E) router stays replicated
    # (falls through: parent 'router' matches no rule).
    if grand == "experts" and parent in ("fc1", "fc2"):
        if leaf == "kernel":
            return P("expert", None, None)
        if leaf == "bias":
            return P("expert", None)

    if leaf == "kernel":
        if parent == "qkv":
            return P(None, None, "model", None)
        if parent in ("wq", "wk", "wv"):
            return P(None, "model", None)
        if parent in ("out", "proj"):
            return P("model", None, None)
        if parent == "fc1":
            return P(None, "model")
        if parent == "fc2":
            return P("model", None)
    if leaf == "bias":
        if parent in ("wq", "wk", "wv"):
            return P("model", None)
        if parent == "fc1":
            return P("model")
    return P()


def _with_fsdp(spec: P, shape: tuple[int, ...], data_size: int) -> P:
    """Extend a TP spec with a 'data'-axis shard on the largest free axis.

    Skips small params (< FSDP_MIN_SIZE elements) and axes not divisible by
    the data-axis size; a param with no shardable axis stays as-is.
    """
    if data_size <= 1 or math.prod(shape) < FSDP_MIN_SIZE:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, d in enumerate(shape):
        if entries[i] is None and d % data_size == 0 and d > 1:
            if best is None or d > shape[best]:
                best = i
    if best is None:
        return spec
    entries[best] = "data"
    return P(*entries)


def _path_names(path) -> tuple[str, ...]:
    names = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            names.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            names.append(str(p.idx))
        else:
            names.append(str(p))
    return tuple(names)


def param_specs(params, fsdp: bool = False, data_size: int = 0,
                pipeline: bool = False) -> object:
    """Pytree of PartitionSpec matching `params`.

    fsdp=True additionally shards each large param over 'data' (pass the
    mesh's data-axis size as `data_size`).  pipeline=True marks the model as
    using the stacked-trunk PP layout (parallel/pipeline.py): every leaf
    under a top-level 'layers' subtree carries a leading depth axis, sharded
    over 'pipe', with the TP spec shifted right one position."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = []
    for path, leaf in flat:
        names = _path_names(path)
        piped = pipeline and names and names[0] == "layers"
        spec = _spec_for(names, leaf.ndim - (1 if piped else 0))
        if piped:
            spec = P("pipe", *spec)
        if fsdp:
            spec = _with_fsdp(spec, leaf.shape, data_size)
        specs.append(spec)
    return jax.tree_util.tree_unflatten(treedef, specs)


def param_sharding(params, mesh: Mesh, fsdp: bool = False,
                   pipeline: bool = False) -> object:
    data_size = mesh.shape.get("data", 1) if fsdp else 0
    pipeline = pipeline and mesh.shape.get("pipe", 1) > 1
    specs = param_specs(params, fsdp=fsdp, data_size=data_size,
                        pipeline=pipeline)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh: Mesh, fsdp: bool = False,
                 pipeline: bool = False):
    """Place a parameter pytree onto the mesh per the TP (+ optional FSDP /
    PP-stacked) rules."""
    return jax.device_put(params, param_sharding(params, mesh, fsdp=fsdp,
                                                 pipeline=pipeline))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
