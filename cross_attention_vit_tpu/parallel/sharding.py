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
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: tuple[str, ...], ndim: int) -> P:
    names = [p for p in path]
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""

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


def param_specs(params) -> object:
    """Pytree of PartitionSpec matching `params`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [_spec_for(_path_names(path), leaf.ndim) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def param_sharding(params, mesh: Mesh) -> object:
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [NamedSharding(mesh, _spec_for(_path_names(path), leaf.ndim))
                 for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    return jax.device_put(params, param_sharding(params, mesh))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
