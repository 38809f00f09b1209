"""Expert parallelism: Mixture-of-Experts FFN over an 'expert' mesh axis.

The reference has no MoE — every FFN is a dense fc1/GELU/fc2 on one GPU
(model_cross.py:61-67, modelv3.py:84-90) — so, like sequence parallelism
(parallel/ring.py), this module is a growth path past the reference's
scale rather than a parity item: it completes the framework's parallelism
matrix (DP / TP / PP / SP / **EP**).

Design (GShard-style, TPU-first):

  * Routing is top-k over a learned router; dispatch and combine are dense
    one-hot einsums with a STATIC per-expert capacity C — no dynamic shapes,
    no gathers, everything lowers to MXU dot_generals under jit.  Tokens
    routed past an expert's capacity are dropped (their combine weight is
    zero, the residual connection carries them), the standard GShard/Switch
    overflow rule.
  * Expert weights carry a leading E axis sharded over the mesh's 'expert'
    axis (standalone: moe_param_specs/shard_moe_params below; embedded in a
    model tree: parallel/sharding._spec_for recognizes the experts/*
    subtree); the dispatched (E, C, H) token blocks get a
    matching `with_sharding_constraint`, and GSPMD derives the all_to_all
    pair (tokens→experts, experts→tokens) from the annotations — no
    hand-written collectives, the same discipline as the DP/TP/FSDP rules.
  * The router runs in float32 regardless of activation dtype (softmax over
    logits is precision-sensitive); expert GEMMs accumulate f32 like every
    other matmul in the framework (ops/layers.linear convention).
  * Auxiliary load-balance loss (Switch Transformer form): E·Σ_e f_e·p_e,
    where f_e is the fraction of tokens whose top-1 choice is e and p_e the
    mean router probability — scaled so perfectly-uniform routing scores 1.

Exactness: the EP-sharded program is the same einsum math as the serial one;
tests/test_moe.py pins sharded-vs-serial forward AND gradients on an
8-virtual-device mesh, plus an E=1 anchor against the dense FFN.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.initializers import xavier_uniform

# Ambient expert-parallel mesh: models read this instead of threading a Mesh
# through every apply() signature (same convention as
# parallel/pipeline._ACTIVE_MESH / parallel/ring's seq mesh).  None → the
# identical serial program.
_ACTIVE_MESH: Mesh | None = None


def set_expert_mesh(mesh: Mesh | None) -> None:
    """Set (or clear, with None) the mesh model-embedded moe_ffn calls use."""
    global _ACTIVE_MESH
    _ACTIVE_MESH = mesh


def active_expert_mesh() -> Mesh | None:
    return _ACTIVE_MESH


def init_moe_ffn(key: jax.Array, hidden: int, mlp_dim: int,
                 num_experts: int, dtype=jnp.float32) -> dict:
    """Params for a MoE FFN: a (H, E) router plus E stacked fc1/fc2 experts.

    Expert kernels are stacked on a leading E axis — (E, H, mlp) / (E, mlp, H)
    — sharded over the 'expert' mesh axis by moe_param_specs/shard_moe_params
    (or, inside a full model tree, by parallel/sharding's experts/* rule);
    each expert is drawn with the same xavier-uniform law as the dense FFN so
    an E=1 MoE is distribution-identical to ops' mlp."""
    k_router, k_fc1, k_fc2 = jax.random.split(key, 3)

    def stack(k, shape):
        return jnp.stack([xavier_uniform(kk, shape, dtype)
                          for kk in jax.random.split(k, num_experts)])

    return {
        "router": {"kernel": xavier_uniform(k_router, (hidden, num_experts),
                                            jnp.float32)},
        "experts": {
            "fc1": {"kernel": stack(k_fc1, (hidden, mlp_dim)),
                    "bias": jnp.zeros((num_experts, mlp_dim), dtype)},
            "fc2": {"kernel": stack(k_fc2, (mlp_dim, hidden)),
                    "bias": jnp.zeros((num_experts, hidden), dtype)},
        },
    }


def expert_capacity(num_tokens: int, num_experts: int, num_selected: int,
                    capacity_factor: float) -> int:
    """Static per-expert slot count: ceil(k·T/E · factor), min 1."""
    return max(1, math.ceil(num_selected * num_tokens / num_experts
                            * capacity_factor))


def _dispatch_combine(probs: jax.Array, num_selected: int, capacity: int):
    """Top-k routing → (dispatch, combine, aux_loss).

    probs: (T, E) float32 router probabilities.  Returns one-hot dispatch
    (T, E, C) and gate-weighted combine (T, E, C); slots fill in token
    order per expert, choice-0 assignments of ALL tokens claim slots before
    any choice-1 assignment (the GShard priority rule, expressed as a
    cumulative count carried across the k static iterations).

    Gates: for k >= 2 the selected probabilities are renormalized to sum to
    1 per token (the GShard top-2 rule — without it the MoE output scale
    shrinks ~k/E as E grows); for k == 1 the raw top-1 probability is kept
    (the Switch Transformer rule — normalizing a single gate to the constant
    1 would cut the router's gradient path through the combine weights)."""
    t, num_experts = probs.shape
    gate_vals, gate_idx = lax.top_k(probs, num_selected)  # (T, k)
    if num_selected > 1:
        gate_vals = gate_vals / gate_vals.sum(axis=-1, keepdims=True)

    # int32 slot accounting: a float32 cumsum loses integer exactness past
    # ~2^24 tokens, silently corrupting slot assignment at extreme T.
    counts = jnp.zeros((num_experts,), jnp.int32)
    dispatch = jnp.zeros((t, num_experts, capacity), jnp.float32)
    combine = jnp.zeros((t, num_experts, capacity), jnp.float32)
    for i in range(num_selected):
        m = jax.nn.one_hot(gate_idx[:, i], num_experts, dtype=jnp.int32)
        pos = jnp.cumsum(m, axis=0) - 1 + counts  # slot index per (t, e)
        within = (m * (pos < capacity)).astype(jnp.float32)
        counts = counts + m.sum(axis=0)
        slot = jax.nn.one_hot(pos * (pos >= 0) * (pos < capacity), capacity,
                              dtype=jnp.float32) * within[..., None]
        dispatch = dispatch + slot
        combine = combine + gate_vals[:, i][:, None, None] * slot

    # Switch-style balance loss on the top-1 assignment (pre-capacity):
    # uniform routing → f_e = p_e = 1/E → aux = 1.
    top1 = jax.nn.one_hot(gate_idx[:, 0], num_experts, dtype=jnp.float32)
    aux = num_experts * jnp.sum(top1.mean(axis=0) * probs.mean(axis=0))
    return dispatch, combine, aux


def moe_ffn(params: dict, x: jax.Array, *, num_selected: int = 2,
            capacity_factor: float = 1.25,
            mesh: Mesh | None = None) -> tuple[jax.Array, dict[str, Any]]:
    """Apply the MoE FFN to (..., H) activations.

    Returns (y, aux) with y shaped like x and aux = {'balance_loss',
    'dispatch_fraction'} (fraction of token-choices that landed a slot —
    1.0 means zero capacity overflow).  Pass the training mesh to pin the
    EP shardings; mesh=None (or a mesh without an 'expert' axis) runs the
    identical serial program."""
    experts = params["experts"]
    num_experts = experts["fc1"]["kernel"].shape[0]
    lead, hidden = x.shape[:-1], x.shape[-1]
    tokens = x.reshape(-1, hidden)
    t = tokens.shape[0]
    num_selected = min(num_selected, num_experts)
    capacity = expert_capacity(t, num_experts, num_selected, capacity_factor)

    # The router is tiny and softmax-sensitive; the dispatch/combine einsums
    # are one-hot token MOVEMENT, not math — at the TPU default matmul
    # precision their f32 operands would round through bf16 (a measured
    # 6e-3 drift on v5e), so all three run at Precision.HIGHEST, which makes
    # the movement lossless.  The expert GEMMs below stay at the framework's
    # default MXU precision like every other linear.
    exact = lax.Precision.HIGHEST
    logits = jnp.dot(tokens.astype(jnp.float32), params["router"]["kernel"],
                     preferred_element_type=jnp.float32, precision=exact)
    probs = jax.nn.softmax(logits, axis=-1)
    dispatch, combine, balance = _dispatch_combine(probs, num_selected,
                                                   capacity)

    constrain = _expert_constraint(mesh)
    # tokens → expert blocks: (T,H) × (T,E,C) → (E,C,H).  Under EP this is
    # the forward all_to_all; GSPMD derives it from the output constraint.
    xe = constrain(jnp.einsum("th,tec->ech", tokens.astype(jnp.float32),
                              dispatch, preferred_element_type=jnp.float32,
                              precision=exact))
    h = jnp.einsum("ech,ehm->ecm", xe, experts["fc1"]["kernel"].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + experts["fc1"]["bias"][:, None, :].astype(jnp.float32),
                    approximate=False)
    ye = jnp.einsum("ecm,emh->ech", h, experts["fc2"]["kernel"].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    ye = constrain(ye + experts["fc2"]["bias"][:, None, :].astype(jnp.float32))
    # expert blocks → tokens: the return all_to_all; dropped tokens combine
    # to zero (the caller's residual connection carries them through).
    y = jnp.einsum("ech,tec->th", ye, combine,
                   preferred_element_type=jnp.float32, precision=exact)

    aux = {"balance_loss": balance,
           "dispatch_fraction": dispatch.sum() / (t * num_selected)}
    return y.reshape(*lead, hidden).astype(x.dtype), aux


def _expert_constraint(mesh: Mesh | None):
    if mesh is None or mesh.shape.get("expert", 1) <= 1:
        return lambda a: a
    sh = NamedSharding(mesh, P("expert", None, None))
    return lambda a: lax.with_sharding_constraint(a, sh)


def moe_param_specs(params: dict) -> dict:
    """PartitionSpec tree for init_moe_ffn params (leading E axis → 'expert';
    the router stays replicated — it is a (H, E) sliver every rank needs)."""
    return {
        "router": {"kernel": P()},
        "experts": {
            "fc1": {"kernel": P("expert", None, None), "bias": P("expert", None)},
            "fc2": {"kernel": P("expert", None, None), "bias": P("expert", None)},
        },
    }


def shard_moe_params(params: dict, mesh: Mesh) -> dict:
    """Place MoE params onto the mesh (expert axis sharded when present)."""
    specs = moe_param_specs(params)
    if mesh.shape.get("expert", 1) <= 1:
        specs = jax.tree.map(lambda s: P(), specs,
                             is_leaf=lambda s: isinstance(s, P))
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda s: isinstance(s, P))
