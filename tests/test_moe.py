"""Expert parallelism (parallel/moe.py): routing math, EP-sharded == serial
(forward AND gradients), capacity-overflow semantics, balance loss.

The reference has no MoE (every FFN is dense — model_cross.py:61-67), so
there is no torch oracle here; correctness anchors are (a) an E=1 MoE being
exactly the dense FFN and (b) the sharded program reproducing the serial
einsum math on an 8-virtual-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_attention_vit_tpu.parallel import (expert_capacity, init_moe_ffn,
                                              make_mesh, moe_ffn,
                                              shard_moe_params)

HIDDEN, MLP = 16, 32


def _tokens(key, batch=4, n=10, hidden=HIDDEN):
    return jax.random.normal(key, (batch, n, hidden), jnp.float32)


def test_e1_equals_dense_ffn():
    """A 1-expert MoE with enough capacity is exactly fc1/GELU/fc2: the
    router's softmax over one logit is 1.0, every token lands a slot."""
    params = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts=1)
    x = _tokens(jax.random.key(1))
    y, aux = moe_ffn(params, x, num_selected=1, capacity_factor=1.0)

    e = params["experts"]
    dense = jax.nn.gelu(
        x @ e["fc1"]["kernel"][0] + e["fc1"]["bias"][0], approximate=False
    ) @ e["fc2"]["kernel"][0] + e["fc2"]["bias"][0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(dense),
                               rtol=1e-6, atol=1e-6)
    assert float(aux["dispatch_fraction"]) == 1.0


@pytest.mark.parametrize("num_selected", [1, 2])
def test_ep_sharded_matches_serial(num_selected):
    """jit over a ('data','expert') = (2,4) mesh reproduces the serial
    program — forward and parameter gradients — to f32 reduction noise."""
    num_experts = 4
    params = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts)
    x = _tokens(jax.random.key(1), batch=8)
    mesh = make_mesh(2, expert=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "expert": 4, "model": 1}

    def loss_fn(p, x, mesh=None):
        y, aux = moe_ffn(p, x, num_selected=num_selected,
                         capacity_factor=2.0, mesh=mesh)
        return jnp.sum(jnp.tanh(y)) + 0.01 * aux["balance_loss"]

    loss_ref, grads_ref = jax.value_and_grad(loss_fn)(params, x)

    sharded = shard_moe_params(params, mesh)
    xs = jax.device_put(x, jax.NamedSharding(
        mesh, jax.sharding.PartitionSpec("data")))
    loss_s, grads_s = jax.jit(
        lambda p, x: jax.value_and_grad(lambda q: loss_fn(q, x, mesh))(p)
    )(sharded, xs)

    np.testing.assert_allclose(float(loss_s), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        grads_s, grads_ref)


def test_capacity_overflow_drops_tokens():
    """Force every token to expert 0 with capacity for only some: the
    overflowing tokens' combine weight is zero → their output rows are 0,
    and dispatch_fraction reports the drop."""
    num_experts = 4
    params = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts)
    kernel = np.zeros((HIDDEN, num_experts), np.float32)
    kernel[:, 0] = 1.0  # all mass on expert 0 for positive-sum tokens
    params["router"]["kernel"] = jnp.asarray(kernel)
    x = jnp.abs(_tokens(jax.random.key(1), batch=1, n=16)) + 0.1

    y, aux = moe_ffn(params, x, num_selected=1, capacity_factor=1.0)
    cap = expert_capacity(16, num_experts, 1, 1.0)  # = 4 slots on expert 0
    flat = np.asarray(y).reshape(16, HIDDEN)
    assert np.all(flat[cap:] == 0.0)
    assert np.any(flat[:cap] != 0.0)
    np.testing.assert_allclose(float(aux["dispatch_fraction"]), cap / 16)


def test_balance_loss_uniform_routing_is_one():
    """Zero router logits → uniform probabilities → Switch aux loss == 1."""
    params = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts=8)
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    _, aux = moe_ffn(params, _tokens(jax.random.key(1)), num_selected=2)
    np.testing.assert_allclose(float(aux["balance_loss"]), 1.0, rtol=1e-6)


def test_top2_gates_normalized():
    """GShard top-2 rule: selected gate probabilities renormalize to sum to 1
    per token, so with enough capacity every token's combine weights sum to
    exactly 1 (no ~k/E output-scale shrink as E grows)."""
    from cross_attention_vit_tpu.parallel.moe import _dispatch_combine

    probs = jax.nn.softmax(
        jax.random.normal(jax.random.key(0), (32, 8)), axis=-1)
    _, combine, _ = _dispatch_combine(probs, num_selected=2, capacity=32)
    per_token = np.asarray(combine.sum(axis=(1, 2)))
    np.testing.assert_allclose(per_token, 1.0, rtol=1e-6)

    # Switch top-1 rule: raw probability kept (gradient path to the router),
    # so combine sums equal the top-1 prob, NOT 1.
    _, combine1, _ = _dispatch_combine(probs, num_selected=1, capacity=32)
    np.testing.assert_allclose(np.asarray(combine1.sum(axis=(1, 2))),
                               np.asarray(probs.max(axis=-1)), rtol=1e-6)


def test_generic_shard_params_handles_experts_subtree():
    """parallel/sharding._spec_for recognizes experts/* leaves (stacked 3-D
    kernels) inside a full model tree: E axis → 'expert', router replicated —
    the dense fc1/fc2 TP rules must NOT misfire on the 3-D stacked shapes."""
    from cross_attention_vit_tpu.parallel.sharding import param_specs
    from jax.sharding import PartitionSpec as P

    moe = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts=4)
    tree = {"layers": [{"attn": {"qkv": {"kernel": jnp.zeros((HIDDEN, 3, 2, 8))}},
                        "ffn": moe}]}
    specs = param_specs(tree)
    ffn = specs["layers"][0]["ffn"]
    assert ffn["experts"]["fc1"]["kernel"] == P("expert", None, None)
    assert ffn["experts"]["fc2"]["kernel"] == P("expert", None, None)
    assert ffn["experts"]["fc1"]["bias"] == P("expert", None)
    assert ffn["experts"]["fc2"]["bias"] == P("expert", None)
    assert ffn["router"]["kernel"] == P()
    assert specs["layers"][0]["attn"]["qkv"]["kernel"] == P(
        None, None, "model", None)


def test_grads_finite_through_router():
    """Routing top-k is piecewise-constant but the combine weights carry
    gradient into the router kernel; everything stays finite."""
    params = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts=4)
    x = _tokens(jax.random.key(1))

    def loss(p):
        y, aux = moe_ffn(p, x, num_selected=2)
        return jnp.sum(y ** 2) + 0.01 * aux["balance_loss"]

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    assert float(jnp.sum(jnp.abs(grads["router"]["kernel"]))) > 0.0
