"""Ring attention (sequence parallelism) on 8 virtual CPU devices: exact
forward/gradient parity with the dense single-device softmax attention, and
the mesh-axis layout contract.  parallel/ring.py."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cross_attention_vit_tpu.ops.attention import _sdpa
from cross_attention_vit_tpu.parallel import make_mesh, ring_attention, ring_sdpa


def _qkv(b=4, heads=4, n=64, d=16, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    shape = (3, b, heads, n, d)
    return [jnp.asarray(a, dtype) for a in rng.normal(size=shape)]


@pytest.mark.parametrize("seq", [2, 4, 8])
def test_ring_matches_dense_forward(seq):
    q, k, v = _qkv(n=64)
    mesh = make_mesh(data=8 // seq, seq=seq)
    out = ring_sdpa(mesh, "seq")(q, k, v)
    ref = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_ring_matches_dense_gradient():
    q, k, v = _qkv(n=32, heads=2, d=8)
    mesh = make_mesh(data=2, seq=4)
    sdpa = ring_sdpa(mesh, "seq")

    def loss_ring(q, k, v):
        return jnp.sum(jnp.tanh(sdpa(q, k, v)))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.tanh(_sdpa(q, k, v, q.shape[-1] ** -0.5)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd),
                                   rtol=2e-6, atol=2e-6)


def test_ring_bf16_inputs_f32_statistics():
    # numerics contract: f32 softmax statistics even for bf16 operands —
    # the ring output must match the dense _sdpa (same contract) closely
    q, k, v = _qkv(n=64, dtype=jnp.bfloat16)
    mesh = make_mesh(data=1, seq=8)
    out = ring_sdpa(mesh, "seq")(q, k, v)
    ref = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_ring_attention_axis_size_one_is_dense():
    q, k, v = _qkv(n=16, heads=2, d=8)
    out = ring_attention(q, k, v, scale=q.shape[-1] ** -0.5,
                         axis_name="seq", axis_size=1)
    ref = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_ring_composes_with_head_sharded_tp():
    # sequence parallelism must compose with Megatron head-split TP: heads
    # shard over 'model', tokens over 'seq', batch over 'data' — the ring
    # body never mixes heads, so the same program runs per head shard
    try:
        from jax import shard_map
        rep_kw = {"check_vma": False}
    except ImportError:
        from jax.experimental.shard_map import shard_map
        rep_kw = {"check_rep": False}
    import functools

    q, k, v = _qkv(b=2, heads=4, n=32, d=8)
    mesh = make_mesh(data=2, seq=2, model=2)
    spec = P("data", "model", "seq", None)

    @functools.partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, **rep_kw)
    def sharded(q, k, v):
        return ring_attention(q, k, v, scale=q.shape[-1] ** -0.5,
                              axis_name="seq", axis_size=2)

    out = sharded(q, k, v)
    ref = _sdpa(q, k, v, q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_make_mesh_seq_axis_layout():
    mesh = make_mesh(data=2, seq=2, model=2)
    assert tuple(mesh.axis_names) == ("data", "seq", "model")
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "seq": 2, "model": 2}
    # size-1 seq is omitted: the DP/TP shape is unchanged (back-compat)
    mesh2 = make_mesh(data=4, model=2)
    assert tuple(mesh2.axis_names) == ("data", "model")
    with pytest.raises(ValueError):
        make_mesh(data=3, seq=3)
