"""On-chip MoE parity (parallel/moe.py).

The CPU suite proves EP-sharded == serial on an 8-virtual-device mesh; this
lane pins the single-chip numerics the sharded program is built from.  The
load-bearing claim is dispatch/combine LOSSLESSNESS: at the TPU default
matmul precision the one-hot token-movement einsums round f32 operands
through bf16 (a measured 6e-3 drift before moe.py pinned them to
Precision.HIGHEST), so the E=1 anchor must hold bit-exactly on Mosaic/MXU,
not just in CPU interpret math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cross_attention_vit_tpu.parallel import init_moe_ffn, moe_ffn

HIDDEN, MLP = 64, 128


def test_e1_dense_anchor_bit_exact_on_chip():
    params = init_moe_ffn(jax.random.key(0), HIDDEN, MLP, num_experts=1)
    x = jax.random.normal(jax.random.key(1), (4, 40, HIDDEN), jnp.float32)
    y, aux = jax.jit(lambda p, x: moe_ffn(p, x, num_selected=1,
                                          capacity_factor=1.0))(params, x)
    e = params["experts"]
    dense = jax.jit(lambda x: jax.nn.gelu(
        jnp.dot(x, e["fc1"]["kernel"][0],
                preferred_element_type=jnp.float32) + e["fc1"]["bias"][0],
        approximate=False) @ e["fc2"]["kernel"][0] + e["fc2"]["bias"][0])(x)
    # D2H fetch is the only trustworthy sync on this runtime (CLAUDE.md)
    err = float(jnp.max(jnp.abs(y - dense)))
    assert err == 0.0, f"dispatch/combine not lossless on chip: {err}"
    assert float(aux["dispatch_fraction"]) == 1.0


def test_topk_grads_finite_and_balanced_on_chip():
    params = init_moe_ffn(jax.random.key(2), HIDDEN, MLP, num_experts=8)
    x = jax.random.normal(jax.random.key(3), (8, 64, HIDDEN), jnp.float32)

    def loss(p):
        y, aux = moe_ffn(p, x, num_selected=2)
        return jnp.sum(y ** 2) / x.size + 0.01 * aux["balance_loss"]

    val, grads = jax.jit(jax.value_and_grad(loss))(params)
    assert np.isfinite(float(val))
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in jax.tree.leaves(grads))
    assert float(jnp.sum(jnp.abs(grads["router"]["kernel"]))) > 0.0
