"""Parameter initializers matching the reference's PyTorch init semantics.

The reference initializes every Linear with `nn.init.xavier_uniform_` and zero
bias, LayerNorms with ones/zeros, and re-draws pos-embedding / CLS token from
N(0, 0.02) (reference model_cross.py:214-241, modelv3.py:149-176).  Bit-level
RNG parity with torch is impossible (different generators), so parity tests
copy torch weights; these initializers reproduce the *distributions*.

Kernels here are stored (in_features, out_features) — the natural layout for
`x @ W` on the MXU — while torch stores (out, in).  Xavier-uniform bounds are
symmetric in fan-in/fan-out, so the transpose does not change the law.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32,
                   fan_in: int | None = None, fan_out: int | None = None) -> jax.Array:
    """torch.nn.init.xavier_uniform_ (gain=1): U(-a, a), a = sqrt(6/(fan_in+fan_out)).

    For 2-D kernels fans default to the two dims.  For conv kernels
    (torch layout reproduced as (spatial..., in, out) here) pass fans explicitly.
    """
    if fan_in is None or fan_out is None:
        if len(shape) != 2:
            raise ValueError("xavier_uniform needs explicit fans for non-2D shapes")
        fan_in, fan_out = shape
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_normal(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32,
                  fan_in: int | None = None, fan_out: int | None = None) -> jax.Array:
    """torch.nn.init.xavier_normal_ (gain=1): N(0, 2/(fan_in+fan_out))."""
    if fan_in is None or fan_out is None:
        if len(shape) != 2:
            raise ValueError("xavier_normal needs explicit fans for non-2D shapes")
        fan_in, fan_out = shape
    std = math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def kaiming_normal_fan_out(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32,
                           fan_out: int | None = None) -> jax.Array:
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu'): N(0, 2/fan_out).

    Used by the legacy CNN-stem ViT for Conv3d weights (reference model.py:244).
    """
    if fan_out is None:
        raise ValueError("pass fan_out = out_channels * prod(kernel_size)")
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def trunc_or_normal_02(key: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    """N(0, 0.02) — pos-embedding / CLS re-init (reference model_cross.py:239-241)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def zeros(shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jnp.zeros(shape, dtype)


def ones(shape: tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jnp.ones(shape, dtype)


class KeyGen:
    """Deterministic key dispenser: each call folds an incrementing counter
    into a base key, so adding parameters never reshuffles earlier draws."""

    def __init__(self, key: jax.Array):
        self._key = key
        self._n = 0

    def __call__(self) -> jax.Array:
        k = jax.random.fold_in(self._key, self._n)
        self._n += 1
        return k


def linear_params(key: jax.Array, in_features: int, out_features: int,
                  bias: bool = True, dtype=jnp.float32,
                  init=xavier_uniform) -> dict:
    """A Linear layer's params: xavier-uniform kernel (in, out), zero bias."""
    p = {"kernel": init(key, (in_features, out_features), dtype)}
    if bias:
        p["bias"] = zeros((out_features,), dtype)
    return p


# -- head-aligned attention layouts ------------------------------------------
# Attention kernels are stored with an explicit heads axis so tensor
# parallelism shards on it directly (Megatron-style column/row split without
# GSPMD reshards).  Distributions are identical to the torch 2-D layouts —
# draw xavier on the 2-D shape, then reshape (reshape preserves the law).
# Layout equivalences to the torch weights:
#   qkv  (H, 3, K, D)  == torch to_qkv.weight.T (H, 3H); the 3H axis splits
#                         as chunk(3) → heads → head_dim, exactly the
#                         reference's chunk + 'b n (h d)' rearrange.
#   wq/wk/wv (H, K, D) == weight.T (H, H); bias (K, D) == bias (H,)
#   out/proj (K, D, H) == weight.T with the (h d) input axis split.


def fused_qkv_params(key: jax.Array, hidden: int, heads: int,
                     dtype=jnp.float32) -> dict:
    d = hidden // heads
    w = xavier_uniform(key, (hidden, 3 * hidden), dtype)
    return {"kernel": w.reshape(hidden, 3, heads, d)}


def head_in_params(key: jax.Array, hidden: int, heads: int, bias: bool = True,
                   dtype=jnp.float32) -> dict:
    """H → (K, D) projection (cross-attention wq/wk/wv)."""
    d = hidden // heads
    w = xavier_uniform(key, (hidden, hidden), dtype)
    p = {"kernel": w.reshape(hidden, heads, d)}
    if bias:
        p["bias"] = zeros((heads, d), dtype)
    return p


def head_out_params(key: jax.Array, hidden: int, heads: int,
                    dtype=jnp.float32) -> dict:
    """(K, D) → H projection (attention output / cross proj)."""
    d = hidden // heads
    w = xavier_uniform(key, (hidden, hidden), dtype)
    return {"kernel": w.reshape(heads, d, hidden), "bias": zeros((hidden,), dtype)}


def layernorm_params(dim: int, dtype=jnp.float32) -> dict:
    return {"scale": ones((dim,), dtype), "bias": zeros((dim,), dtype)}
