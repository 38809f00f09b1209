"""3-D convolution ops for the legacy CNN-stem model families.

torch semantics throughout (the legacy models are nn.Conv3d/BatchNorm3d/
MaxPool3d stacks — reference model.py:23-75, modelv2.py:14-58):
  * conv3d: NCDHW activations, OIDHW kernels, zero padding, optional stride;
  * max_pool3d: window k, stride s, floor division output;
  * batch_norm3d: train mode uses batch statistics and updates running
    stats with momentum 0.1 (biased var for normalization, unbiased for the
    running estimate — torch's exact convention); eval uses running stats.
  * avg_pool3d + global_avg_pool for the DenseNet transitions/head.

Under data parallelism the batch-stat reductions run over the *global* batch
(GSPMD inserts the cross-device mean) — equivalent to SyncBatchNorm, which is
a deliberate improvement over the reference's per-rank BN under DDP
(SURVEY.md §7 hard-parts note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv3d(params: dict, x: jax.Array, stride: int | tuple = 1,
           padding: int | tuple = 0) -> jax.Array:
    """x: (N, C, D, H, W); params: {"kernel": (O, I, kd, kh, kw), "bias": (O,)?}"""
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = (padding,) * 3
    y = jax.lax.conv_general_dilated(
        x, params["kernel"].astype(x.dtype),
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))
    if "bias" in params:
        y = y + params["bias"].astype(y.dtype)[None, :, None, None, None]
    return y


def max_pool3d(x: jax.Array, kernel: int = 2, stride: int | None = None,
               padding: int = 0) -> jax.Array:
    stride = stride or kernel
    pad = [(0, 0), (0, 0)] + [(padding, padding)] * 3
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, kernel, kernel, kernel),
        window_strides=(1, 1, stride, stride, stride),
        padding=pad)


def avg_pool3d(x: jax.Array, kernel: int = 2, stride: int | None = None) -> jax.Array:
    stride = stride or kernel
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 1, kernel, kernel, kernel),
        window_strides=(1, 1, stride, stride, stride),
        padding="VALID")
    return summed / float(kernel ** 3)


def global_avg_pool3d(x: jax.Array) -> jax.Array:
    """(N, C, D, H, W) → (N, C) — torch AdaptiveAvgPool3d(1) + flatten."""
    return jnp.mean(x, axis=(2, 3, 4))


def batchnorm3d_params(channels: int) -> tuple[dict, dict]:
    """Returns (params, state): affine scale/bias + running mean/var/count."""
    params = {"scale": jnp.ones((channels,)), "bias": jnp.zeros((channels,))}
    state = {"mean": jnp.zeros((channels,)), "var": jnp.ones((channels,))}
    return params, state


def batch_norm3d(params: dict, state: dict, x: jax.Array, train: bool,
                 momentum: float = 0.1, eps: float = 1e-5):
    """Returns (y, new_state)."""
    if train:
        axes = (0, 2, 3, 4)
        mean = jnp.mean(x, axis=axes)
        var = jnp.mean(jnp.square(x - mean[None, :, None, None, None]), axis=axes)
        n = x.shape[0] * x.shape[2] * x.shape[3] * x.shape[4]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None, None, None]) * inv[None, :, None, None, None]
    y = y * params["scale"][None, :, None, None, None] \
        + params["bias"][None, :, None, None, None]
    return y, new_state


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)
