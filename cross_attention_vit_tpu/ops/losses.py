"""Losses matching torch.nn.functional semantics exactly.

The live models use `F.cross_entropy(x, labels, label_smoothing=eps)` with
mean reduction (reference model_cross.py:211, modelv3.py:146); the legacy
CNN-ViT uses `BCEWithLogitsLoss` on a single logit (model.py:239).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  label_smoothing: float = 0.0) -> jax.Array:
    """torch F.cross_entropy with integer targets, mean reduction.

    With smoothing eps and K classes, per-sample loss is
    -(1-eps)·logp[y] - (eps/K)·Σ_c logp[c]  (torch's definition).
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if label_smoothing:
        k = logits.shape[-1]
        smooth = -jnp.mean(logp, axis=-1)
        loss = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        loss = nll
    return jnp.mean(loss)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch nn.BCEWithLogitsLoss (mean reduction), numerically-stable form:
    max(x,0) - x·y + log(1 + exp(-|x|))."""
    x = logits.astype(jnp.float32)
    y = targets.astype(jnp.float32)
    loss = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(loss)
