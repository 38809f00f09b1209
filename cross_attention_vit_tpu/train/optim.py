"""Adam optimizer with torch.optim.Adam semantics (hand-rolled, pytree-native).

The reference trains with `torch.optim.Adam(lr, weight_decay)` — NOT AdamW
(reference model_cross.py:277): weight decay is classic L2, added to the
gradient *before* the moment updates:

    g   = g + wd * p
    m   = b1*m + (1-b1)*g           v = b2*v + (1-b2)*g^2
    p  -= lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)

State and math are float32 regardless of compute dtype.  The learning rate is
a step-time argument so the cosine schedule (epoch-stepped, schedule.py) needs
no recompilation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jax.Array      # scalar int32
    mu: dict             # first-moment pytree
    nu: dict             # second-moment pytree


def init(params) -> AdamState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.copy, zeros))


def update(grads, state: AdamState, params, lr, weight_decay: float = 0.0,
           b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """Returns (new_params, new_state).  `lr` may be a traced scalar."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def one(p, g, m, v):
        g = g.astype(jnp.float32)
        if weight_decay:
            g = g + weight_decay * p.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        upd = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        return (p.astype(jnp.float32) - lr * upd).astype(p.dtype), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    out = [one(p, g, m, v) for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    return new_params, AdamState(step=step, mu=new_mu, nu=new_nu)
