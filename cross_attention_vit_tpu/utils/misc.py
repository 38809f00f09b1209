"""Small utilities mirroring the reference's utils.py surface.

`compute_metrics` is re-exported from train.metrics (the reference's
utils.compute_metrics, utils.py:18-62, minus the hardcoded `.to('cuda')`).
`accum_tensor` reproduces the reference's recursive element fold
(utils.py:6-14): reduce a binary scalar function over all paired elements of
two equally-shaped arrays, summing the results.
"""

from __future__ import annotations

import numpy as np

from ..train.metrics import compute_metrics  # noqa: F401


def accum_tensor(t1, t2, func) -> float:
    """sum(func(a, b) for paired scalars a, b) — vectorized equivalent of the
    reference's recursion (which is O(n) Python frames; this is one pass)."""
    a = np.asarray(t1).ravel()
    b = np.asarray(t2).ravel()
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(sum(func(x, y) for x, y in zip(a.tolist(), b.tolist())))
