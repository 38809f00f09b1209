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


def enable_compilation_cache(cache_dir: str,
                             min_compile_secs: float = 1.0) -> None:
    """Persistent XLA compilation cache: full-size ModelCross train-step
    compiles cost 65-273 s per process on this host — with the cache a
    re-run (bench repeat, resumed training, evaluation of a checkpoint)
    deserializes the executable in seconds instead."""
    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # cache hits regardless of how long the original compile took
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def accum_tensor(t1, t2, func) -> float:
    """sum(func(a, b) for paired scalars a, b) — a flat iteration replacing
    the reference's nested recursion (utils.py:6-14, O(n) Python frames).
    `func` is an arbitrary Python callable on scalars, so the fold stays a
    host loop; it is not vectorized."""
    a = np.asarray(t1).ravel()
    b = np.asarray(t2).ravel()
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(sum(func(x, y) for x, y in zip(a.tolist(), b.tolist())))
