"""Model surgery and shape tracing — the modify_model.py capability, JAX-style.

The reference offers two tools (modify_model.py:7-55, 63-125, 163-188):
  * `get_model_upto_layer`: rebuild a model truncated at a dotted layer path;
  * forward-hook shape printing for every leaf module + `inspect_model`.

In a functional framework truncation is an *apply-time* argument (see
models/densenet.py `upto=`), and shape tracing is free via abstract
evaluation — no hooks, no real compute, no device:

    trace = trace_shapes(fn, *args)          # list of (name, in/out shapes)
    inspect_model(fn, *args)                 # printed table, like the hooks

Ops register trace points with `shape_probe(name, x)`, which is a no-op
outside an active trace.
"""

from __future__ import annotations

import contextlib
import threading

import jax

_local = threading.local()


def shape_probe(name: str, x):
    """Record (name, shape, dtype) when a trace is active; returns x."""
    rec = getattr(_local, "records", None)
    if rec is not None:
        for leaf in jax.tree.leaves(x):
            rec.append((name, tuple(leaf.shape), str(leaf.dtype)))
    return x


@contextlib.contextmanager
def _tracing():
    _local.records = []
    try:
        yield _local.records
    finally:
        _local.records = None


def trace_shapes(fn, *args, **kwargs):
    """Abstract-evaluate fn; returns (output_shapes, probe_records).

    Equivalent of registering shape-print hooks on every module
    (modify_model.py:39-55) but at zero compute cost via jax.eval_shape.
    """
    with _tracing() as records:
        out = jax.eval_shape(lambda *a: fn(*a, **kwargs), *args)
    out_shapes = jax.tree.map(lambda s: (tuple(s.shape), str(s.dtype)), out)
    return out_shapes, list(records)


def inspect_model(fn, *args, quiet: bool = False, **kwargs):
    """Run a shape trace and print a table (modify_model.py:163-188 analogue).
    Never touches a device; safe on any model size."""
    out_shapes, records = trace_shapes(fn, *args, **kwargs)
    lines = [f"{name:60s} {str(shape):24s} {dtype}"
             for name, shape, dtype in records]
    lines.append(f"{'-> output':60s} {out_shapes!r}")
    text = "\n".join(lines)
    if not quiet:
        print(text)
    return text


def truncate_apply(apply_fn, upto: str):
    """Partial-application helper mirroring get_model_upto_layer: returns an
    apply whose forward stops at the dotted path (for models that support the
    `upto` kwarg, e.g. models.densenet.apply)."""

    def truncated(*args, **kwargs):
        return apply_fn(*args, upto=upto, **kwargs)

    truncated.__name__ = f"{getattr(apply_fn, '__name__', 'apply')}__upto__{upto}"
    return truncated


def param_count(params) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def param_summary(params, max_depth: int = 2) -> str:
    """Grouped parameter counts by top-level path prefix."""
    import numpy as np
    from collections import defaultdict

    groups: dict[str, int] = defaultdict(int)
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = []
        for p in path[:max_depth]:
            names.append(str(getattr(p, "key", getattr(p, "idx", p))))
        groups["/".join(names)] += int(np.prod(leaf.shape))
    width = max(len(k) for k in groups) if groups else 10
    lines = [f"{k:{width}s} {v:>12,d}" for k, v in sorted(groups.items())]
    lines.append(f"{'TOTAL':{width}s} {sum(groups.values()):>12,d}")
    return "\n".join(lines)
