"""Post-training int8 rewrite of a parameter tree for serving.

`quantize_for_inference(params)` walks the tree and replaces every eligible
Linear kernel with its int8 form (ops/quant.quantize_weight);
ops/layers.linear dispatches on the rewritten params, so the SAME model
apply() serves quantized — no parallel model definition to keep in sync.

Eligible = a dict node NAMED fc1/fc2 (the FFN naming convention across all
model families) holding a 2-D "kernel" with at least `min_size` elements.
That selects the FFN of every block and the mlp-head fc1 (the weight- and
FLOP-heavy GEMMs) while excluding:
  * attention projections — by default qkv (H,3,K,D) / out (K,D,H) stay on
    the bf16 flash path, where the parity contract lives.  `attn=True`
    (serve --quantize int8+attn) additionally quantizes the self-attention
    qkv/out projections (~1/3 of the remaining GEMM FLOPs) via
    ops/quant.qkv_projection / attn_out_projection — the SDPA itself stays
    bf16/f32.  Cross-attention wq/wk/wv/proj stay float: their query side
    is a single CLS token (negligible FLOPs);
  * patch_to_embedding — its rows are RAW voxel intensities (±800 scale,
    fill −1); per-token int8 on unnormalized physical values is the one
    place dynamic quantization genuinely loses signal;
  * the classifier fc2 — (mlp, 2) is below min_size, so the final logits
    keep full precision;
  * LayerNorm/bias/CLS/pos leaves (no "kernel").

The reference has no quantization capability (fp32 CUDA end-to-end) — this
is an inference-only, opt-in extension (`drivers/serve.py --quantize int8`).
Accuracy: model-level logit drift and prediction stability are pinned in
tests/test_quant.py over the real 6-subject cohort.

Selection guidance (measured on v5e, docs/PERF_r05.md §3): `int8` (FFN-only)
is the speed mode — +7-8% forward at config4/vitL6 eval geometries, ≤1.0× at
cross8's batch-8 per-stream GEMMs (ship bf16 there).  `int8+attn` is a
MEMORY mode, not a speed mode: even with the SDPA on the flash kernel (kept
since round 5 — before that the quantized branch silently fell back to a
dense f32 SDPA, a 2.7× regression at config4) the per-token activation
quantize/rescale around D=64 head GEMMs costs what the 2× int8 MXU rate
returns, so it lands at 0.82-0.96×; use it when qkv/out weight footprint
matters.
"""

from __future__ import annotations

from ..ops.quant import quantize_weight, quantize_weight_nd

# below this many elements a kernel stays in float: the int8 win is HBM/MXU
# throughput on big GEMMs, and the 2-class head's logits deserve full
# precision (same spirit as sharding.FSDP_MIN_SIZE)
MIN_SIZE = 2 ** 16


QUANT_NAMES = ("fc1", "fc2")

# self-attention projection layouts (ops/initializers.py): node name →
# (expected kernel ndim, contracting axes for the per-channel scales)
ATTN_QUANT = {"qkv": (4, (0,)), "out": (3, (0, 1))}


def _eligible(name: str, node: dict, min_size: int) -> bool:
    k = node.get("kernel")
    return (name in QUANT_NAMES and k is not None
            and getattr(k, "ndim", 0) == 2 and k.size >= min_size)


def _attn_eligible(name: str, node: dict, min_size: int) -> bool:
    spec = ATTN_QUANT.get(name)
    k = node.get("kernel")
    return (spec is not None and k is not None
            and getattr(k, "ndim", 0) == spec[0] and k.size >= min_size)


def quantize_for_inference(params, min_size: int = MIN_SIZE,
                           attn: bool = False):
    """Returns a new tree with eligible Linear kernels in int8 form.

    Quantized nodes keep their bias and swap kernel → kernel_q +
    kernel_scale; everything else is passed through by reference.
    attn=True additionally rewrites self-attention qkv/out projections
    (ops/attention.self_attention dispatches on kernel_q)."""
    def walk(node, name=""):
        if isinstance(node, dict):
            if _eligible(name, node, min_size):
                out = {k: v for k, v in node.items() if k != "kernel"}
                out.update(quantize_weight(node["kernel"]))
                return out
            if attn and _attn_eligible(name, node, min_size):
                out = {k: v for k, v in node.items() if k != "kernel"}
                out.update(quantize_weight_nd(node["kernel"],
                                              ATTN_QUANT[name][1]))
                return out
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, name) for v in node)
        return node

    return walk(params)


def calibrate(qparams, apply_fn, *args, margin: float = 1.0):
    """Static activation scales: run `apply_fn(qparams, *args)` UNJITTED
    while ops/quant records each quantized layer's activation amax (keyed by
    kernel_q array identity — robust to call/walk order), then return a new
    tree with `act_scale = margin · amax / 127` on every quantized node.

    The statically-scaled path drops the per-token amax pass (the measured
    cost that cancels the int8 GEMM gain — ops/quant.py CALIB note).  Use a
    representative batch; amax is taken as a running max, so several
    calibration calls compose."""
    from ..ops import quant

    prev = quant.CALIB
    quant.CALIB = {} if prev is None else prev
    try:
        apply_fn(qparams, *args)
        captured = dict(quant.CALIB)
    finally:
        quant.CALIB = prev

    import numpy as np

    def walk(node):
        if isinstance(node, dict):
            if "kernel_q" in node:
                amax = captured.get(id(node["kernel_q"]))
                if amax is None:
                    return node  # layer not exercised by the sample
                out = dict(node)
                out["act_scale"] = np.float32(
                    margin * amax / 127.0 if amax > 0 else 1.0)
                return out
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(qparams)


def count_quantized(params) -> tuple[int, int]:
    """(quantized kernels, int8 bytes) — for logging/health endpoints."""
    n = b = 0

    def walk(node):
        nonlocal n, b
        if isinstance(node, dict):
            if "kernel_q" in node:
                n += 1
                b += node["kernel_q"].size
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(params)
    return n, b
