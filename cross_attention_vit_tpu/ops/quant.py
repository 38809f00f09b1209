"""int8 w8a8 dynamic quantization for inference GEMMs.

TPU-native rationale: the v5e MXU runs int8 × int8 → int32 matmuls at 2×
its bf16 peak (394 vs 197 T-ops).  For serving, the FFN projections (fc1 +
fc2 ≈ 2/3 of a ViT block's projection FLOPs) can take that path with
per-output-channel weight scales (static, computed once at load) and
per-token activation scales (dynamic, one VPU amax per row) — the standard
w8a8 recipe.  Attention stays on the bf16 flash-kernel path: its GEMMs
carry softmax numerics, and the reference parity contract lives there.

The reference has no quantization story at all (fp32 CUDA end-to-end);
this is a serving capability beyond it, opt-in and inference-only:
`models/quantize.quantize_for_inference` rewrites eligible Linear params
to the quantized form and `ops.layers.linear` dispatches on it.

Numerics: symmetric int8, round-half-away-from-zero, int32 accumulation;
output = int32 · (row_scale × col_scale) in f32 + bias.  Error is bounded
by the two quantization steps (~0.4% RMS each on Gaussian data); the
model-level drift and classification stability are tested in
tests/test_quant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_QMAX = 127.0


def quantize_weight(kernel) -> dict:
    """(F, G) float kernel → {"kernel_q": int8 (F,G), "kernel_scale": f32 (G,)}.

    Per-output-channel symmetric scales over the contracting axis: each
    column g is quantized against max|W[:, g]|, so wide-ranged channels do
    not crush narrow ones (the per-tensor failure mode)."""
    w = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(w), axis=0)
    scale = np.where(amax > 0, amax / _QMAX, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale), -_QMAX, _QMAX).astype(np.int8)
    return {"kernel_q": q, "kernel_scale": scale}


def quantize_weight_nd(kernel, contract_axes: tuple[int, ...]) -> dict:
    """N-D kernel → int8 + per-output-channel f32 scales.

    Generalizes quantize_weight to the attention projection layouts
    (ops/initializers.py): qkv (H, 3, K, D) contracts axis 0, out (K, D, H)
    contracts axes (0, 1).  The scale keeps the kernel's non-contracting
    axes' shape, so `q * scale` broadcasts back to the original values."""
    w = np.asarray(kernel, np.float32)
    amax = np.max(np.abs(w), axis=contract_axes, keepdims=True)
    scale = np.where(amax > 0, amax / _QMAX, 1.0).astype(np.float32)
    q = np.clip(np.rint(w / scale), -_QMAX, _QMAX).astype(np.int8)
    return {"kernel_q": q,
            "kernel_scale": np.squeeze(scale, axis=contract_axes)}


def dynamic_quantize(x: jax.Array):
    """Per-row (last axis) symmetric int8: returns (xq int8, scale f32[..., 1]).

    One amax reduction + one multiply per element — VPU work that is cheap
    next to the GEMM it feeds, and it reads x once (the same pass the cast
    to bf16 would have made)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / _QMAX, 1.0)
    xq = jnp.clip(jnp.round(x32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return xq, scale


# Calibration capture (models/quantize.calibrate): when set to a dict, an
# UNJITTED forward records each quantized layer's activation amax keyed by
# the identity of its kernel_q array.  Static scales then replace the
# per-token amax pass entirely — the dynamic path costs an extra read+reduce
# over every activation (two-pass dependency: amax(x), then x/scale), which
# on v5e measurably cancels the int8 MXU gain (benchmarks/bench_quant.py);
# with a static scale the round/clip/divide fuses into the producer and the
# int8 store HALVES the activation write traffic vs bf16.
CALIB: dict[int, float] | None = None


def _quantize_act(x32: jax.Array, params: dict, axes) -> tuple:
    """Shared activation-quantization front end: calibration capture,
    static act_scale when present, else per-token dynamic amax over `axes`.
    Returns (xq int8, scale f32 broadcastable to x32)."""
    if CALIB is not None:
        key = id(params["kernel_q"])
        amax = float(jnp.max(jnp.abs(x32)))
        CALIB[key] = max(CALIB.get(key, 0.0), amax)
    if CALIB is None and "act_scale" in params:
        scale = params["act_scale"].astype(jnp.float32)
    else:
        amax = jnp.max(jnp.abs(x32), axis=axes, keepdims=True)
        scale = jnp.where(amax > 0, amax / _QMAX, 1.0)
    xq = jnp.clip(jnp.round(x32 / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return xq, scale


def qkv_projection(params: dict, x: jax.Array) -> jax.Array:
    """int8 w8a8 fused-QKV projection: x (B, N, H) → qkv (3, B, K, N, D).

    params: {"kernel_q": int8 (H, 3, K, D), "kernel_scale": f32 (3, K, D)}
    (models/quantize with attn=True).  int32 MXU accumulation; the rescale
    composes the per-token activation scale with the per-(s,k,d) channel
    scale.  Output in x.dtype — the SDPA downstream stays bf16/f32."""
    x32 = x.astype(jnp.float32)
    xq, xscale = _quantize_act(x32, params, axes=-1)  # (B, N, 1) or scalar
    acc = jnp.einsum("bnh,hskd->sbknd", xq, params["kernel_q"],
                     preferred_element_type=jnp.int32)
    tok = (xscale if jnp.ndim(xscale) == 0
           else xscale[..., 0][None, :, None, :, None])      # (1,B,1,N,1)
    chan = params["kernel_scale"][:, None, :, None, :]        # (3,1,K,1,D)
    return (acc.astype(jnp.float32) * tok * chan).astype(x.dtype)


def attn_out_projection(params: dict, out: jax.Array) -> jax.Array:
    """int8 w8a8 attention output projection: out (B, K, N, D) → (B, N, H)
    float32 (caller adds bias + casts).

    params: {"kernel_q": int8 (K, D, H), "kernel_scale": f32 (H,)}.  The
    per-token scale reduces over the CONTRACTED (K, D) axes per (b, n)."""
    o32 = out.astype(jnp.float32)
    oq, oscale = _quantize_act(o32, params, axes=(1, 3))  # (B,1,N,1) or 0-d
    acc = jnp.einsum("bknd,kdh->bnh", oq, params["kernel_q"],
                     preferred_element_type=jnp.int32)
    tok = oscale if jnp.ndim(oscale) == 0 else oscale[:, 0, :, :]  # (B,N,1)
    return acc.astype(jnp.float32) * tok * params["kernel_scale"]


def qlinear(params: dict, x: jax.Array) -> jax.Array:
    """w8a8 Linear: int8 activations (static calibrated scale when present,
    per-token dynamic otherwise) against a statically quantized kernel;
    int32 MXU accumulation; f32 rescale + bias."""
    if CALIB is not None:
        key = id(params["kernel_q"])
        amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
        CALIB[key] = max(CALIB.get(key, 0.0), amax)
    if CALIB is None and "act_scale" in params:
        s = params["act_scale"].astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                      -_QMAX, _QMAX).astype(jnp.int8)
        out_scale = s * params["kernel_scale"]
    else:
        xq, xscale = dynamic_quantize(x)
        out_scale = xscale * params["kernel_scale"]
    acc = jnp.dot(xq, params["kernel_q"],
                  preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * out_scale
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)
