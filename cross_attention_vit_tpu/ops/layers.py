"""Core layer applies (pure functions over param pytrees).

Numeric parity notes vs the reference's torch modules:
  * GELU: torch ``nn.GELU()`` defaults to the exact erf form, so we call
    ``jax.nn.gelu(..., approximate=False)`` (JAX defaults to tanh-approx).
  * LayerNorm: torch eps default 1e-5 (the live models use the default;
    reference model_cross.py:14); the legacy CNN-ViT uses eps=1e-6
    (model.py:186) so eps is a parameter here.
  * Dropout: inverted dropout — keep with prob 1-p, scale kept values by
    1/(1-p) at train time, identity at eval.  Matches torch semantics
    (bitwise masks differ: different RNGs).
  * StochasticDepth(mode="row"): per-sample Bernoulli keep of the whole
    residual branch, scaled by 1/keep (torchvision.ops.StochasticDepth,
    used by reference modelv3.py:80-82 with rate 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class RngStream:
    """Threads one PRNG key through an arbitrary number of stochastic layers.

    Each ``next()`` folds an incrementing Python-int counter into the base
    key, which is trace-time static — so a jitted forward pass consumes a
    single key argument no matter how many dropout sites it has.
    """

    def __init__(self, key: jax.Array | None):
        self._key = key
        self._n = 0

    def __call__(self) -> jax.Array:
        if self._key is None:
            raise ValueError("stochastic layer invoked in train mode without an RNG key")
        k = jax.random.fold_in(self._key, self._n)
        self._n += 1
        return k


def promote_input(img: jax.Array) -> jax.Array:
    """Re-promote a low-precision H2D transfer batch to float32 at model entry.

    The data loader may ship batches as bf16/f16 to halve host→HBM bytes
    (PrefetchLoader(transfer_dtype=...)).  Upcasting immediately keeps every
    downstream dtype decision identical to the float32 path — in particular
    ``linear`` still accumulates matmuls in f32 — so with bf16 compute the
    logits are bit-identical to an f32 transfer (the first matmul would have
    rounded the input to bf16 regardless).  The cast fuses into the first
    device op; it is free.
    """
    if img.dtype in (jnp.bfloat16, jnp.float16):
        return img.astype(jnp.float32)
    return img


# Each policy is an additive set of checkpoint-named residuals the backward
# recompute may reuse instead of re-deriving:
#   attn_out     — skip the SDPA kernel (1 × (B,N,H) per layer)
#   dropout_mask — skip the second RngBitGenerator pass (1 B/elt bool masks)
#   ffn_hidden   — fc2's input (post-dropout GELU output); 1 × (B,N,mlp)
#                  per layer (268 MB bf16 at config-4 scale)
#   qkv          — the flash kernel's q/k/v operands (3 × (B,N,H) per layer)
# Measured on v5e config-4 (bf16, docs/PERF_r03.md): saving ffn_hidden alone
# changes nothing (±0.5 ms) — XLA's CSE/remat pass already reuses plain-HLO
# forward values when HBM headroom allows, so the jaxpr-level recompute of
# fc1/GELU never actually re-runs.  Saving qkv is a real −24 ms (−3.6%):
# the flash attention backward is a custom_vjp whose operands sit behind the
# kernel-call boundary, and THAT recompute (LN1 + the fused QKV GEMM) does
# re-run unless the residual is named here.
_REMAT_SAVE_NAMES = {
    "save_attn": ("attn_out",),
    "save_attn_masks": ("attn_out", "dropout_mask"),
    "save_attn_masks_ffn": ("attn_out", "dropout_mask", "ffn_hidden"),
    "save_attn_masks_ffn_qkv": ("attn_out", "dropout_mask", "ffn_hidden",
                                "qkv"),
}


def remat_wrap(fn, config):
    """jax.checkpoint with the config's selective-remat policy.

    remat_policy names a set of saved residuals (_REMAT_SAVE_NAMES above);
    'save_attn' is the default.  Richer policies trade HBM residual bytes for
    skipped recompute GEMMs — measured on v5e config-4 (ViT-Base depth,
    batch 32) in docs/PERF_r03.md.  remat_policy=None (or 'full') recomputes
    everything (minimum memory)."""
    rp = config.get("remat_policy", "save_attn")
    names = _REMAT_SAVE_NAMES.get(rp)
    policy = (jax.checkpoint_policies.save_only_these_names(*names)
              if names else None)
    return jax.checkpoint(fn, policy=policy)


def linear(params: dict, x: jax.Array, compute_dtype=None) -> jax.Array:
    """x @ kernel + bias.  Operands go to `compute_dtype` (bf16 on the MXU)
    when given, else to x.dtype; accumulation is always float32 and the
    result is cast back to x.dtype (so bf16 *activations* still get f32
    matmul accumulation — bf16-accumulate would visibly degrade training).

    Params rewritten by models/quantize.quantize_for_inference carry
    kernel_q/kernel_scale instead of kernel and dispatch to the int8 w8a8
    path (inference-only serving optimization; ops/quant.py)."""
    if "kernel_q" in params:
        from .quant import qlinear

        return qlinear(params, x)
    kernel = params["kernel"]
    out_dtype = x.dtype
    op_dtype = compute_dtype if compute_dtype is not None else out_dtype
    y = jnp.dot(x.astype(op_dtype), kernel.astype(op_dtype),
                preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def layernorm(params: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, computed in float32 for stability."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# GELU flavor.  False (default) = exact erf, the torch nn.GELU() default the
# reference uses (model_cross.py:25).  True = tanh approximation — the same
# formula as torch nn.GELU(approximate='tanh'); on v5e the erf polynomial is
# VPU-compute-bound (3.5 vs 2.2 ms standalone on a (32,1025,4096) hidden), and
# GELU runs 3× per layer in a train step (forward, backward derivative, and
# the HBM-pressure remat recompute), so the approximation is a measurable
# step-time knob.  Opt-in: it changes logits at the ~1e-3 level of the
# approximation itself, same tier as activation_dtype='bfloat16'.
GELU_APPROX: bool = False


def gelu(x: jax.Array) -> jax.Array:
    """GELU — exact erf by default (torch nn.GELU); tanh via GELU_APPROX."""
    return jax.nn.gelu(x, approximate=GELU_APPROX)


# How dropout keys are tied to their input tensor (see _tie_key):
#   'full'   — optimization_barrier on (key, x): x must materialize before the
#              mask generates.  Maximum liveness control, but the barrier also
#              blocks x's producer from fusing into the mask-apply.
#   'scalar' — barrier on (key, x[0,…,0]): the scheduler still cannot hoist
#              the mask generation above x's producing layer (the scalar
#              witness depends on it), while x itself stays fusible into the
#              mask-apply.  Default; measured equal-or-better step time with
#              identical mask values ('full' and 'scalar' barrier the same
#              key data).
#   None     — no tie: only safe for small models (XLA hoists every mask to
#              step start; measured 32 GB of simultaneous mask temps at
#              config-4 scale).
TIE_KEY_MODE: str | None = "scalar"


def _tie_key(key: jax.Array, x: jax.Array):
    """Make the PRNG key *data-depend* on the tensor it will mask.

    Dropout keys are derived from the step key alone, so every layer's mask
    generation is schedulable at step start — XLA's latency-hiding scheduler
    then hoists them all, keeping O(num_layers) full-width u32/f32 mask temps
    live at once (measured: 12-layer ModelVIT, batch 32 — 20+ simultaneous
    516 MB (B, N, mlp) buffers, 32 GB > HBM).  An optimization_barrier pairing
    the key with the input (or a scalar witness of it, TIE_KEY_MODE) forces
    each mask to materialize only when its consumer's layer is live,
    restoring O(1)-layer liveness.  Identity on values."""
    if TIE_KEY_MODE == "full":
        kd, x = jax.lax.optimization_barrier((jax.random.key_data(key), x))
        return jax.random.wrap_key_data(kd), x
    if TIE_KEY_MODE == "scalar":
        # one corner element is enough: the barrier's key output now depends
        # on x's producing computation (XLA duplicates the tiny slice into
        # its own fusion) without forcing all of x to materialize
        witness = jax.lax.slice(x, (0,) * x.ndim, (1,) * x.ndim)
        kd, _ = jax.lax.optimization_barrier((jax.random.key_data(key), witness))
        return jax.random.wrap_key_data(kd), x
    return key, x


# PRNG implementation for dropout masks.  "rbg" rides the TPU's hardware
# RngBitGenerator — measured 2× faster than threefry at config-4 scale
# (36 full-width masks of (32,1025,1024): 32.6 ms → 16.5 ms on v5e).  Mask
# bit-patterns carry no parity contract (the reference's torch RNG differs
# bitwise anyway) and stay deterministic per (key, shape) within a given
# jax/backend version.  Set to None to generate bits with the key's own
# (threefry) impl.
DROPOUT_RNG_IMPL: str | None = "rbg"


def _mask_key(key: jax.Array) -> jax.Array:
    """Re-wrap a threefry key's data as a DROPOUT_RNG_IMPL key (rbg keys are
    four uint32 words; duplicating the 2-word threefry data keeps the mapping
    deterministic and collision-free across fold_in counters)."""
    if DROPOUT_RNG_IMPL is None:
        return key
    kd = jax.random.key_data(key)
    if DROPOUT_RNG_IMPL == "rbg" and kd.shape[-1] == 2:
        kd = jnp.concatenate([kd, kd], axis=-1)
    return jax.random.wrap_key_data(kd, impl=DROPOUT_RNG_IMPL)


# Mask bit width: 16 thresholds uint16 random bits against round(keep·2^16)
# — measured 10× faster than jax.random.bernoulli's uniform-f32 compare at
# config-4 scale on v5e (102.5 → 10.1 ms for the step's 36 masks;
# benchmarks/mask_probe.py) at a keep-probability quantization of ≤ 2^-17,
# far below the distributional contract's noise.  8 halves the random-bit
# traffic again (−6.5 ms on the live cross8 step, dropout 0.25) at 2^-8
# quantization.  'auto' (default) picks 8 when keep·2^8 is an integer — the
# threshold is then EXACT (the live ModelCross dropout 0.25 → keep 0.75 =
# 192/256) — and 16 otherwise (ModelVIT's 0.1 is not 8-bit-exact).  None
# restores exact-probability bernoulli masks.
DROPOUT_BITS: int | str | None = "auto"


def apply_config_knobs(config) -> None:
    """Apply the module-level perf knobs from config fields, when present.

    Lets the training/eval CLIs reach the bench fast path through plain
    ``--set`` overrides (e.g. ``--set gelu_approx=True``) instead of Python
    assignments.  Unknown/absent fields leave the module defaults alone.

    config keys → module knobs: gelu_approx → GELU_APPROX, tie_key_mode →
    TIE_KEY_MODE, dropout_rng_impl → DROPOUT_RNG_IMPL, dropout_bits →
    DROPOUT_BITS.
    """
    g = globals()
    for cfg_key, knob in (("gelu_approx", "GELU_APPROX"),
                          ("tie_key_mode", "TIE_KEY_MODE"),
                          ("dropout_rng_impl", "DROPOUT_RNG_IMPL"),
                          ("dropout_bits", "DROPOUT_BITS")):
        if cfg_key in config:
            g[knob] = config[cfg_key]


def _mask_bits(keep: float) -> int | None:
    if DROPOUT_BITS == "auto":
        return 8 if (keep * 256) == int(keep * 256) else 16
    return DROPOUT_BITS


def _mask(key: jax.Array, keep: float, shape) -> jax.Array:
    bits = _mask_bits(keep)
    if bits in (8, 16):
        dt = jnp.uint16 if bits == 16 else jnp.uint8
        thresh = int(round(keep * (1 << bits)))
        if thresh < (1 << bits):  # keep≈1 would wrap to all-False
            return jax.random.bits(_mask_key(key), shape, dt) < dt(thresh)
    return jax.random.bernoulli(_mask_key(key), keep, shape)


def dropout(x: jax.Array, rate: float, rng: RngStream, train: bool) -> jax.Array:
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    key, x = _tie_key(rng(), x)
    mask = _mask(key, keep, x.shape)
    # named so remat_policy='save_attn_masks' can keep the bool mask (1 B/elt)
    # instead of re-running the RngBitGenerator in the backward recompute
    from jax.ad_checkpoint import checkpoint_name

    mask = checkpoint_name(mask, "dropout_mask")
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def stochastic_depth_row(x: jax.Array, rate: float, rng: RngStream, train: bool) -> jax.Array:
    """torchvision StochasticDepth(mode='row'): drop the branch per sample."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    key, x = _tie_key(rng(), x)
    mask = _mask(key, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def feed_forward(params: dict, x: jax.Array, dropout_rate: float,
                 rng: RngStream, train: bool, compute_dtype=None) -> jax.Array:
    """Linear→GELU→Dropout→Linear→Dropout (reference model_cross.py:19-31)."""
    h = linear(params["fc1"], x, compute_dtype)
    h = gelu(h)
    h = dropout(h, dropout_rate, rng, train)
    # named post-dropout so remat_policy='save_attn_masks_ffn' saves exactly
    # what fc2's backward consumes: recompute then skips fc1+GELU (+ the
    # mask apply), the largest recompute cost in the layer
    from jax.ad_checkpoint import checkpoint_name

    h = checkpoint_name(h, "ffn_hidden")
    h = linear(params["fc2"], h, compute_dtype)
    h = dropout(h, dropout_rate, rng, train)
    return h


def mlp_head(params: dict, x: jax.Array, dropout_rate: float,
             rng: RngStream, train: bool, compute_dtype=None) -> jax.Array:
    """Linear(H→mlp)→GELU→Dropout→Linear(mlp→classes)→Dropout — the per-stream
    classification head (reference model_cross.py:176-183)."""
    return feed_forward(params, x, dropout_rate, rng, train, compute_dtype)
