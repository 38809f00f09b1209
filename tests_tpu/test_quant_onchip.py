"""On-chip int8 w8a8 parity: the Mosaic/XLA int8 dot path vs the f32
reference math, and the model-level quantized forward on the real chip.

CPU-backend tests (tests/test_quant.py) prove the math; this lane guards
the TPU lowering — int8 matmuls take a different MXU path (measured ~1.4×
bf16, benchmarks/bench_quant.py) and a lowering bug would show up as value
drift here, not on CPU."""

import numpy as np

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.ops.quant import qlinear, quantize_weight


def test_int8_dot_exact_int_arithmetic_onchip():
    """int8×int8→int32 must be EXACT integer arithmetic on the MXU."""
    rng = np.random.default_rng(0)
    xq = rng.integers(-127, 128, size=(256, 512)).astype(np.int8)
    wq = rng.integers(-127, 128, size=(512, 640)).astype(np.int8)
    got = np.asarray(jax.jit(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32)
    )(xq, wq))
    want = xq.astype(np.int64) @ wq.astype(np.int64)
    assert (want == got).all()


def test_qlinear_onchip_matches_host_math():
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(64, 384)) * 3).astype(np.float32)
    w = (rng.normal(size=(384, 256)) * 0.05).astype(np.float32)
    b = rng.normal(size=(256,)).astype(np.float32) * 0.01
    qp = {**quantize_weight(w), "bias": jnp.asarray(b)}
    got = np.asarray(jax.jit(qlinear)(qp, jnp.asarray(x)))
    # host-side reference of the same quantized math (int64 = exact)
    amax = np.abs(x).max(axis=-1, keepdims=True)
    xs = np.where(amax > 0, amax / 127.0, 1.0)
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int64)
    acc = xq @ np.asarray(qp["kernel_q"], np.int64)
    want = (acc.astype(np.float32) * (xs * np.asarray(qp["kernel_scale"]))
            + b).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_quantized_model_forward_onchip():
    from cross_attention_vit_tpu.configs import (get_mgmt_cross_config,
                                                 modify_config)
    from cross_attention_vit_tpu.models import model_cross
    from cross_attention_vit_tpu.models.quantize import quantize_for_inference

    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=64, mlp_dim=1024, num_heads=4, num_multi_blocks=1,
        num_self_blocks=1, img_size=(16, 16, 8), patch_size=(8, 8, 8),
        num_modalities=2, attn_order={"0": "1", "1": "0"},
        dropout=0.0, lr=1e-3, weight_decay=0.0, label_smoothing=0.0,
        img_aug=False, optim_params={"T_max": 1, "eta_min": 0}))
    params = model_cross.init(jax.random.key(0), cfg)
    qparams = quantize_for_inference(params, min_size=1024)
    img = (np.random.default_rng(2).normal(size=(4, 2, 1, *cfg.img_size))
           * 800).astype(np.float32)
    logits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(params, img))
    qlogits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(qparams, img))
    assert np.max(np.abs(qlogits - logits)) < 0.05
    np.testing.assert_array_equal(qlogits.argmax(1), logits.argmax(1))
