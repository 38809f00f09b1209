"""Unit tests for ops: patchify ordering, losses, layers vs torch."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from einops import rearrange

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.ops import initializers as init_ops
from cross_attention_vit_tpu.ops.attention import cross_attention_cls, self_attention
from cross_attention_vit_tpu.ops.layers import RngStream, dropout, gelu, layernorm, linear
from cross_attention_vit_tpu.ops.losses import bce_with_logits, cross_entropy
from cross_attention_vit_tpu.ops.patchify import num_patches, patchify_3d, unpatchify_3d


def test_patchify_matches_reference_einops_pattern():
    """Token order (h w d), feature order (p1 p2 p3 c) — model_cross.py:193."""
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(2, 1, 16, 8, 12)).astype(np.float32)
    patch = (4, 2, 6)
    got = np.asarray(patchify_3d(jnp.asarray(vol), patch))
    want = rearrange(torch.from_numpy(vol),
                     "b c (d p1) (h p2) (w p3) -> b (h w d) (p1 p2 p3 c)",
                     p1=patch[0], p2=patch[1], p3=patch[2]).numpy()
    np.testing.assert_array_equal(got, want)


def test_patchify_multichannel_and_roundtrip():
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(1, 3, 8, 8, 8)).astype(np.float32)
    patch = (4, 4, 2)
    tok = patchify_3d(jnp.asarray(vol), patch)
    assert tok.shape == (1, num_patches((8, 8, 8), patch), 4 * 4 * 2 * 3)
    back = unpatchify_3d(tok, patch, (8, 8, 8), channels=3)
    np.testing.assert_array_equal(np.asarray(back), vol)


@pytest.mark.parametrize("smoothing", [0.0, 0.1, 0.3])
def test_cross_entropy_matches_torch(smoothing):
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(16, 2)).astype(np.float32) * 5
    labels = rng.integers(0, 2, size=(16,))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), smoothing))
    want = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels).long(),
                           label_smoothing=smoothing).item()
    assert got == pytest.approx(want, rel=1e-6)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(32,)).astype(np.float32) * 3
    targets = rng.integers(0, 2, size=(32,)).astype(np.float32)
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)).item()
    assert got == pytest.approx(want, rel=1e-6)


def test_gelu_is_exact_erf_form():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    want = F.gelu(torch.from_numpy(x)).numpy()  # torch default = erf form
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_gelu_approx_matches_torch_tanh_form():
    """GELU_APPROX=True is torch's other supported GELU —
    nn.GELU(approximate='tanh') — not an uncontrolled approximation."""
    from cross_attention_vit_tpu.ops import layers as L

    x = np.linspace(-4, 4, 101).astype(np.float32)
    old = L.GELU_APPROX
    L.GELU_APPROX = True
    try:
        got = np.asarray(L.gelu(jnp.asarray(x)))
    finally:
        L.GELU_APPROX = old
    want = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and it is genuinely a different curve from the erf form
    assert np.max(np.abs(want - F.gelu(torch.from_numpy(x)).numpy())) > 1e-5


def test_layernorm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 7, 32)).astype(np.float32) * 50
    p = {"scale": jnp.asarray(rng.normal(size=32).astype(np.float32)),
         "bias": jnp.asarray(rng.normal(size=32).astype(np.float32))}
    got = np.asarray(layernorm(p, jnp.asarray(x)))
    want = F.layer_norm(torch.from_numpy(x), (32,),
                        torch.from_numpy(np.asarray(p["scale"])),
                        torch.from_numpy(np.asarray(p["bias"]))).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_linear_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 5, 8)).astype(np.float32)
    w = rng.normal(size=(8, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    got = np.asarray(linear({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                            jnp.asarray(x)))
    want = (torch.from_numpy(x) @ torch.from_numpy(w) + torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_self_attention_matches_torch_oracle():
    from torch_oracle import self_attn_t
    rng = np.random.default_rng(6)
    H, heads, N, B = 32, 4, 9, 2
    kg = init_ops.KeyGen(jax.random.key(0))
    p = {"qkv": init_ops.fused_qkv_params(kg(), H, heads),
         "out": init_ops.head_out_params(kg(), H, heads)}
    x = rng.normal(size=(B, N, H)).astype(np.float32)
    got = np.asarray(self_attention(p, jnp.asarray(x), heads, 0.0,
                                    RngStream(None), False))
    want = self_attn_t(jax.tree.map(np.asarray, p),
                       torch.from_numpy(x).double(), heads).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cross_attention_matches_torch_oracle():
    from torch_oracle import cross_attn_t
    rng = np.random.default_rng(7)
    H, heads, N, B = 32, 4, 9, 2
    kg = init_ops.KeyGen(jax.random.key(1))
    p = {k: init_ops.head_in_params(kg(), H, heads) for k in ("wq", "wk", "wv")}
    p["proj"] = init_ops.head_out_params(kg(), H, heads)
    x = rng.normal(size=(B, N, H)).astype(np.float32)
    got = np.asarray(cross_attention_cls(p, jnp.asarray(x), heads, 0.0,
                                         RngStream(None), False))
    assert got.shape == (B, 1, H)
    want = cross_attn_t(jax.tree.map(np.asarray, p),
                        torch.from_numpy(x).double(), heads).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dropout_train_eval_semantics():
    x = jnp.ones((1000, 16))
    out_eval = dropout(x, 0.5, RngStream(None), train=False)
    np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
    out_train = np.asarray(dropout(x, 0.5, RngStream(jax.random.key(0)), train=True))
    kept = out_train != 0
    assert 0.4 < kept.mean() < 0.6
    np.testing.assert_allclose(out_train[kept], 2.0)  # inverted scaling 1/(1-p)


def test_dropout_tie_key_modes_identical():
    """TIE_KEY_MODE only changes the XLA scheduling contract, never the mask
    values: 'scalar' and 'full' barrier the same key data."""
    from cross_attention_vit_tpu.ops import layers as L

    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 32)),
                    jnp.float32)
    outs = {}
    orig = L.TIE_KEY_MODE
    try:
        for mode in ("scalar", "full", None):
            L.TIE_KEY_MODE = mode
            outs[mode] = np.asarray(
                dropout(x, 0.3, RngStream(jax.random.key(7)), train=True))
    finally:
        L.TIE_KEY_MODE = orig
    np.testing.assert_array_equal(outs["scalar"], outs["full"])
    np.testing.assert_array_equal(outs["scalar"], outs[None])


def test_dropout_bits_mask_keep_rate():
    """DROPOUT_BITS=16 thresholds uint16 random bits instead of a uniform-f32
    compare (10× cheaper mask gen on v5e, benchmarks/mask_probe.py).  The
    distributional contract must hold: empirical keep rate within sampling
    noise of `keep` for every variant, exact quantization ≤ 2^-16, and a
    keep≈1 rate must not wrap the threshold to all-False."""
    from cross_attention_vit_tpu.ops import layers as L

    x = jnp.ones((512, 512))
    n = x.size
    orig = L.DROPOUT_BITS
    try:
        for bits in (16, 8, "auto", None):
            L.DROPOUT_BITS = bits
            for rate in (0.1, 0.25, 0.5):
                keep = 1.0 - rate
                out = np.asarray(
                    dropout(x, rate, RngStream(jax.random.key(3)), train=True))
                kept = (out != 0).mean()
                # 5 sigma of Binomial(n, keep) plus the 2^-8 quantization slack
                q = 2.0 ** -bits if isinstance(bits, int) else 0
                tol = 5 * np.sqrt(keep * rate / n) + q
                assert abs(kept - keep) < tol, (bits, rate, kept)
                np.testing.assert_allclose(out[out != 0], 1.0 / keep, rtol=1e-6)
            if bits == "auto":
                # routing: 8 bits iff keep quantizes exactly at 2^-8
                assert L._mask_bits(0.75) == 8 and L._mask_bits(0.9) == 16
            # keep≈1: round(keep·2^bits) would hit 2^bits and wrap — the guard
            # must fall back to bernoulli, keeping everything
            out = np.asarray(
                dropout(x, 1e-7, RngStream(jax.random.key(3)), train=True))
            assert (out != 0).mean() > 0.999
    finally:
        L.DROPOUT_BITS = orig


def test_bf16_activation_dtype_close_to_f32():
    """activation_dtype='bfloat16' stores activations in bf16 between ops
    (matmuls still accumulate f32) — logits must stay within bf16
    rounding-accumulation distance of the f32 path."""
    from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
    from cross_attention_vit_tpu.models import model_vit

    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=64, mlp_dim=128, num_heads=4,
                            num_layers=2, img_size=(16, 16, 8),
                            patch_size=(8, 8, 8), num_modalities=2,
                            dropout=0.0, label_smoothing=0.0))
    params = model_vit.init(jax.random.key(0), cfg)
    img = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 2, 1, 16, 16, 8)) * 100, jnp.float32)
    logits_f32 = np.asarray(model_vit.apply(params, cfg, img))
    cfg.activation_dtype = "bfloat16"
    cfg.compute_dtype = "bfloat16"
    logits_bf16 = np.asarray(model_vit.apply(params, cfg, img))
    assert logits_bf16.dtype == np.float32  # logits always emitted f32
    scale = np.abs(logits_f32).max()
    np.testing.assert_allclose(logits_bf16, logits_f32, atol=0.05 * scale)


def test_linear_bf16_activations_accumulate_f32():
    """A bf16-activation linear must not accumulate in bf16: compare against
    the f32 ground truth on a reduction long enough to expose bf16
    accumulation error (which would be ~1e-2 relative at K=4096)."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(8, 4096)).astype(np.float32)
    w = (rng.normal(size=(4096, 32)) / 64).astype(np.float32)
    params = {"kernel": jnp.asarray(w), "bias": jnp.zeros((32,))}
    exact = x @ w
    y = np.asarray(linear(params, jnp.asarray(x, jnp.bfloat16)),
                   dtype=np.float32)
    # operands rounded to bf16 (~0.4% elementwise) but the 4096-term sum is
    # accumulated in f32: error stays at operand-rounding scale, not K·ulp
    np.testing.assert_allclose(y, exact, rtol=0.02, atol=0.02 * np.abs(exact).std())


def test_xavier_uniform_bounds_and_moments():
    k = jax.random.key(0)
    w = np.asarray(init_ops.xavier_uniform(k, (256, 512)))
    bound = np.sqrt(6.0 / (256 + 512))
    assert np.abs(w).max() <= bound
    assert abs(w.mean()) < bound / 50
    # uniform variance = bound^2/3
    np.testing.assert_allclose(w.var(), bound ** 2 / 3, rtol=0.05)


def test_apply_config_knobs_sets_and_leaves_module_defaults():
    """--set-style config fields map onto the ops.layers module knobs;
    absent fields leave the current values untouched."""
    from cross_attention_vit_tpu.configs import Config
    from cross_attention_vit_tpu.ops import layers as L

    saved = (L.GELU_APPROX, L.TIE_KEY_MODE, L.DROPOUT_RNG_IMPL, L.DROPOUT_BITS)
    try:
        L.apply_config_knobs(Config(gelu_approx=True, dropout_bits=16))
        assert L.GELU_APPROX is True
        assert L.DROPOUT_BITS == 16
        assert L.TIE_KEY_MODE == saved[1]       # untouched
        assert L.DROPOUT_RNG_IMPL == saved[2]   # untouched
        L.apply_config_knobs(Config(tie_key_mode=None, dropout_rng_impl=None))
        assert L.TIE_KEY_MODE is None and L.DROPOUT_RNG_IMPL is None
    finally:
        (L.GELU_APPROX, L.TIE_KEY_MODE,
         L.DROPOUT_RNG_IMPL, L.DROPOUT_BITS) = saved
