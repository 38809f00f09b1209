"""On-chip parity: Mosaic-compiled Pallas kernels vs XLA reference math.

Geometries deliberately include non-multiples of the kernels' block sizes:
N=1025 (just past the 1024 sublane boundary, single-block regime),
N=1041 and N=2049 (streaming regime, NOT multiples of the 512 KV block —
the round-2 truncation bug's exact shape class).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.kernels.flash_attention import (
    _SINGLE_BLOCK_MAX, flash_attention)


def _sdpa_ref(q, k, v, scale):
    """Straight XLA reference (ops.attention._sdpa math, f32 softmax).

    f32 operands run precision='highest': XLA's DEFAULT f32 dot on TPU is a
    single truncated-bf16 MXU pass (measured 4.6e-3 normalized deviation
    from the 6-pass result), which would make the reference as imprecise as
    the thing under test.  The kernels likewise promote f32 operands to
    HIGHEST (flash_attention._dot_prec), so f32 parity is tight."""
    prec = "highest" if q.dtype == jnp.float32 else None
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=prec,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v, precision=prec,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _qkv(n, dtype, batch=2, heads=4, d=64, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(batch, heads, n, d)), dtype)
    return mk(), mk(), mk()


# N spans both regimes and block-divisibility classes
NS = [513, 1025, 1041, 2049, 4096]


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_flash_forward_matches_xla(n, dtype):
    """Tolerances are scale-normalized and sized for legitimate numeric
    divergence (Mosaic and XLA use different exp approximations and
    accumulation orders — measured ~4e-5/scale f32), NOT for bugs: the
    2a19d19 truncation bug class produces O(scale) errors on whole tiles."""
    dt = jnp.dtype(dtype)
    q, k, v = _qkv(n, dt)
    scale = 64 ** -0.5
    out = np.asarray(jax.jit(flash_attention, static_argnums=3)(q, k, v, scale),
                     np.float32)
    ref = np.asarray(jax.jit(_sdpa_ref, static_argnums=3)(q, k, v, scale),
                     np.float32)
    s = np.abs(ref).max()
    dev = np.abs(out - ref).max() / s
    tol = 2e-4 if dtype == "float32" else 2e-2
    assert dev < tol, f"N={n} {dtype}: normalized max dev {dev:.2e} >= {tol}"


@pytest.mark.parametrize("n", NS)
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_flash_backward_matches_xla(n, dtype):
    """Gradients through the Pallas backward (fused single-block ≤1040,
    blocked streaming above) vs the XLA VJP of the reference math."""
    dt = jnp.dtype(dtype)
    q, k, v = _qkv(n, dt, seed=1)
    scale = 64 ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_ref(q, k, v, scale).astype(jnp.float32) ** 2)

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        gf = np.asarray(gf, np.float32)
        gr = np.asarray(gr, np.float32)
        scale_g = np.abs(gr).max() + 1e-9
        dev = np.abs(gf - gr).max() / scale_g
        # the Pallas backward recomputes its own softmax — a valid different
        # formulation, not the same program: f32 deviation is exp/accum-order
        # noise (both sides HIGHEST-precision dots), bf16 adds operand
        # rounding (docs/PERF_r02.md ~3e-3 mean-rel)
        tol = 1e-3 if dtype == "float32" else 3e-2
        assert dev < tol, (f"d{name} N={n} {dtype}: normalized max dev "
                           f"{dev:.2e} >= {tol}")


def test_regime_boundary_is_exercised():
    """Keep the parametrization honest: NS must include both regimes and at
    least one non-multiple of the 512 streaming block in the streaming
    regime (the 2a19d19 bug class)."""
    assert any(n <= _SINGLE_BLOCK_MAX for n in NS)
    assert any(n > _SINGLE_BLOCK_MAX and n % 512 for n in NS)


def test_resample_kernel_matches_xla_taps():
    """Pallas windowed resample vs the per-volume XLA tap formulation, random
    near-identity affine rows, every axis."""
    from cross_attention_vit_tpu.data.augment import _resample_axis_windowed
    from cross_attention_vit_tpu.kernels.resample import (
        resample_axis_windowed_batched)

    rng = np.random.default_rng(2)
    V, D, H, W = 3, 64, 64, 32
    vols = jnp.asarray(rng.normal(size=(V, D, H, W)) * 500, jnp.float32)
    center = ((D - 1) / 2, (H - 1) / 2, (W - 1) / 2)
    for axis in range(3):
        coefs = np.tile(np.eye(3)[axis], (V, 1)) + rng.normal(size=(V, 3)) * 0.05
        window = 6
        cdelta = jnp.asarray(coefs - np.eye(3)[axis], jnp.float32)
        out = np.asarray(resample_axis_windowed_batched(
            vols, axis, cdelta, center, window))
        for i in range(V):
            ref = np.asarray(_resample_axis_windowed(
                vols[i], axis, tuple(jnp.asarray(coefs[i], jnp.float32)),
                center, window))
            s = np.abs(ref).max()
            dev = np.abs(out[i] - ref).max() / s
            # identical tap order, f32 accumulation both sides — deviation is
            # mul+add fusion order only (last-ulp class, scaled by ~2K taps)
            assert dev < 1e-4, (f"axis {axis} vol {i}: normalized max dev "
                                f"{dev:.2e}")


def test_resample_kernel_bf16_entry_cast():
    """bf16 input takes the f32-enforcement path (round-2 advisor finding:
    a bf16 store to the f32 accumulator would be a Mosaic dtype mismatch)."""
    from cross_attention_vit_tpu.kernels.resample import (
        resample_axis_windowed_batched)

    rng = np.random.default_rng(3)
    vols = jnp.asarray(rng.normal(size=(2, 32, 32, 16)), jnp.bfloat16)
    cdelta = jnp.asarray(rng.normal(size=(2, 3)) * 0.05, jnp.float32)
    out = resample_axis_windowed_batched(vols, 1, cdelta,
                                         (15.5, 15.5, 7.5), 4)
    assert out.dtype == jnp.bfloat16
    f32 = resample_axis_windowed_batched(vols.astype(jnp.float32), 1, cdelta,
                                         (15.5, 15.5, 7.5), 4)
    s = np.abs(np.asarray(f32, np.float32)).max()
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(f32, np.float32), atol=1e-2 * s)


def test_augment_compact_matches_vmap_onchip():
    """Compaction-gated augmentation vs the dense vmap pipeline ON CHIP
    (the CPU suite only covers interpret mode); same draws, ulp-level
    values."""
    from cross_attention_vit_tpu.data.augment import augment_batch

    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.normal(size=(12, 2, 1, 32, 32, 16)) * 300,
                       jnp.float32)
    key = jax.random.key(5)
    dense = np.asarray(jax.jit(lambda k, x: augment_batch(k, x, mode="vmap"))(key, imgs))
    compact = np.asarray(jax.jit(lambda k, x: augment_batch(k, x, mode="compact"))(key, imgs))
    scale = np.abs(dense).max()
    np.testing.assert_allclose(compact, dense, atol=1e-4 * scale)
    np.testing.assert_array_equal(compact == np.asarray(imgs),
                                  dense == np.asarray(imgs))


@pytest.mark.parametrize("n", [513, 1025])
@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_flash_qkv_tn_matches_xla_onchip(n, dtype):
    """The stacked-qkv transposed-operand form — the live model path
    (ops/attention.py impl='flash') — forward AND gradients on chip."""
    from cross_attention_vit_tpu.kernels.flash_attention import (
        flash_attention_qkv_tn)

    dt = jnp.dtype(dtype)
    q, k, v = _qkv(n, dt, seed=3)
    scale = 64 ** -0.5
    tn = lambda t: jnp.swapaxes(t, 2, 3)
    qkv = jnp.stack([tn(q), tn(k), tn(v)])

    out = np.asarray(tn(jax.jit(flash_attention_qkv_tn, static_argnums=1)(
        qkv, scale)), np.float32)
    ref = np.asarray(jax.jit(_sdpa_ref, static_argnums=3)(q, k, v, scale),
                     np.float32)
    dev = np.abs(out - ref).max() / np.abs(ref).max()
    tol = 2e-4 if dtype == "float32" else 2e-2
    assert dev < tol, f"tn fwd N={n} {dtype}: {dev:.2e} >= {tol}"

    def loss_tn(qkv):
        return jnp.sum(flash_attention_qkv_tn(qkv, scale
                                              ).astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_sdpa_ref(q, k, v, scale).astype(jnp.float32) ** 2)

    g_tn = jax.jit(jax.grad(loss_tn))(qkv)
    g_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for s, (gr, name) in enumerate(zip(g_ref, "qkv")):
        gf = np.asarray(tn(g_tn[s]), np.float32)
        gr = np.asarray(gr, np.float32)
        dev = np.abs(gf - gr).max() / (np.abs(gr).max() + 1e-9)
        tol = 1e-3 if dtype == "float32" else 3e-2
        assert dev < tol, f"tn d{name} N={n} {dtype}: {dev:.2e} >= {tol}"
