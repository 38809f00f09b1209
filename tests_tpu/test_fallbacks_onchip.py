"""On-chip single-device fallback equivalence (round-4 verdict item 7).

The CPU suite asserts the pipeline serial fallback and the ring axis_size=1
path are bit-identical to their dense references — but only in interpret /
CPU lowering.  This lane re-pins those claims on the real chip, where the
Mosaic/XLA lowering differs, plus one knob-composition case (bf16 + flash +
tanh-GELU + int8 eval) held against the float64 torch oracle.
"""

import numpy as np

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                             get_mgmt_cross_config,
                                             modify_config)


def _vit_cfg(**over):
    cfg = get_mgmt_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_layers=4,
        img_size=(16, 16, 8), patch_size=(8, 8, 8), num_modalities=2,
        dropout=0.0, lr=1e-3, weight_decay=1e-4, label_smoothing=0.0,
        optim_params={"T_max": 10, "eta_min": 1e-6}))
    modify_config(cfg, over)
    return cfg


def test_pipeline_serial_fallback_bit_identical_onchip():
    """pipeline_stages=2 with NO pipe mesh (serial fallback) == the plain
    sequential trunk, on the real chip, eval AND train-with-dropout.
    CPU claim being re-pinned: tests/test_pipeline.py
    test_model_vit_pipeline_matches_sequential."""
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.parallel.pipeline import stack_layers

    # No sequential-with-dropout reference here on purpose: the fallback's
    # bit-identity contract is vs the SPMD pipeline schedule (same
    # per-(layer, microbatch) key derivation — tests/test_pipeline.py
    # test_pipeline_dropout_mesh_matches_fallback), NOT vs the plain
    # sequential trunk, whose dropout keys are derived per-layer only.
    cfg_seq = _vit_cfg()
    cfg_pp = _vit_cfg(pipeline_stages=2, pipeline_microbatches=2, dropout=0.2)
    params_seq = model_vit.init(jax.random.key(0), cfg_seq)
    params_pp = dict(params_seq)
    params_pp["layers"] = stack_layers(params_seq["layers"])

    rng = np.random.default_rng(0)
    img = (rng.normal(size=(4, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(4,)).astype(np.int32)

    ref = jax.jit(lambda p, x, y: model_vit.apply(p, cfg_seq, x, y))(
        params_seq, img, labels)
    got = jax.jit(lambda p, x, y: model_vit.apply(p, cfg_pp, x, y))(
        params_pp, img, labels)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-5, rtol=1e-5)

    # train mode: the fallback's per-(layer, microbatch) dropout keys are a
    # documented contract (bit-identical incl. dropout, CLAUDE.md) — on chip
    # we assert determinism of the fallback itself and finite loss
    f = jax.jit(lambda p, x, y, k: model_vit.apply(p, cfg_pp, x, y,
                                                   train=True, rng=k))
    l1 = f(params_pp, img, labels, jax.random.key(5))
    l2 = f(params_pp, img, labels, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(l1[0]), np.asarray(l2[0]))
    assert np.isfinite(float(l1[1]))


def test_ring_axis1_matches_sdpa_onchip():
    """The ring attention path at axis_size 1 == plain _sdpa on the REAL
    chip: (a) the sharded_ring_sdpa single-device fallback (literally
    dispatches to _sdpa — bit-identical), (b) the actual ring scan body
    (online softmax + identity ppermute + n_valid masking) forced via
    force_ring inside a 1-device shard_map, compared at HIGHEST matmul
    precision, and (c) a default-precision drift bound vs exact f64 math.

    Why (b) needs the precision pin (round-4 red-lane root cause): at
    TPU-default matmul precision both paths run bf16-mantissa MXU passes,
    and the ring's zero-padded 99-key block tiles/rounds differently from
    the dense 96-key dot — measured max |Δ| 2.0e-3 ring-vs-_sdpa on v5e
    (r4 verdict), which is NOT a math bug: at HIGHEST precision the two
    agree to 1e-5.  The model's SP path keeps default precision (the
    score/p·v GEMMs are the entire SP FLOP budget; HIGHEST is ~6 passes),
    so (c) pins the honest numeric contract for what ships: both paths
    within first-order bf16 rounding (2^-9 relative on MXU inputs, ~1e-2
    after exp amplification at |v|≈3) of the exact answer.
    CPU claim being re-pinned: tests/test_ring.py."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    from cross_attention_vit_tpu.ops.attention import _sdpa
    from cross_attention_vit_tpu.parallel.ring import (_shard_map_partial,
                                                       ring_attention,
                                                       sharded_ring_sdpa)

    rng = np.random.default_rng(3)
    B, K, N, D = 2, 4, 96, 32
    q, k, v = (jnp.asarray(rng.normal(size=(B, K, N, D)), jnp.float32)
               for _ in range(3))
    scale = D ** -0.5

    # (a) fallback dispatch: bit-identical to _sdpa at ambient precision
    ref = np.asarray(jax.jit(lambda a, b, c: _sdpa(a, b, c, scale))(q, k, v))
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1), ("seq",))
    got = np.asarray(jax.jit(
        lambda a, b, c: sharded_ring_sdpa(a, b, c, scale, mesh=mesh))(q, k, v))
    np.testing.assert_array_equal(got, ref)

    # (b) the real ring body on chip: pad 3 key rows, mask them via n_valid;
    # HIGHEST precision isolates the math from MXU pass-count artifacts
    pad = 3
    qp, kp, vp = (jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                  for x in (q, k, v))
    spec = P(None, None, "seq", None)
    body = functools.partial(ring_attention, scale=scale, axis_name="seq",
                             axis_size=1, n_valid=N, force_ring=True)
    wrapped = _shard_map_partial(mesh, "seq")(body, (spec, spec, spec), spec)
    with jax.default_matmul_precision("highest"):
        ref_hi = np.asarray(jax.jit(
            lambda a, b, c: _sdpa(a, b, c, scale))(q, k, v))
        ring_hi = np.asarray(jax.jit(wrapped)(qp, kp, vp))[:, :, :N]
    np.testing.assert_allclose(ring_hi, ref_hi, atol=1e-5, rtol=1e-5)

    # (c) default precision: honest drift bound vs exact float64 host math.
    # Score error ≈ 2^-9·|q||k|·√D·scale ≈ 4e-3; exp amplification and the
    # p·v bf16 pass give |out − exact| ≲ 1e-2·max|v|.  r4 measured 2.0e-3
    # between the paths; 1e-2 is the first-order bound, not a fitted number.
    q64, k64, v64 = (np.asarray(x, np.float64) for x in (q, k, v))
    s64 = np.einsum("bhqd,bhkd->bhqk", q64, k64) * scale
    p64 = np.exp(s64 - s64.max(-1, keepdims=True))
    exact = np.einsum("bhqk,bhkd->bhqd", p64 / p64.sum(-1, keepdims=True), v64)
    ring_def = np.asarray(jax.jit(wrapped)(qp, kp, vp))[:, :, :N]
    tol = 1e-2 * float(np.abs(v64).max())
    assert np.abs(ref - exact).max() < tol, np.abs(ref - exact).max()
    assert np.abs(ring_def - exact).max() < tol, np.abs(ring_def - exact).max()


def test_knob_composition_vs_f64_oracle_onchip():
    """bf16 activations + flash attention + tanh GELU + int8 eval composed on
    the real chip, pinned against the float64 torch oracle (CPU) — the knob
    stack must stay within quantization+bf16 tolerance of exact math."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    import torch_oracle as TO

    from cross_attention_vit_tpu.models import model_cross
    from cross_attention_vit_tpu.models.quantize import quantize_for_inference
    from cross_attention_vit_tpu.ops import layers as L

    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=64, mlp_dim=1024, num_heads=4, num_multi_blocks=1,
        num_self_blocks=1, img_size=(32, 32, 8), patch_size=(8, 8, 8),
        num_modalities=2, attn_order={"0": "1", "1": "0"},
        dropout=0.0, lr=1e-3, weight_decay=0.0, label_smoothing=0.0,
        img_aug=False, optim_params={"T_max": 1, "eta_min": 0}))
    params = model_cross.init(jax.random.key(4), cfg)
    rng = np.random.default_rng(5)
    img = (rng.normal(size=(4, 2, 1, *cfg.img_size)) * 800).astype(np.float32)

    # f64 oracle on the UNQUANTIZED weights with the tanh-GELU formula
    old_gelu = TO.GELU_APPROXIMATE
    TO.GELU_APPROXIMATE = "tanh"
    try:
        want = TO.cross_forward(params, cfg, img)
    finally:
        TO.GELU_APPROXIMATE = old_gelu

    cfg.compute_dtype = "bfloat16"
    cfg.activation_dtype = "bfloat16"
    cfg.use_flash_attention = True
    qparams = quantize_for_inference(params, min_size=1024, attn=True)
    old_approx = L.GELU_APPROX
    L.GELU_APPROX = True
    try:
        got = np.asarray(jax.jit(
            lambda p, x: model_cross.apply(p, cfg, x))(qparams, img))
    finally:
        L.GELU_APPROX = old_approx

    # bf16 activations + w8a8 FFN/attn projections vs f64: loose but pinned
    assert np.max(np.abs(got - want)) < 0.15, np.max(np.abs(got - want))
    np.testing.assert_array_equal(got.argmax(1), np.asarray(want).argmax(1))
