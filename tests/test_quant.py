"""int8 w8a8 inference quantization (ops/quant.py, models/quantize.py):
op-level error bounds, tree-rewrite selection rules, model-level logit
drift and prediction stability over the real 6-subject cohort."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import get_mgmt_cross_config, modify_config
from cross_attention_vit_tpu.models import model_cross, model_vit
from cross_attention_vit_tpu.models.quantize import (count_quantized,
                                                     quantize_for_inference)
from cross_attention_vit_tpu.ops.layers import linear
from cross_attention_vit_tpu.ops.quant import (dynamic_quantize, qlinear,
                                               quantize_weight)


def test_quantize_weight_exact_on_grid():
    # a kernel whose columns are exact multiples of a dyadic amax/127
    # round-trips bit-exactly (dyadic so scale itself is f32-representable)
    w = np.outer(np.arange(-127, 128), np.array([0.5, 2.0, 0.25])).astype(np.float32)
    q = quantize_weight(w)
    assert q["kernel_q"].dtype == np.int8
    np.testing.assert_allclose(
        q["kernel_q"].astype(np.float32) * q["kernel_scale"], w, rtol=0, atol=0)


def test_dynamic_quantize_rowwise_and_zero_rows():
    x = jnp.asarray([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]], jnp.float32)
    xq, s = dynamic_quantize(x)
    assert xq.dtype == jnp.int8 and s.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(xq[1]), 0)
    # row 0: max|x| = 2.0 quantizes to exactly ±127
    assert int(xq[0, 1]) == -127


def test_qlinear_error_bound_gaussian():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = rng.normal(size=(256, 512)).astype(np.float32) * 0.02
    b = rng.normal(size=(512,)).astype(np.float32) * 0.01
    p = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    qp = {**quantize_weight(w), "bias": jnp.asarray(b)}
    want = np.asarray(linear(p, x))
    got = np.asarray(qlinear(qp, x))
    # two int8 quantization steps on Gaussian data: ~0.5% RMS each
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_linear_dispatches_on_quantized_params():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = rng.normal(size=(64, 96)).astype(np.float32)
    qp = quantize_weight(w)
    np.testing.assert_allclose(np.asarray(linear(qp, x)),
                               np.asarray(qlinear(qp, x)))


def _tiny_cfg():
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=64, mlp_dim=1024, num_heads=4, num_multi_blocks=1,
        num_self_blocks=1, img_size=(16, 16, 8), patch_size=(8, 8, 8),
        num_modalities=2, attn_order={"0": "1", "1": "0"},
        dropout=0.0, lr=1e-3, weight_decay=1e-4, label_smoothing=0.0,
        img_aug=False, optim_params={"T_max": 10, "eta_min": 1e-6}))
    return cfg


def test_selection_rules():
    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    q = quantize_for_inference(params, min_size=1024)
    n, int8_bytes = count_quantized(q)
    # every block ffn fc1+fc2 + per-stream mlp_head fc1 quantized; attention
    # qkv/out, patch embedding, classifier fc2, LN/bias untouched
    assert n > 0 and int8_bytes > 0
    flat_q = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path): v
              for path, v in jax.tree_util.tree_flatten_with_path(q)[0]}
    assert not any("patch_to_embedding/kernel_q" in k for k in flat_q)
    assert any("fc1/kernel_q" in k for k in flat_q)
    assert not any("qkv/kernel_q" in k for k in flat_q)
    # classifier fc2 (mlp×2 < min default) kept float under the DEFAULT size
    q2 = quantize_for_inference(params)
    flat2 = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path): v
             for path, v in jax.tree_util.tree_flatten_with_path(q2)[0]}
    assert any("mlp_head" in k and k.endswith("fc2/kernel") for k in flat2)


def test_attn_selection_and_weight_roundtrip():
    """attn=True rewrites self-attention qkv (H,3,K,D) and out (K,D,H) with
    per-output-channel scales; cross-attention wq/wk/wv/proj stay float.
    Grid-valued kernels reconstruct exactly (scale·q == w)."""
    from cross_attention_vit_tpu.ops.quant import quantize_weight_nd

    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    q = quantize_for_inference(params, min_size=1024, attn=True)
    flat = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in path): v
            for path, v in jax.tree_util.tree_flatten_with_path(q)[0]}
    assert any("qkv/kernel_q" in k for k in flat)
    assert any("attn/out/kernel_q" in k for k in flat)
    assert not any("wq/kernel_q" in k or "proj/kernel_q" in k for k in flat)
    # default stays FFN-only
    q0 = quantize_for_inference(params, min_size=1024)
    flat0 = {"/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                      for k in path)
             for path, _ in jax.tree_util.tree_flatten_with_path(q0)[0]}
    assert not any("qkv/kernel_q" in k for k in flat0)

    rng = np.random.default_rng(0)
    ints = rng.integers(-127, 128, size=(8, 3, 4, 2))
    ints[0] = 127  # pin each channel's amax so the scale is exactly known
    scale = rng.uniform(0.5, 2.0, size=(1, 3, 4, 2)).astype(np.float32)
    w = (ints * scale).astype(np.float32)
    qq = quantize_weight_nd(w, (0,))
    assert qq["kernel_q"].dtype == np.int8
    assert qq["kernel_scale"].shape == (3, 4, 2)
    np.testing.assert_allclose(
        qq["kernel_q"].astype(np.float32) * qq["kernel_scale"], w,
        rtol=1e-5, atol=1e-5)


def test_attn_int8_model_drift_and_stability():
    """Full int8+attn model: logits drift bounded, argmax preserved, and the
    calibrated static-scale path covers the attention nodes too."""
    from cross_attention_vit_tpu.models.quantize import calibrate

    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    qparams = quantize_for_inference(params, min_size=1024, attn=True)
    rng = np.random.default_rng(5)
    img = (rng.normal(size=(4, 2, 1, *cfg.img_size)) * 800).astype(np.float32)
    logits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(params, img))
    qlogits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(qparams, img))
    assert np.max(np.abs(qlogits - logits)) < 0.08
    np.testing.assert_array_equal(qlogits.argmax(1), logits.argmax(1))

    sparams = calibrate(qparams, lambda p, x: model_cross.apply(p, cfg, x), img)
    leaves = jax.tree_util.tree_flatten_with_path(sparams)[0]
    qkv_nodes = [tuple(map(str, p[:-1])) for p, _ in leaves
                 if "kernel_q" in str(p[-1]) and "qkv" in str(p[-2])]
    scale_nodes = {tuple(map(str, p[:-1])) for p, _ in leaves
                   if "act_scale" in str(p[-1])}
    assert qkv_nodes and all(n in scale_nodes for n in qkv_nodes)
    slogits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(sparams, img))
    assert np.max(np.abs(slogits - logits)) < 0.15
    np.testing.assert_array_equal(slogits.argmax(1), logits.argmax(1))


def test_attn_int8_heads1_identity_quirk():
    """int8 qkv + the heads==1 no-projection quirk compose."""
    cfg = _tiny_cfg()
    cfg.num_heads = 1
    params = model_cross.init(jax.random.key(1), cfg)
    qparams = quantize_for_inference(params, min_size=256, attn=True)
    rng = np.random.default_rng(6)
    img = (rng.normal(size=(2, 2, 1, *cfg.img_size)) * 800).astype(np.float32)
    logits = np.asarray(model_cross.apply(params, cfg, img))
    qlogits = np.asarray(model_cross.apply(qparams, cfg, img))
    assert np.max(np.abs(qlogits - logits)) < 0.1
    np.testing.assert_array_equal(qlogits.argmax(1), logits.argmax(1))


@pytest.mark.parametrize("module,make_cfg", [
    (model_cross, _tiny_cfg),
])
def test_model_level_drift_and_stability(module, make_cfg):
    cfg = make_cfg()
    params = module.init(jax.random.key(0), cfg)
    qparams = quantize_for_inference(params, min_size=1024)
    rng = np.random.default_rng(2)
    img = (rng.normal(size=(4, 2, 1, *cfg.img_size)) * 800).astype(np.float32)
    logits = np.asarray(jax.jit(
        lambda p, x: module.apply(p, cfg, x))(params, img))
    qlogits = np.asarray(jax.jit(
        lambda p, x: module.apply(p, cfg, x))(qparams, img))
    # drift bounded well inside the decision margin; argmax preserved
    assert np.max(np.abs(qlogits - logits)) < 0.05
    np.testing.assert_array_equal(qlogits.argmax(1), logits.argmax(1))


def test_calibrated_static_scales():
    from cross_attention_vit_tpu.models.quantize import calibrate

    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    qparams = quantize_for_inference(params, min_size=1024)
    rng = np.random.default_rng(3)
    img = (rng.normal(size=(2, 2, 1, *cfg.img_size)) * 800).astype(np.float32)

    sparams = calibrate(qparams, lambda p, x: model_cross.apply(p, cfg, x), img)

    # every quantized node got an act_scale (the calibration batch exercises
    # every layer), and the capture global is restored
    from cross_attention_vit_tpu.ops import quant as Q

    assert Q.CALIB is None
    leaves = jax.tree_util.tree_flatten_with_path(sparams)[0]
    q_nodes = {tuple(str(p) for p in path[:-1])
               for path, _ in leaves if "kernel_q" in str(path[-1])}
    s_nodes = {tuple(str(p) for p in path[:-1])
               for path, _ in leaves if "act_scale" in str(path[-1])}
    assert q_nodes and q_nodes == s_nodes

    # static path: logits close to full precision, argmax preserved on the
    # calibration batch (no clipping there by construction)
    logits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(params, img))
    slogits = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(sparams, img))
    assert np.max(np.abs(slogits - logits)) < 0.1
    np.testing.assert_array_equal(slogits.argmax(1), logits.argmax(1))


def test_serve_with_quantize(tmp_path):
    from cross_attention_vit_tpu.drivers.serve import InferenceServer
    from cross_attention_vit_tpu.train.checkpoint import CheckpointManager

    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=1,
                            config=cfg)
    path = mgr.save(0, 0.5, {"params": params, "opt": {"x": jnp.zeros((1,))},
                             "epoch": jnp.zeros((), jnp.int32)})
    srv = InferenceServer(path, "cross", img_types=("T1c", "T2"),
                          buckets=(2,), max_wait_ms=1.0, quantize="int8")
    srv.start()
    try:
        assert srv.health()["quantize"] == "int8"
        assert srv.health()["quantized_kernels"] > 0
        rng = np.random.default_rng(4)
        vols = (rng.normal(size=(2, 2, 1, *cfg.img_size)) * 100
                ).astype(np.float32)
        got = srv.predict(vols)
        want = np.asarray(model_cross.apply(params, cfg, vols, train=False))
        assert got.shape == want.shape
        np.testing.assert_array_equal(got.argmax(1), want.argmax(1))
        assert np.max(np.abs(got - want)) < 0.1
    finally:
        srv.stop()


UCSF = "/root/reference/ucsf-data"


@pytest.mark.skipif(not __import__("os").path.isdir(UCSF),
                    reason="ucsf-data not mounted")
def test_quantized_predictions_on_real_cohort():
    """Quantized vs full-precision over the 6 real subjects at a live-ish
    config: logits drift stays inside the decision margin and predictions
    are identical (the serving contract)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    import make_golden

    cfg, types = make_golden.vit_live_config()
    df = make_golden.cohort_df()
    from cross_attention_vit_tpu.data.dataset import BrainDataset

    ds = BrainDataset(df, cfg, types=types, is_train=False, folder=UCSF)
    imgs, _ = ds.batch(range(len(ds)))
    params = model_vit.init(jax.random.key(42), cfg)
    qparams = quantize_for_inference(params)
    n, _ = count_quantized(qparams)
    assert n == cfg.num_layers * 2 + 1  # every ffn fc1/fc2 + head fc1
    logits = np.asarray(jax.jit(
        lambda p, x: model_vit.apply(p, cfg, x))(params, imgs))
    qlogits = np.asarray(jax.jit(
        lambda p, x: model_vit.apply(p, cfg, x))(qparams, imgs))
    assert np.max(np.abs(qlogits - logits)) < 0.05, (qlogits, logits)
    np.testing.assert_array_equal(qlogits.argmax(1), logits.argmax(1))


def test_attn_int8_flash_impl_matches_xla_impl():
    """The int8 attention branch keeps the Pallas flash kernel when the
    config selects it (r4 ran _sdpa unconditionally — the flash drop tripled
    config-4 int8+attn forward, docs/PERF_r05.md).  Same quantized params,
    flash vs xla SDPA: logits agree to kernel tolerance."""
    cfg = _tiny_cfg()
    params = model_cross.init(jax.random.key(2), cfg)
    qparams = quantize_for_inference(params, min_size=1024, attn=True)
    rng = np.random.default_rng(9)
    img = (rng.normal(size=(4, 2, 1, *cfg.img_size)) * 800).astype(np.float32)

    ref = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg, x))(qparams, img))

    import copy

    cfg_f = copy.deepcopy(cfg)
    cfg_f.use_flash_attention = True
    got = np.asarray(jax.jit(
        lambda p, x: model_cross.apply(p, cfg_f, x))(qparams, img))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
    np.testing.assert_array_equal(got.argmax(1), ref.argmax(1))
