"""Golden parity: JAX models vs the torch oracle at fixed weights, eval mode.

The parity contract (SURVEY.md §6): logits within 1e-3 of the reference
semantics.  The oracle computes in float64; the JAX side runs the default
float32 path, so agreement here bounds our numerical error end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import (get_mgmt_config, get_mgmt_cross_config,
                                             modify_config)
from cross_attention_vit_tpu.models import model_cross, model_vit
import torch_oracle


def small_cross_config(attn_order, num_modalities):
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=64, mlp_dim=128, num_heads=4,
        img_size=(32, 32, 16), patch_size=(8, 8, 8),
        num_modalities=num_modalities, attn_order=attn_order,
        dropout=0.1, lr=1e-4, weight_decay=5e-4, label_smoothing=0.1,
        optim_params={"T_max": 250, "eta_min": 1e-6},
    ))
    return cfg


def small_vit_config(num_modalities):
    cfg = get_mgmt_config()
    modify_config(cfg, dict(
        hidden_dim=64, mlp_dim=128, num_heads=4, num_layers=3,
        img_size=(32, 32, 16), patch_size=(8, 8, 8),
        num_modalities=num_modalities,
        dropout=0.1, lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
        optim_params={"T_max": 150, "eta_min": 1e-6},
    ))
    return cfg


def make_batch(cfg, batch=2, scale=300.0, seed=0):
    """Raw-int16-magnitude inputs: the reference applies NO intensity
    normalization in the active path (SURVEY.md §3.2 note)."""
    rng = np.random.default_rng(seed)
    D, H, W = cfg.img_size
    img = (rng.normal(size=(batch, cfg.num_modalities, 1, D, H, W)) * scale
           ).astype(np.float32)
    labels = rng.integers(0, cfg.num_classes, size=(batch,))
    return img, labels


@pytest.mark.parametrize("attn_order,m", [
    ({"0": "1", "1": "2", "2": "0"}, 3),   # live 3-stream grid (main_mist.py:71)
    ({"0": "1", "1": "2"}, 3),             # partial routing (main_mist.py:72)
    ({}, 2),                                # no cross-attention (main_mist.py:76)
])
def test_model_cross_parity(attn_order, m):
    cfg = small_cross_config(attn_order, m)
    params = model_cross.init(jax.random.key(42), cfg)
    img, labels = make_batch(cfg)

    logits, loss = jax.jit(
        lambda p, x, y: model_cross.apply(p, cfg, x, y, train=False)
    )(params, img, labels)

    np_params = jax.tree.map(np.asarray, params)
    want_logits, want_loss = torch_oracle.cross_forward(np_params, cfg, img, labels)

    scale = max(1.0, np.abs(want_logits).max())
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               atol=1e-3 * scale, rtol=2e-4)
    assert float(loss) == pytest.approx(want_loss, rel=1e-4, abs=1e-5)


@pytest.mark.parametrize("m", [1, 2, 3])
def test_model_vit_parity(m):
    cfg = small_vit_config(m)
    params = model_vit.init(jax.random.key(7), cfg)
    img, labels = make_batch(cfg, seed=m)

    logits, loss = jax.jit(
        lambda p, x, y: model_vit.apply(p, cfg, x, y, train=False)
    )(params, img, labels)

    np_params = jax.tree.map(np.asarray, params)
    want_logits, want_loss = torch_oracle.vit_forward(np_params, cfg, img, labels)

    scale = max(1.0, np.abs(want_logits).max())
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               atol=1e-3 * scale, rtol=2e-4)
    assert float(loss) == pytest.approx(want_loss, rel=1e-4, abs=1e-5)


def test_model_cross_heads1_identity_parity():
    """heads==1 quirk: the reference's Attention builds `to_out =
    nn.Identity()` when num_heads == 1 and dim_head == hidden_dim
    (model_cross.py:37,45-48) — no output projection, no output dropout.
    Our init omits the "out" params and apply skips the projection; the
    float64 oracle (torch_oracle.self_attn_t) reproduces the Identity."""
    cfg = small_cross_config({"0": "1", "1": "0"}, 2)
    cfg.num_heads = 1
    params = model_cross.init(jax.random.key(3), cfg)
    # every self block must carry qkv but NO out projection
    for stream in params["multi_blocks"][0]["self_blocks"]:
        for layer in stream:
            assert "qkv" in layer["attn"] and "out" not in layer["attn"]
    img, labels = make_batch(cfg)

    logits, loss = jax.jit(
        lambda p, x, y: model_cross.apply(p, cfg, x, y, train=False)
    )(params, img, labels)

    np_params = jax.tree.map(np.asarray, params)
    want_logits, want_loss = torch_oracle.cross_forward(np_params, cfg, img, labels)
    scale = max(1.0, np.abs(want_logits).max())
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               atol=1e-3 * scale, rtol=2e-4)
    assert float(loss) == pytest.approx(want_loss, rel=1e-4, abs=1e-5)


def test_model_vit_heads1_identity_parity():
    """Same quirk in the baseline's Attention (reference modelv3.py:53-57)."""
    cfg = small_vit_config(2)
    cfg.num_heads = 1
    params = model_vit.init(jax.random.key(5), cfg)
    for layer in params["layers"]:
        assert "qkv" in layer["attn"] and "out" not in layer["attn"]
    img, labels = make_batch(cfg, seed=5)

    logits, loss = jax.jit(
        lambda p, x, y: model_vit.apply(p, cfg, x, y, train=False)
    )(params, img, labels)

    np_params = jax.tree.map(np.asarray, params)
    want_logits, want_loss = torch_oracle.vit_forward(np_params, cfg, img, labels)
    scale = max(1.0, np.abs(want_logits).max())
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               atol=1e-3 * scale, rtol=2e-4)
    assert float(loss) == pytest.approx(want_loss, rel=1e-4, abs=1e-5)


def test_model_cross_train_mode_runs_and_differs():
    """Dropout must engage in train mode and be deterministic per key."""
    cfg = small_cross_config({"0": "1", "1": "0"}, 2)
    params = model_cross.init(jax.random.key(0), cfg)
    img, labels = make_batch(cfg)
    f = jax.jit(lambda p, x, y, k: model_cross.apply(p, cfg, x, y, train=True, rng=k))
    l1, _ = f(params, img, labels, jax.random.key(1))
    l1b, _ = f(params, img, labels, jax.random.key(1))
    l2, _ = f(params, img, labels, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l1b))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_logits_shape_and_inference_api():
    cfg = small_vit_config(2)
    params = model_vit.init(jax.random.key(0), cfg)
    img, _ = make_batch(cfg)
    logits = model_vit.apply(params, cfg, img)  # no labels → logits only
    assert logits.shape == (2, cfg.num_classes)


def test_param_counts_match_reference_formulas():
    """Reference live geometry: hidden 1024, mlp 4096, heads 16, 512 patches.

    Hand-derived from the reference layer shapes: ModelCross 3-stream/3-cross
    = 12 self blocks × 12.593M + 6 cross blocks × 12.596M + 3 heads × 4.207M
    + patch-embed 2.098M + pos/cls 0.526M ≈ 241.9M; ModelVIT 2-stream
    = 4 blocks × 12.593M + head 4.21M + embed 2.1M + pos 1.05M ≈ 57.7M.
    (SURVEY.md §6's ≈255M/62M estimates double-counted the head MLP.)"""
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(num_modalities=3,
                            attn_order={"0": "1", "1": "2", "2": "0"},
                            dropout=0.25, lr=1e-4, weight_decay=5e-4,
                            label_smoothing=0.0,
                            optim_params={"T_max": 250, "eta_min": 1e-6}))
    shapes = jax.eval_shape(lambda k: model_cross.init(k, cfg), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 239e6 < n < 245e6, n

    cfg_v = get_mgmt_config()
    modify_config(cfg_v, dict(num_modalities=2, dropout=0.1, lr=1e-4,
                              weight_decay=5e-4, label_smoothing=0.0,
                              optim_params={"T_max": 150, "eta_min": 1e-6}))
    shapes = jax.eval_shape(lambda k: model_vit.init(k, cfg_v), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 55e6 < n < 60e6, n


@pytest.mark.parametrize("policy", ["save_attn", "save_attn_masks",
                                    "save_attn_masks_ffn",
                                    "save_attn_masks_ffn_qkv", "full"])
def test_remat_matches_non_remat(policy):
    """jax.checkpoint over blocks must not change values (fwd or grads),
    whichever residual-saving policy the backward recompute uses."""
    cfg = small_cross_config({"0": "1", "1": "0"}, 2)
    params = model_cross.init(jax.random.key(0), cfg)
    img, labels = make_batch(cfg)
    key = jax.random.key(5)

    def loss(p, cfg_):
        return model_cross.apply(p, cfg_, img, labels, train=True, rng=key)[1]

    cfg_r = small_cross_config({"0": "1", "1": "0"}, 2)
    modify_config(cfg_r, {"remat": True, "remat_policy": policy})
    l0 = float(loss(params, cfg))
    l1 = float(loss(params, cfg_r))
    assert l0 == pytest.approx(l1, rel=1e-6)

    g0 = jax.grad(lambda p: loss(p, cfg))(params)
    g1 = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_remat_vit_matches():
    from cross_attention_vit_tpu.models import model_vit as mv

    cfg = small_vit_config(2)
    params = mv.init(jax.random.key(1), cfg)
    img, labels = make_batch(cfg)
    key = jax.random.key(7)
    l0 = float(mv.apply(params, cfg, img, labels, train=True, rng=key)[1])
    cfg_r = small_vit_config(2)
    modify_config(cfg_r, {"remat": True})
    l1 = float(mv.apply(params, cfg_r, img, labels, train=True, rng=key)[1])
    assert l0 == pytest.approx(l1, rel=1e-6)


def test_stacked_streams_removed_rejects():
    """`config.stacked_streams` was REMOVED in round 5 after measuring
    negative twice on v5e (apply-time stacking +7 ms, docs/PERF_r03.md;
    init-time pre-stacking +4.2 ms, docs/PERF_r05.md).  Old configs carrying
    the flag must fail loudly, in init and in apply."""
    cfg = small_cross_config({"0": "1", "1": "0"}, 2)
    modify_config(cfg, {"stacked_streams": True})
    with pytest.raises(ValueError, match="stacked_streams was removed"):
        model_cross.init(jax.random.key(0), cfg)

    clean = small_cross_config({"0": "1", "1": "0"}, 2)
    params = model_cross.init(jax.random.key(0), clean)
    img, labels = make_batch(clean)
    with pytest.raises(ValueError, match="stacked_streams was removed"):
        model_cross.apply(params, cfg, img, labels)
