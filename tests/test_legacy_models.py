"""Legacy model families: ViT3D (CNN stem + torch-post-norm transformer,
DenseNet truncation), CNN-stem ViT v1 (BCE head), surgery/shape tracer."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
from cross_attention_vit_tpu.models import cnn_vit, densenet, surgery, vit3d


def vit3d_cfg(**over):
    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=32, num_heads=4, num_layers=2,
                            img_size=(32, 32, 16), num_modalities=2,
                            dropout=0.0, label_smoothing=0.1, lr=1e-3,
                            weight_decay=0.0,
                            optim_params={"T_max": 10, "eta_min": 1e-6}))
    modify_config(cfg, over)
    return cfg


# ---------------------------------------------------------------------------
# torch-post-norm encoder layer parity
# ---------------------------------------------------------------------------

def test_encoder_layer_matches_torch_transformer_layer():
    """Our post-norm layer vs nn.TransformerEncoderLayer (eval, no dropout)."""
    H, heads = 32, 4
    kg_params = vit3d._encoder_layer_init(
        __import__("cross_attention_vit_tpu.ops.initializers",
                   fromlist=["KeyGen"]).KeyGen(jax.random.key(0)), H, heads)

    layer = torch.nn.TransformerEncoderLayer(
        d_model=H, nhead=heads, dim_feedforward=4 * H, dropout=0.0,
        batch_first=True)
    layer.eval()
    with torch.no_grad():
        qkv = np.asarray(kg_params["qkv"]["kernel"]).reshape(H, 3 * H)
        layer.self_attn.in_proj_weight.copy_(torch.from_numpy(qkv.T.copy()))
        layer.self_attn.in_proj_bias.copy_(torch.from_numpy(
            np.asarray(kg_params["qkv"]["bias"]).reshape(-1)))
        outk = np.asarray(kg_params["out"]["kernel"]).reshape(H, H)
        layer.self_attn.out_proj.weight.copy_(torch.from_numpy(outk.T.copy()))
        layer.self_attn.out_proj.bias.copy_(torch.from_numpy(
            np.asarray(kg_params["out"]["bias"])))
        layer.linear1.weight.copy_(torch.from_numpy(
            np.asarray(kg_params["fc1"]["kernel"]).T.copy()))
        layer.linear1.bias.copy_(torch.from_numpy(np.asarray(kg_params["fc1"]["bias"])))
        layer.linear2.weight.copy_(torch.from_numpy(
            np.asarray(kg_params["fc2"]["kernel"]).T.copy()))
        layer.linear2.bias.copy_(torch.from_numpy(np.asarray(kg_params["fc2"]["bias"])))
        for ours, theirs in [("norm1", layer.norm1), ("norm2", layer.norm2)]:
            theirs.weight.copy_(torch.from_numpy(np.asarray(kg_params[ours]["scale"])))
            theirs.bias.copy_(torch.from_numpy(np.asarray(kg_params[ours]["bias"])))

    x = np.random.default_rng(0).normal(size=(2, 9, H)).astype(np.float32)
    from cross_attention_vit_tpu.ops.layers import RngStream
    got = np.asarray(vit3d._encoder_layer_apply(
        kg_params, jnp.asarray(x), heads, 0.0, RngStream(None), False, None))
    with torch.no_grad():
        want = layer(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# ViT3D end to end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("add_cls", [True, False])
def test_vit3d_forward_and_train_step(add_cls):
    cfg = vit3d_cfg(add_cls_token=add_cls)
    params, state = vit3d.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 2, 1, 32, 32, 16)).astype(np.float32) * 10
    labels = np.array([0, 1], dtype=np.int32)

    logits, loss, new_state = vit3d.apply(params, state, cfg, img, labels)
    assert logits.shape == (2, 2)
    assert np.isfinite(float(loss))

    # BN running stats update in train mode only
    logits_t, loss_t, st = vit3d.apply(params, state, cfg, img, labels,
                                       train=True, rng=jax.random.key(1))
    bn_before = np.asarray(state["encoder"]["bn1"]["mean"])
    bn_after = np.asarray(st["encoder"]["bn1"]["mean"])
    assert not np.allclose(bn_before, bn_after)
    bn_eval = np.asarray(new_state["encoder"]["bn1"]["mean"])
    np.testing.assert_array_equal(bn_before, bn_eval)


def test_vit3d_stem_channel_mismatch_raises():
    cfg = vit3d_cfg(pretrained_cnn=True, num_modalities=1, hidden_dim=32)
    with pytest.raises(ValueError, match="stem output channels"):
        vit3d.init(jax.random.key(0), cfg)


def test_vit3d_pretrained_multimodal_raises():
    cfg = vit3d_cfg(pretrained_cnn=True, num_modalities=2, hidden_dim=64)
    with pytest.raises(ValueError, match="num_modalities"):
        vit3d.init(jax.random.key(0), cfg)


def test_vit3d_densenet_stem():
    """Pretrained path: DenseNet truncated at the live path; hidden_dim must
    equal bn_size*growth = 64."""
    cfg = vit3d_cfg(pretrained_cnn=True, num_modalities=1, hidden_dim=64,
                    num_heads=4, img_size=(32, 32, 16))
    params, state = vit3d.init(jax.random.key(0), cfg)
    img = np.random.default_rng(1).normal(size=(1, 1, 1, 32, 32, 16)
                                          ).astype(np.float32)
    logits, new_state = vit3d.apply(params, state, cfg, img)
    assert logits.shape == (1, 2)
    assert np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------------------
# DenseNet truncation semantics
# ---------------------------------------------------------------------------

def test_densenet_full_forward_and_channels():
    params, state, meta = densenet.init(jax.random.key(0), growth_rate=16)
    assert meta["out_channels"] == 516  # 64 →160/80 →272/136 →520/260 →516 (g=16)
    x = np.random.default_rng(0).normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    out, _ = densenet.apply(params, state, jnp.asarray(x))
    assert out.shape == (1, 2)


def test_densenet_truncation_at_live_path():
    params, state, meta = densenet.init(jax.random.key(0), growth_rate=16)
    assert vit3d.DENSENET_TRUNCATION in meta["paths"]
    x = np.random.default_rng(0).normal(size=(1, 1, 32, 32, 32)).astype(np.float32)
    out, _ = densenet.apply(params, state, jnp.asarray(x),
                            upto=vit3d.DENSENET_TRUNCATION)
    # /16 spatial, bn_size*growth = 64 channels
    assert out.shape == (1, 64, 2, 2, 2)


def test_densenet_truncation_unknown_path_raises():
    params, state, _ = densenet.init(jax.random.key(0))
    x = jnp.zeros((1, 1, 16, 16, 16))
    with pytest.raises(KeyError):
        densenet.apply(params, state, x, upto="features.nope")


def test_densenet_earlier_truncations():
    params, state, meta = densenet.init(jax.random.key(0), growth_rate=16)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 1, 32, 32, 32))
                    .astype(np.float32))
    out, _ = densenet.apply(params, state, x, upto="features.pool0")
    assert out.shape == (1, 64, 8, 8, 8)
    out, _ = densenet.apply(params, state, x, upto="features.transition1.conv")
    assert out.shape[1] == (64 + 6 * 16) // 2  # 80


# ---------------------------------------------------------------------------
# CNN-stem ViT v1 (BCE head)
# ---------------------------------------------------------------------------

def test_cnn_vit_forward_and_bce():
    cfg = get_mgmt_config()
    modify_config(cfg, dict(img_size=(32, 32, 32), num_modalities=2,
                            patches_grid=(2, 2, 2), hidden_size=64,
                            transformer_num_layers=2, transformer_num_heads=4,
                            transformer_mlp_dim=128))
    params = cnn_vit.init(jax.random.key(0), cfg)
    img = np.random.default_rng(0).normal(size=(2, 2, 1, 32, 32, 32)
                                          ).astype(np.float32)
    labels = np.array([0.0, 1.0], dtype=np.float32)
    logits, loss = cnn_vit.apply(params, cfg, img, labels)
    assert logits.shape == (2,)  # single BCE logit per sample
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(logits)), torch.from_numpy(labels)).item()
    assert float(loss) == pytest.approx(want, rel=1e-5)


def test_cnn_vit_cls_only_from_stream0():
    """Sequence length: (1 CLS + N) + (M-1)·N."""
    cfg = get_mgmt_config()
    modify_config(cfg, dict(img_size=(32, 32, 32), num_modalities=3,
                            patches_grid=(2, 2, 2), hidden_size=32,
                            transformer_num_layers=1, transformer_num_heads=4,
                            transformer_mlp_dim=64))
    params = cnn_vit.init(jax.random.key(0), cfg)
    # n_patches per modality: (32/(4*2))^3 = 64
    assert params["pos_embed"].shape == (1, 65, 32)
    img = np.zeros((1, 3, 1, 32, 32, 32), np.float32)
    logits = cnn_vit.apply(params, cfg, img)
    assert logits.shape == (1,)


# ---------------------------------------------------------------------------
# surgery / shape tracer
# ---------------------------------------------------------------------------

def test_trace_shapes_no_compute():
    from cross_attention_vit_tpu.models import model_vit
    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=32, mlp_dim=64, num_heads=4,
                            num_layers=1, img_size=(16, 16, 8),
                            patch_size=(8, 8, 8), num_modalities=1,
                            dropout=0.0, label_smoothing=0.0, lr=1e-3,
                            weight_decay=0.0,
                            optim_params={"T_max": 1, "eta_min": 0}))
    params = model_vit.init(jax.random.key(0), cfg)
    img = jnp.zeros((2, 1, 1, 16, 16, 8))
    out_shapes, _ = surgery.trace_shapes(
        lambda p, x: model_vit.apply(p, cfg, x), params, img)
    assert out_shapes == ((2, 2), "float32")
    text = surgery.inspect_model(
        lambda p, x: model_vit.apply(p, cfg, x), params, img, quiet=True)
    assert "output" in text


def test_truncate_apply_helper():
    params, state, _ = densenet.init(jax.random.key(0))
    cut = surgery.truncate_apply(densenet.apply, "features.pool0")
    out, _ = cut(params, state, jnp.zeros((1, 1, 32, 32, 32)))
    assert out.shape == (1, 64, 8, 8, 8)


def test_param_summary():
    from cross_attention_vit_tpu.models import model_vit
    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=32, mlp_dim=64, num_heads=4,
                            num_layers=1, img_size=(16, 16, 8),
                            patch_size=(8, 8, 8), num_modalities=1,
                            dropout=0.0, label_smoothing=0.0, lr=1e-3,
                            weight_decay=0.0,
                            optim_params={"T_max": 1, "eta_min": 0}))
    params = model_vit.init(jax.random.key(0), cfg)
    text = surgery.param_summary(params)
    assert "TOTAL" in text
    assert surgery.param_count(params) > 0
