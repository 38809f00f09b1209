"""torch ⇄ JAX weight conversion: roundtrip identity + forward equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                             get_mgmt_cross_config,
                                             modify_config)
from cross_attention_vit_tpu.models import convert, model_cross, model_vit


def cross_cfg():
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(hidden_dim=32, mlp_dim=64, num_heads=4,
                            num_multi_blocks=2, num_self_blocks=2,
                            img_size=(16, 16, 8), patch_size=(8, 8, 8),
                            num_modalities=2, attn_order={"0": "1", "1": "0"},
                            dropout=0.0, lr=1e-3, weight_decay=0.0,
                            label_smoothing=0.0,
                            optim_params={"T_max": 1, "eta_min": 0}))
    return cfg


def vit_cfg():
    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=32, mlp_dim=64, num_heads=4,
                            num_layers=2, img_size=(16, 16, 8),
                            patch_size=(8, 8, 8), num_modalities=2,
                            dropout=0.0, lr=1e-3, weight_decay=0.0,
                            label_smoothing=0.0,
                            optim_params={"T_max": 1, "eta_min": 0}))
    return cfg


@pytest.mark.parametrize("model,cfg_fn,imp,exp", [
    (model_cross, cross_cfg, convert.import_model_cross,
     convert.export_model_cross),
    (model_vit, vit_cfg, convert.import_model_vit, convert.export_model_vit),
])
def test_roundtrip_and_forward_equivalence(model, cfg_fn, imp, exp):
    cfg = cfg_fn()
    params = model.init(jax.random.key(3), cfg)

    sd = exp(jax.tree.map(np.asarray, params), cfg)
    # state-dict keys look like reference torch module paths
    assert "pos_embedding" in sd and "patch_to_embedding.weight" in sd
    assert all(w.flags["C_CONTIGUOUS"] or w.ndim <= 1 for w in sd.values())

    back = imp(sd, cfg)
    for (pa, a), b in zip(jax.tree_util.tree_flatten_with_path(params)[0],
                          jax.tree.leaves(back)):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b),
            err_msg="/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                             for k in pa))

    # imported weights drive an identical forward
    img = (np.random.default_rng(0).normal(size=(2, 2, 1, 16, 16, 8)) * 50
           ).astype(np.float32)
    out_a = np.asarray(model.apply(params, cfg, img))
    out_b = np.asarray(model.apply(back, cfg, img))
    np.testing.assert_array_equal(out_a, out_b)


def test_imported_torch_weights_match_oracle():
    """Build a synthetic torch-style state dict (reference key names, torch
    (out,in) weight layout), import it, and check the JAX forward against the
    float64 oracle running on the SAME imported params."""
    import torch_oracle

    cfg = cross_cfg()
    params = model_cross.init(jax.random.key(9), cfg)
    sd = convert.export_model_cross(jax.tree.map(np.asarray, params), cfg)
    # perturb a couple of entries so we know the import actually reads sd
    sd["cls_token"] = sd["cls_token"] + 1.0
    sd["mlp_head.0.3.bias"] = sd["mlp_head.0.3.bias"] + 0.5

    imported = convert.import_model_cross(sd, cfg)
    img = (np.random.default_rng(1).normal(size=(2, 2, 1, 16, 16, 8)) * 50
           ).astype(np.float32)
    got = np.asarray(model_cross.apply(imported, cfg, img))
    want = torch_oracle.cross_forward(jax.tree.map(np.asarray, imported),
                                      cfg, img)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # and it differs from the unperturbed params (import isn't a no-op)
    base = np.asarray(model_cross.apply(params, cfg, img))
    assert not np.allclose(got, base)
