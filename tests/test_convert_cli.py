"""Checkpoint-migration CLI (drivers/convert.py): torch/Lightning container
unwrapping, import → npz + config JSON consumable by evaluate/serve, and the
reverse export."""

import json

import numpy as np
import pytest

import jax
import torch

from cross_attention_vit_tpu.configs import get_mgmt_cross_config, modify_config
from cross_attention_vit_tpu.drivers import convert as cli
from cross_attention_vit_tpu.models import convert as C
from cross_attention_vit_tpu.models import model_cross


def _cfg():
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_multi_blocks=1,
        num_self_blocks=1, img_size=(16, 16, 8), patch_size=(8, 8, 8),
        num_modalities=2, attn_order={"0": "1", "1": "0"},
        dropout=0.0, lr=1e-3, weight_decay=0.0, label_smoothing=0.0,
        img_aug=False, optim_params={"T_max": 1, "eta_min": 0}))
    return cfg


def _lightning_ckpt(tmp_path, cfg):
    """A reference-trained Lightning checkpoint stand-in: reference-shaped
    state dict under 'state_dict', torch tensors, extra trainer baggage."""
    params = model_cross.init(jax.random.key(7), cfg)
    sd = C.export_model_cross(jax.tree.map(np.asarray, params), cfg)
    ckpt = {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()},
            "epoch": 41, "global_step": 9000, "lr_schedulers": [{}]}
    path = tmp_path / "epoch=41-val_loss=0.42.ckpt"
    torch.save(ckpt, path)
    return path, params


def test_import_lightning_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    ckpt, params = _lightning_ckpt(tmp_path, cfg)
    out = cli.import_torch_checkpoint(ckpt, "cross", cfg,
                                      tmp_path / "migrated.npz")
    cfg_json = tmp_path / "config_migrated.json"
    assert out.exists() and cfg_json.exists()
    assert json.loads(cfg_json.read_text())["hidden_dim"] == 32

    # migrated params drive a bit-identical forward
    from cross_attention_vit_tpu.train.checkpoint import restore_pytree

    like = jax.eval_shape(lambda: model_cross.init(jax.random.key(0), cfg))
    back = restore_pytree(out, {"params": like})["params"]
    img = (np.random.default_rng(0).normal(size=(2, 2, 1, 16, 16, 8)) * 50
           ).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(model_cross.apply(params, cfg, img)),
        np.asarray(model_cross.apply(back, cfg, img)))


def test_unwrap_containers():
    t = torch.ones(2)
    flat = {"a": t}
    assert set(cli._unwrap_state_dict(flat)) == {"a"}
    assert set(cli._unwrap_state_dict({"state_dict": flat})) == {"a"}
    assert set(cli._unwrap_state_dict({"model_state_dict": flat})) == {"a"}
    prefixed = {"model.a": t, "model.b": t}
    assert set(cli._unwrap_state_dict({"state_dict": prefixed})) == {"a", "b"}
    with pytest.raises(ValueError):
        cli._unwrap_state_dict([1, 2])


def test_import_then_serve_and_evaluate_fallback(tmp_path):
    """The migrated npz (params-only) must be consumable by the server and
    by evaluate's params-only restore fallback."""
    cfg = _cfg()
    ckpt, params = _lightning_ckpt(tmp_path, cfg)
    out = cli.import_torch_checkpoint(ckpt, "cross", cfg,
                                      tmp_path / "migrated.npz")

    from cross_attention_vit_tpu.drivers.serve import InferenceServer

    srv = InferenceServer(out, "cross", img_types=("T1c", "T2"),
                          buckets=(2,), max_wait_ms=1.0)
    srv.start()
    try:
        vols = (np.random.default_rng(1).normal(size=(2, 2, 1, 16, 16, 8))
                * 50).astype(np.float32)
        got = srv.predict(vols)
        want = np.asarray(model_cross.apply(params, cfg, vols, train=False))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        srv.stop()


def test_export_roundtrip(tmp_path):
    cfg = _cfg()
    ckpt, params = _lightning_ckpt(tmp_path, cfg)
    npz = cli.import_torch_checkpoint(ckpt, "cross", cfg, tmp_path / "m.npz")
    pt = cli.export_torch_checkpoint(npz, "cross", cfg, tmp_path / "back.pt")
    sd_back = torch.load(pt, map_location="cpu", weights_only=False)
    sd_orig = torch.load(ckpt, map_location="cpu",
                         weights_only=False)["state_dict"]
    assert set(sd_back) == set(sd_orig)
    for k in sd_orig:
        np.testing.assert_array_equal(sd_back[k].numpy(), sd_orig[k].numpy(),
                                      err_msg=k)


def test_main_cli(tmp_path):
    cfg = _cfg()
    ckpt, _ = _lightning_ckpt(tmp_path, cfg)
    cli.main(["--model", "cross", "--torch-ckpt", str(ckpt),
              "--out", str(tmp_path / "viacli.npz"),
              "--img-types", "T1c", "T2", "--attn-order", "0:1,1:0",
              "--set", "hidden_dim=32", "--set", "mlp_dim=64",
              "--set", "num_heads=4", "--set", "num_multi_blocks=1",
              "--set", "num_self_blocks=1", "--set", "img_size=(16,16,8)",
              "--set", "patch_size=(8,8,8)"])
    assert (tmp_path / "viacli.npz").exists()
    assert (tmp_path / "config_viacli.json").exists()
