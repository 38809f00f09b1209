"""Distributed tests on 8 virtual CPU devices: DP/TP sharding of the full
train step, numerical equivalence with the single-device path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cross_attention_vit_tpu.configs import get_mgmt_cross_config, modify_config
from cross_attention_vit_tpu.models import model_cross
from cross_attention_vit_tpu.parallel import (batch_sharding, make_mesh,
                                              param_specs, shard_batch,
                                              shard_params)
from cross_attention_vit_tpu.train import optim
from cross_attention_vit_tpu.train.trainer import make_eval_step, make_train_step


def tiny_cfg(**over):
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_multi_blocks=1,
        num_self_blocks=1, img_size=(16, 16, 8), patch_size=(8, 8, 8),
        num_modalities=2, attn_order={"0": "1", "1": "0"},
        dropout=0.0, lr=1e-3, weight_decay=1e-4, label_smoothing=0.0,
        optim_params={"T_max": 10, "eta_min": 1e-6}))
    modify_config(cfg, over)
    return cfg


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_param_specs_rules():
    cfg = tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    specs = param_specs(params)
    blk = specs["multi_blocks"][0]
    assert blk["self_blocks"][0][0]["attn"]["qkv"]["kernel"] == P(None, None, "model", None)
    assert blk["self_blocks"][0][0]["attn"]["out"]["kernel"] == P("model", None, None)
    assert blk["cross_blocks"][0]["attn"]["wq"]["kernel"] == P(None, "model", None)
    assert blk["cross_blocks"][0]["attn"]["proj"]["kernel"] == P("model", None, None)
    assert blk["self_blocks"][0][0]["ffn"]["fc1"]["kernel"] == P(None, "model")
    assert blk["self_blocks"][0][0]["ffn"]["fc2"]["kernel"] == P("model", None)
    assert specs["pos_embedding"] == P()
    # head fc2 row-split shards the mlp input dim; the 2-wide output stays whole
    assert specs["mlp_head"][0]["fc2"]["kernel"] == P("model", None)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_train_step_matches_single_device(mesh_shape):
    """DP×TP step == single-device step (same batch, same params)."""
    cfg = tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    rng = np.random.default_rng(0)
    img = (rng.normal(size=(8, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(8,)).astype(np.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.key(9)

    # single device reference
    step = make_train_step(model_cross.apply, cfg, donate=False)
    p_ref, _, aux_ref = step(params, opt_state, img, labels, lr, step_rng)

    mesh = make_mesh(*mesh_shape)
    sp = shard_params(params, mesh)
    so = optim.AdamState(step=jax.device_put(opt_state.step),
                         mu=shard_params(opt_state.mu, mesh),
                         nu=shard_params(opt_state.nu, mesh))
    imgs_s, labels_s = shard_batch((img, labels), mesh)

    p_new, o_new, aux = step(sp, so, imgs_s, labels_s, lr, step_rng)

    assert float(aux["loss"]) == pytest.approx(float(aux_ref["loss"]), rel=1e-5)
    # Note: cross-attention wk biases are excluded — their gradient is
    # *mathematically zero* (a per-head key bias adds the same constant to
    # every key's logit for a given query; softmax is shift-invariant), so
    # both runs see only reduction-order rounding noise, which Adam then
    # normalizes into O(lr) drift.  The torch reference has the same dead
    # parameter direction.
    ref_flat = jax.tree_util.tree_flatten_with_path(p_ref)[0]
    new_flat = jax.tree.leaves(p_new)
    for (path, b), a in zip(ref_flat, new_flat):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if keys[-2:] == ["wk", "bias"]:
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg="/".join(keys))
    # params must stay sharded (not gathered to one device)
    qkv = p_new["multi_blocks"][0]["self_blocks"][0][0]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) == 8


def test_sharded_eval_and_batch_sharding():
    cfg = tiny_cfg()
    mesh = make_mesh(4, 2)
    params = shard_params(model_cross.init(jax.random.key(1), cfg), mesh)
    rng = np.random.default_rng(1)
    img = (rng.normal(size=(8, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(8,)).astype(np.int32)
    img_s = jax.device_put(img, batch_sharding(mesh, img.ndim))
    lab_s = jax.device_put(labels, batch_sharding(mesh, 1))

    ev = make_eval_step(model_cross.apply, cfg)
    aux = ev(params, img_s, lab_s)
    assert np.isfinite(float(aux["loss"]))
    assert aux["logits"].shape == (8, 2)

    # unsharded reference equivalence
    params_host = jax.device_get(params)
    aux_ref = ev(jax.device_put(params_host, jax.devices()[0]),
                 img, labels)
    np.testing.assert_allclose(np.asarray(aux["logits"]),
                               np.asarray(aux_ref["logits"]), atol=1e-5)


def test_fsdp_specs_shard_large_params_over_data():
    """FSDP rules: big params gain a 'data' shard on a free axis; small ones
    (biases, LN scales) stay as their TP spec; TP 'model' shards survive."""
    from cross_attention_vit_tpu.parallel.sharding import FSDP_MIN_SIZE

    cfg = tiny_cfg(hidden_dim=64, mlp_dim=2048)  # fc1 is 64x2048 = 131072 elts
    params = model_cross.init(jax.random.key(0), cfg)
    specs = param_specs(params, fsdp=True, data_size=4)
    blk = specs["multi_blocks"][0]
    # fc1 kernel (H=64, mlp=2048): TP splits mlp; FSDP adds 'data' on H
    assert blk["self_blocks"][0][0]["ffn"]["fc1"]["kernel"] == P("data", "model")
    # fc2 kernel (mlp=2048, H=64): TP row-split on mlp; 64 free → 'data'
    assert blk["self_blocks"][0][0]["ffn"]["fc2"]["kernel"] == P("model", "data")
    # small params stay replicated
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    spec_flat = jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))
    for (path, leaf), spec in zip(flat, spec_flat):
        if leaf.size < FSDP_MIN_SIZE:
            assert "data" not in spec, (path, spec)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
def test_fsdp_train_step_matches_single_device(mesh_shape):
    """FSDP-sharded step (params+moments distributed over 'data') == the
    single-device step; params stay FSDP-sharded through the update."""
    cfg = tiny_cfg(hidden_dim=64, mlp_dim=128)
    params = model_cross.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    rng = np.random.default_rng(0)
    img = (rng.normal(size=(8, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(8,)).astype(np.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.key(9)

    step = make_train_step(model_cross.apply, cfg, donate=False)
    p_ref, _, aux_ref = step(params, opt_state, img, labels, lr, step_rng)

    mesh = make_mesh(*mesh_shape)
    sp = shard_params(params, mesh, fsdp=True)
    so = optim.AdamState(step=jax.device_put(opt_state.step),
                         mu=shard_params(opt_state.mu, mesh, fsdp=True),
                         nu=shard_params(opt_state.nu, mesh, fsdp=True))
    imgs_s, labels_s = shard_batch((img, labels), mesh)
    p_new, o_new, aux = step(sp, so, imgs_s, labels_s, lr, step_rng)

    assert float(aux["loss"]) == pytest.approx(float(aux_ref["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(aux["probs"]),
                               np.asarray(aux_ref["probs"]), atol=1e-5)
    # Post-Adam params: the first-step update is ~lr*sign(g) (zero-init
    # moments), so reduction-order noise on near-zero grads flips entries by
    # up to 2*lr — bound by that, which still catches placement/gather bugs
    # (those produce O(param)=O(0.1) errors).  Tight numerics are asserted by
    # the DP test above and the FSDP gradient test below.
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2.5e-3), p_new, p_ref)
    # the embedding kernel (2048x64 > FSDP_MIN_SIZE, TP-replicated) must be
    # genuinely distributed: each device holds 1/8 of it, and the Adam
    # moments inherit the same placement (ZeRO optimizer-state sharding)
    emb = p_new["patch_to_embedding"]["kernel"]
    assert "data" in emb.sharding.spec
    n_data = mesh.shape["data"]
    assert emb.addressable_shards[0].data.shape[0] == emb.shape[0] // n_data
    assert "data" in o_new.mu["patch_to_embedding"]["kernel"].sharding.spec


def test_grad_accum_matches_one_shot():
    """grad_accum=k (scan-accumulated microbatches) == the one-shot step
    (dropout 0, aug off: the paths draw different dropout keys by design)."""
    cfg = tiny_cfg()
    params = model_cross.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    img = (rng.normal(size=(8, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(8,)).astype(np.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.key(7)

    # tight check on the math contract: mean-of-microbatch-grads == one-shot
    # full-batch grad (dropout 0 → rng-independent)
    def loss_fn(p, im, lb):
        _, loss = model_cross.apply(p, cfg, im, lb, train=True,
                                    rng=jax.random.key(0))
        return loss
    g1 = jax.grad(loss_fn)(params, img, labels)
    for k in (2, 4):
        gs = [jax.grad(loss_fn)(params, img[i * (8 // k):(i + 1) * (8 // k)],
                                labels[i * (8 // k):(i + 1) * (8 // k)])
              for i in range(k)]
        gk = jax.tree.map(lambda *g: sum(np.asarray(x) for x in g) / k, *gs)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a, np.asarray(b), atol=1e-6, rtol=1e-4), gk, g1)

    # step-level wiring: loss/probs identical; post-Adam params within the
    # lr*sign(g) noise bound (see test_fsdp_train_step comment)
    one = make_train_step(model_cross.apply, cfg, donate=False)
    p1, o1, aux1 = one(params, optim.init(params), img, labels, lr, step_rng)
    for k, impl in ((2, "scan"), (4, "scan"), (2, "unroll")):
        acc = make_train_step(model_cross.apply, cfg, donate=False,
                              grad_accum=k, accum_impl=impl)
        pk, ok, auxk = acc(params, optim.init(params), img, labels, lr, step_rng)
        assert float(auxk["loss"]) == pytest.approx(float(aux1["loss"]), rel=1e-6)
        np.testing.assert_allclose(np.asarray(auxk["probs"]),
                                   np.asarray(aux1["probs"]), atol=1e-5)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5e-3), pk, p1)

    # scan and unroll draw IDENTICAL per-microbatch dropout keys (fold_in by
    # index), so with dropout they are the same step; with dropout 0 their
    # grads differ only by summation order
    scan2 = make_train_step(model_cross.apply, cfg, donate=False, grad_accum=2)
    unroll2 = make_train_step(model_cross.apply, cfg, donate=False,
                              grad_accum=2, accum_impl="unroll")
    ps, _, auxs = scan2(params, optim.init(params), img, labels, lr, step_rng)
    pu, _, auxu = unroll2(params, optim.init(params), img, labels, lr, step_rng)
    np.testing.assert_allclose(np.asarray(auxs["probs"]),
                               np.asarray(auxu["probs"]), atol=1e-6)

    with pytest.raises(ValueError):
        acc = make_train_step(model_cross.apply, cfg, donate=False, grad_accum=3)
        acc(params, optim.init(params), img, labels, lr, step_rng)  # 8 % 3


def test_grad_accum_under_mesh():
    """grad_accum composes with DP+TP+FSDP sharding."""
    cfg = tiny_cfg(hidden_dim=64, mlp_dim=128)
    params = model_cross.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(4)
    img = (rng.normal(size=(8, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(8,)).astype(np.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.key(7)

    ref = make_train_step(model_cross.apply, cfg, donate=False, grad_accum=2)
    p_ref, _, aux_ref = ref(params, optim.init(params), img, labels, lr, step_rng)

    mesh = make_mesh(4, 2)
    sp = shard_params(params, mesh, fsdp=True)
    base = optim.init(params)
    so = optim.AdamState(step=jax.device_put(base.step),
                         mu=shard_params(base.mu, mesh, fsdp=True),
                         nu=shard_params(base.nu, mesh, fsdp=True))
    imgs_s, labels_s = shard_batch((img, labels), mesh)
    p_new, _, aux = ref(sp, so, imgs_s, labels_s, lr, step_rng)
    assert float(aux["loss"]) == pytest.approx(float(aux_ref["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(aux["probs"]),
                               np.asarray(aux_ref["probs"]), atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2.5e-3), p_new, p_ref)


def test_mesh_validation():
    m = make_mesh(3, 2)  # sub-mesh of 6 of the 8 devices is allowed
    assert m.devices.shape == (3, 2)
    with pytest.raises(ValueError):
        make_mesh(8, 2)  # 16 > 8
    with pytest.raises(ValueError):
        make_mesh(-1, 3)  # 8 % 3


def test_trainer_with_mesh_end_to_end(tmp_path):
    """Trainer(mesh=...) shards params/opt/batches and trains to completion
    on the virtual 8-device mesh — the Lightning devices/num_nodes analogue."""
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.train.trainer import Trainer

    class FakeDataset:
        def __init__(self, imgs, labels):
            self.imgs, self.labels = imgs, labels

        def __len__(self):
            return len(self.labels)

        def batch(self, idx):
            i = np.asarray(idx)
            return self.imgs[i], self.labels[i]

    cfg = tiny_cfg()
    rng = np.random.default_rng(0)
    labels = np.array([0, 1] * 8, dtype=np.int32)
    imgs = (rng.normal(size=(16, 2, 1, 16, 16, 8)) +
            labels[:, None, None, None, None, None] * 2).astype(np.float32)
    ds = FakeDataset(imgs, labels)
    loader = PrefetchLoader(ds, batch_size=8, drop_last=True)

    mesh = make_mesh(4, 2)
    trainer = Trainer(model_cross, cfg, max_epochs=8, mesh=mesh, seed=0)
    history = trainer.fit(loader, loader, verbose=False)

    assert history[-1]["train_loss"] < history[0]["train_loss"]
    qkv = trainer.params["multi_blocks"][0]["self_blocks"][0][0]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) == 8  # stayed sharded through training
