"""Pipeline parallelism (GPipe over the 'pipe' mesh axis) on 8 virtual CPU
devices: schedule correctness vs the serial trunk, gradient flow, composition
with DP, the stacked-param sharding rules, and the ModelVIT wiring.

The reference has no PP (SURVEY.md §2.3); these tests hold the framework's
addition to the same equivalence bar as the DP/TP/FSDP tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
from cross_attention_vit_tpu.models import model_vit
from cross_attention_vit_tpu.parallel import (make_mesh, param_specs,
                                              pipeline_layers,
                                              set_pipeline_mesh, shard_batch,
                                              shard_params, stack_layers,
                                              unstack_layers)
from cross_attention_vit_tpu.parallel.pipeline import bubble_fraction
from cross_attention_vit_tpu.train import optim
from cross_attention_vit_tpu.train.trainer import make_train_step


@pytest.fixture(autouse=True)
def _clear_pipeline_mesh():
    yield
    set_pipeline_mesh(None)


def vit_cfg(**over):
    cfg = get_mgmt_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_layers=4,
        img_size=(16, 16, 8), patch_size=(8, 8, 8), num_modalities=2,
        dropout=0.0, lr=1e-3, weight_decay=1e-4, label_smoothing=0.0,
        optim_params={"T_max": 10, "eta_min": 1e-6}))
    modify_config(cfg, over)
    return cfg


def toy_layers(depth=4, H=16, seed=0):
    rng = np.random.default_rng(seed)
    return [{"w": jnp.asarray(rng.normal(size=(H, H)) * 0.3, jnp.float32),
             "b": jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)}
            for _ in range(depth)]


def toy_fn(layer, x, key):
    del key
    return jnp.tanh(x @ layer["w"] + layer["b"]) + x


def test_stack_unstack_roundtrip():
    layers = toy_layers()
    stacked = stack_layers(layers)
    assert stacked["w"].shape == (4, 16, 16)
    back = unstack_layers(stacked, 4)
    for a, b in zip(layers, back):
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))


def test_serial_fallback_matches_plain_loop():
    """mesh=None path == the plain sequential layer loop (dropout-free fn)."""
    layers = toy_layers()
    stacked = stack_layers(layers)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 6, 16)),
                    jnp.float32)
    keys = jax.random.split(jax.random.key(0), 4)

    ref = x
    for l in layers:
        ref = toy_fn(l, ref, None)
    for mb in (1, 2, 4):
        got = pipeline_layers(stacked, toy_fn, x, keys,
                              num_microbatches=mb, mesh=None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [
    dict(pipe=4, data=2, model=1),   # PP×DP
    dict(pipe=2, data=2, model=2),   # PP×DP×TP mesh (TP inert for toy fn)
    dict(pipe=4, data=1, model=1),
])
def test_gpipe_schedule_matches_serial(mesh_shape):
    """shard_map GPipe schedule == serial fallback, forward AND gradients."""
    mesh = make_mesh(mesh_shape["data"], mesh_shape["model"],
                     pipe=mesh_shape["pipe"])
    layers = toy_layers(depth=4)
    stacked = stack_layers(layers)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(8, 6, 16)),
                    jnp.float32)
    keys = jax.random.split(jax.random.key(3), 4)

    ref = jax.jit(lambda s, x: pipeline_layers(
        s, toy_fn, x, keys, num_microbatches=4, mesh=None))(stacked, x)
    got = jax.jit(lambda s, x: pipeline_layers(
        s, toy_fn, x, keys, num_microbatches=4, mesh=mesh))(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    def loss(s, x, mesh):
        return jnp.sum(pipeline_layers(s, toy_fn, x, keys,
                                       num_microbatches=4, mesh=mesh) ** 2)

    g_ref = jax.jit(jax.grad(lambda s, x: loss(s, x, None)))(stacked, x)
    g_pp = jax.jit(jax.grad(lambda s, x: loss(s, x, mesh)))(stacked, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), g_pp, g_ref)


def test_pipeline_validation_and_bubble():
    layers = stack_layers(toy_layers(depth=3))
    x = jnp.zeros((8, 4, 16))
    keys = jax.random.split(jax.random.key(0), 3)
    mesh = make_mesh(2, 1, pipe=2)
    with pytest.raises(ValueError):  # depth 3 % 2 stages
        pipeline_layers(layers, toy_fn, x, keys, num_microbatches=2, mesh=mesh)
    with pytest.raises(ValueError):  # batch 8 % 3 microbatches
        pipeline_layers(layers, toy_fn, x, keys, num_microbatches=3, mesh=None)
    assert bubble_fraction(4, 4) == pytest.approx(3 / 7)
    assert bubble_fraction(1, 8) == 0.0


def test_pipeline_param_specs_and_placement():
    """Stacked-trunk specs get the 'pipe' prefix + shifted TP spec; placement
    puts each stage's layer block on its own pipe rank."""
    cfg = vit_cfg(pipeline_stages=2)
    params = model_vit.init(jax.random.key(0), cfg)
    assert params["layers"]["attn"]["qkv"]["kernel"].ndim == 5  # stacked

    specs = param_specs(params, pipeline=True)
    assert specs["layers"]["attn"]["qkv"]["kernel"] == P("pipe", None, None, "model", None)
    assert specs["layers"]["ffn"]["fc1"]["kernel"] == P("pipe", None, "model")
    assert specs["layers"]["attn_norm"]["scale"] == P("pipe")
    assert specs["head"]["fc1"]["kernel"] == P(None, "model")  # untouched

    mesh = make_mesh(2, 2, pipe=2)
    sp = shard_params(params, mesh, pipeline=True)
    qkv = sp["layers"]["attn"]["qkv"]["kernel"]
    # depth 4 over 2 stages → 2 layers per pipe rank
    assert qkv.addressable_shards[0].data.shape[0] == 2


@pytest.mark.parametrize("train", [False, True])
def test_model_vit_pipeline_matches_sequential(train):
    """ModelVIT with pipeline_stages=2 on a ('pipe','data') mesh == the plain
    sequential ModelVIT at the same weights (dropout 0 so the paths' differing
    key derivation is inert)."""
    cfg_seq = vit_cfg()
    cfg_pp = vit_cfg(pipeline_stages=2, pipeline_microbatches=4)
    params_seq = model_vit.init(jax.random.key(0), cfg_seq)
    params_pp = dict(params_seq)
    params_pp["layers"] = stack_layers(params_seq["layers"])

    rng = np.random.default_rng(0)
    # strided microbatch layout: every data shard (4) holds MB (4) rows
    img = (rng.normal(size=(16, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(16,)).astype(np.int32)

    ref_logits, ref_loss = model_vit.apply(
        params_seq, cfg_seq, img, labels, train=train, rng=jax.random.key(5))

    # serial fallback (no mesh)
    got_logits, got_loss = model_vit.apply(
        params_pp, cfg_pp, img, labels, train=train, rng=jax.random.key(5))
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=1e-5)

    # SPMD schedule on the mesh
    mesh = make_mesh(4, 1, pipe=2)
    set_pipeline_mesh(mesh)
    sp = shard_params(params_pp, mesh, pipeline=True)
    img_s, labels_s = shard_batch((img, labels), mesh)
    pp_logits, pp_loss = jax.jit(
        lambda p, im, lb: model_vit.apply(p, cfg_pp, im, lb, train=train,
                                          rng=jax.random.key(5)))(sp, img_s, labels_s)
    np.testing.assert_allclose(np.asarray(pp_logits), np.asarray(ref_logits),
                               atol=1e-5)
    assert float(pp_loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_pipeline_dropout_mesh_matches_fallback():
    """With dropout ON, the SPMD schedule and the serial fallback draw the
    SAME per-(layer, microbatch) masks — bit-comparable logits."""
    cfg = vit_cfg(pipeline_stages=2, pipeline_microbatches=2, dropout=0.2)
    params = model_vit.init(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    img = (rng.normal(size=(4, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(4,)).astype(np.int32)

    ref_logits, _ = model_vit.apply(params, cfg, img, labels, train=True,
                                    rng=jax.random.key(7))

    mesh = make_mesh(2, 1, pipe=2)
    set_pipeline_mesh(mesh)
    sp = shard_params(params, mesh, pipeline=True)
    img_s, labels_s = shard_batch((img, labels), mesh)
    got_logits, _ = jax.jit(
        lambda p, im, lb: model_vit.apply(p, cfg, im, lb, train=True,
                                          rng=jax.random.key(7)))(sp, img_s, labels_s)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               atol=1e-5)


def test_pipeline_train_step_end_to_end():
    """Full jitted train step (Adam included) over PP×DP, vs the sequential
    single-device step at the same weights: loss/probs match, and the stacked
    post-step params equal the stacked sequential post-step params."""
    cfg_seq = vit_cfg()
    cfg_pp = vit_cfg(pipeline_stages=2, pipeline_microbatches=4)
    params_seq = model_vit.init(jax.random.key(0), cfg_seq)
    params_pp = dict(params_seq)
    params_pp["layers"] = stack_layers(params_seq["layers"])

    rng = np.random.default_rng(3)
    # strided microbatch layout: every data shard (4) holds MB (4) rows
    img = (rng.normal(size=(16, 2, 1, 16, 16, 8)) * 100).astype(np.float32)
    labels = rng.integers(0, 2, size=(16,)).astype(np.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    step_rng = jax.random.key(11)

    ref_step = make_train_step(model_vit.apply, cfg_seq, donate=False)
    p_ref, _, aux_ref = ref_step(params_seq, optim.init(params_seq),
                                 img, labels, lr, step_rng)

    mesh = make_mesh(4, 1, pipe=2)
    set_pipeline_mesh(mesh)
    sp = shard_params(params_pp, mesh, pipeline=True)
    base = optim.init(params_pp)
    so = optim.AdamState(step=jax.device_put(base.step),
                         mu=shard_params(base.mu, mesh, pipeline=True),
                         nu=shard_params(base.nu, mesh, pipeline=True))
    img_s, labels_s = shard_batch((img, labels), mesh)

    pp_step = make_train_step(model_vit.apply, cfg_pp, donate=False)
    p_new, o_new, aux = pp_step(sp, so, img_s, labels_s, lr, step_rng)

    assert float(aux["loss"]) == pytest.approx(float(aux_ref["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(aux["probs"]),
                               np.asarray(aux_ref["probs"]), atol=1e-5)
    ref_stacked = stack_layers(p_ref["layers"])
    # post-Adam bound: see test_fsdp_train_step comment in test_parallel.py
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2.5e-3),
        p_new["layers"], ref_stacked)
    np.testing.assert_allclose(np.asarray(p_new["head"]["fc1"]["kernel"]),
                               np.asarray(p_ref["head"]["fc1"]["kernel"]),
                               atol=2.5e-3)
    # trunk params stayed pipe-sharded through the update
    qkv = p_new["layers"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape[0] == 2


def test_trainer_with_pipeline_mesh(tmp_path):
    """Trainer(mesh with 'pipe') + config.pipeline_stages trains ModelVIT to
    completion: stacked-trunk sharding, GPipe schedule, Adam, epoch loop."""
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

    cfg = vit_cfg(pipeline_stages=2, pipeline_microbatches=2, dropout=0.1)
    rng = np.random.default_rng(0)
    labels = np.array([0, 1] * 8, dtype=np.int32)
    imgs = (rng.normal(size=(16, 2, 1, 16, 16, 8)) +
            labels[:, None, None, None, None, None] * 2).astype(np.float32)
    loader = PrefetchLoader(FakeDataset(imgs, labels), batch_size=8,
                            drop_last=True)

    mesh = make_mesh(2, 1, pipe=2)
    trainer = Trainer(model_vit, cfg, max_epochs=6, mesh=mesh, seed=0)
    history = trainer.fit(loader, loader, verbose=False)

    assert history[-1]["train_loss"] < history[0]["train_loss"]
    qkv = trainer.params["layers"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape[0] == 2  # stayed pipe-sharded
