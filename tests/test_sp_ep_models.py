"""Sequence parallelism (ring attention) and expert parallelism (MoE) as
FRAMEWORK features — wired through config/model/Trainer, not just the op
library (parallel/ring.py, parallel/moe.py).

Contracts tested on the 8-virtual-device CPU mesh:
  * `config.seq_parallel = P` routes ModelVIT/ModelCross attention through
    the masked padded ring (the live ViT sequences are ragged: 512·M+1) and
    reproduces the dense model's logits/loss/gradients;
  * with no ambient seq mesh the fallback is the dense _sdpa, bit-identical;
  * `config.moe_experts = E` swaps ModelVIT trunk FFNs for the GShard MoE;
    the EP-sharded program (params through the generic shard_params rule,
    dispatch pinned to the mesh) matches the serial one, the balance loss
    enters the TRAIN objective only, and PP+MoE is rejected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                             get_mgmt_cross_config,
                                             modify_config)
from cross_attention_vit_tpu.models import model_cross, model_vit
from cross_attention_vit_tpu.ops.attention import _sdpa
from cross_attention_vit_tpu.parallel import (make_mesh, set_expert_mesh,
                                              set_seq_mesh, shard_batch,
                                              shard_params, sharded_ring_sdpa)


@pytest.fixture(autouse=True)
def _clear_ambient_meshes():
    yield
    set_seq_mesh(None)
    set_expert_mesh(None)


def small_vit_config(**extra):
    cfg = get_mgmt_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_layers=2,
        img_size=(16, 16, 8), patch_size=(8, 8, 8), num_modalities=2,
        dropout=0.1, lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
        optim_params={"T_max": 10, "eta_min": 1e-6}))
    modify_config(cfg, extra)
    return cfg


def small_cross_config(**extra):
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(
        hidden_dim=32, mlp_dim=64, num_heads=4, num_modalities=2,
        attn_order={"0": "1", "1": "0"},
        dropout=0.1, lr=1e-4, weight_decay=5e-4, label_smoothing=0.1,
        img_size=(16, 16, 8), patch_size=(8, 8, 8),
        optim_params={"T_max": 10, "eta_min": 1e-6}))
    modify_config(cfg, extra)
    return cfg


def make_batch(cfg, batch=4, seed=0):
    rng = np.random.default_rng(seed)
    img = (rng.normal(size=(batch, cfg.num_modalities, 1, *cfg.img_size))
           * 300).astype(np.float32)
    labels = rng.integers(0, cfg.num_classes, size=(batch,)).astype(np.int32)
    return img, labels


# ---------------------------------------------------------------------------
# sharded_ring_sdpa — the in-jit padded/masked drop-in
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [9, 13, 16])  # ragged and exact multiples
def test_sharded_ring_sdpa_matches_dense(n):
    """Ragged N is zero-padded up to the axis size and the pad keys masked
    exactly; forward and gradients equal the dense softmax attention."""
    mesh = make_mesh(2, seq=4)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(a, jnp.float32)
               for a in rng.normal(size=(3, 2, 2, n, 8)))
    scale = q.shape[-1] ** -0.5

    def loss_ring(q, k, v):
        return jnp.sum(jnp.tanh(sharded_ring_sdpa(q, k, v, scale, mesh=mesh)))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.tanh(_sdpa(q, k, v, scale)))

    out = jax.jit(lambda q, k, v: sharded_ring_sdpa(q, k, v, scale,
                                                    mesh=mesh))(q, k, v)
    ref = _sdpa(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    g = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_ring_sdpa_no_mesh_is_dense():
    """No ambient mesh → literally the dense _sdpa (bit-identical)."""
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(a, jnp.float32)
               for a in rng.normal(size=(3, 2, 2, 11, 8)))
    out = sharded_ring_sdpa(q, k, v, 0.5, mesh=None)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(_sdpa(q, k, v, 0.5)))


# ---------------------------------------------------------------------------
# seq_parallel through the models
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("module,make_cfg", [(model_vit, small_vit_config),
                                             (model_cross, small_cross_config)])
def test_model_seq_parallel_matches_dense(module, make_cfg):
    """config.seq_parallel=2 over ('data','seq') reproduces the dense model:
    eval logits/loss, and one train-mode call (same dropout masks — the mask
    draw is impl-independent)."""
    cfg = make_cfg()
    params = module.init(jax.random.key(0), cfg)
    img, labels = make_batch(cfg)

    ref_logits, ref_loss = jax.jit(
        lambda p, x, y: module.apply(p, cfg, x, y, train=False))(
        params, img, labels)
    tref, _ = jax.jit(
        lambda p, x, y, k: module.apply(p, cfg, x, y, train=True, rng=k))(
        params, img, labels, jax.random.key(7))

    sp_cfg = make_cfg(seq_parallel=2)
    mesh = make_mesh(4, seq=2)
    set_seq_mesh(mesh)
    try:
        sp = shard_params(params, mesh)
        simg, slabels = shard_batch((img, labels), mesh)
        logits, loss = jax.jit(
            lambda p, x, y: module.apply(p, sp_cfg, x, y, train=False))(
            sp, simg, slabels)
        ttest, _ = jax.jit(
            lambda p, x, y, k: module.apply(p, sp_cfg, x, y, train=True, rng=k))(
            sp, simg, slabels, jax.random.key(7))
    finally:
        set_seq_mesh(None)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-5)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)
    np.testing.assert_allclose(np.asarray(ttest), np.asarray(tref),
                               rtol=1e-4, atol=1e-5)


def test_model_vit_seq_parallel_train_step_matches():
    """One full jitted train step (value_and_grad + Adam) under SP equals the
    dense step: loss and updated parameters."""
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step

    cfg = small_vit_config()
    params = model_vit.init(jax.random.key(0), cfg)
    img, labels = make_batch(cfg)
    lr = jnp.asarray(1e-4, jnp.float32)

    step = make_train_step(model_vit.apply, cfg)
    p_ref, _, aux_ref = step(jax.tree.map(jnp.copy, params),
                             optim.init(params), img, labels, lr,
                             jax.random.key(3))

    sp_cfg = small_vit_config(seq_parallel=2)
    mesh = make_mesh(4, seq=2)
    set_seq_mesh(mesh)
    try:
        sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
        simg, slabels = shard_batch((img, labels), mesh)
        step_sp = make_train_step(model_vit.apply, sp_cfg, mesh=mesh)
        p_sp, _, aux_sp = step_sp(sp, optim.init(sp), simg, slabels, lr,
                                  jax.random.key(3))
    finally:
        set_seq_mesh(None)

    assert float(aux_sp["loss"]) == pytest.approx(float(aux_ref["loss"]),
                                                  rel=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6), p_sp, p_ref)


def test_seq_parallel_config_without_mesh_is_dense():
    """seq_parallel set but no ambient mesh (single-device run): the model
    falls back to the dense path bit-identically."""
    cfg = small_vit_config()
    params = model_vit.init(jax.random.key(0), cfg)
    img, labels = make_batch(cfg)
    ref, _ = model_vit.apply(params, cfg, img, labels, train=False)
    got, _ = model_vit.apply(params, small_vit_config(seq_parallel=2), img,
                             labels, train=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


# ---------------------------------------------------------------------------
# moe_experts through ModelVIT
# ---------------------------------------------------------------------------

def test_model_vit_moe_init_structure():
    cfg = small_vit_config(moe_experts=4)
    params = model_vit.init(jax.random.key(0), cfg)
    for layer in params["layers"]:
        assert "experts" in layer["ffn"] and "router" in layer["ffn"]
        assert layer["ffn"]["experts"]["fc1"]["kernel"].shape == (4, 32, 64)

    every2 = small_vit_config(moe_experts=4, moe_every=2)
    p2 = model_vit.init(jax.random.key(0), every2)
    assert "experts" not in p2["layers"][0]["ffn"]
    assert "experts" in p2["layers"][1]["ffn"]


def test_model_vit_moe_eval_loss_is_pure_ce():
    """The balance term enters the TRAIN objective only: with dropout off,
    train and eval logits coincide and the train loss exceeds eval CE by
    exactly the weighted balance term (> 0)."""
    cfg = small_vit_config(moe_experts=4, dropout=0.0)
    params = model_vit.init(jax.random.key(1), cfg)
    img, labels = make_batch(cfg)

    logits_e, loss_e = model_vit.apply(params, cfg, img, labels, train=False)
    logits_t, loss_t = model_vit.apply(params, cfg, img, labels, train=True,
                                       rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(logits_e),
                               rtol=1e-6, atol=1e-6)
    from cross_attention_vit_tpu.ops.losses import cross_entropy

    assert float(loss_e) == pytest.approx(
        float(cross_entropy(logits_e, labels)), rel=1e-6)
    gap = float(loss_t) - float(loss_e)
    assert 0.0 < gap < 0.01 * cfg.moe_experts  # weight 0.01 × mean balance


def test_model_vit_moe_ep_sharded_matches_serial():
    """EP-sharded forward+loss (params through the GENERIC shard_params —
    the experts/* rule — and dispatch pinned to the ambient expert mesh)
    reproduces the serial MoE program."""
    cfg = small_vit_config(moe_experts=4)
    params = model_vit.init(jax.random.key(2), cfg)
    img, labels = make_batch(cfg, seed=2)

    ref_logits, ref_loss = jax.jit(
        lambda p, x, y: model_vit.apply(p, cfg, x, y, train=False))(
        params, img, labels)

    mesh = make_mesh(2, expert=4)
    set_expert_mesh(mesh)
    try:
        sp = shard_params(params, mesh)
        fc1 = sp["layers"][0]["ffn"]["experts"]["fc1"]["kernel"]
        assert "expert" in str(fc1.sharding.spec)
        simg, slabels = shard_batch((img, labels), mesh)
        logits, loss = jax.jit(
            lambda p, x, y: model_vit.apply(p, cfg, x, y, train=False))(
            sp, simg, slabels)
    finally:
        set_expert_mesh(None)

    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-5, atol=1e-6)
    assert float(loss) == pytest.approx(float(ref_loss), rel=1e-5)


def test_model_vit_moe_ep_train_step_matches_serial():
    """One jitted train step of the MoE ModelVIT over ('data','expert'):
    loss and updated params equal the serial (mesh-less) step."""
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step

    cfg = small_vit_config(moe_experts=4)
    params = model_vit.init(jax.random.key(4), cfg)
    img, labels = make_batch(cfg, seed=4)
    lr = jnp.asarray(1e-4, jnp.float32)

    step = make_train_step(model_vit.apply, cfg)
    p_ref, _, aux_ref = step(jax.tree.map(jnp.copy, params),
                             optim.init(params), img, labels, lr,
                             jax.random.key(5))

    mesh = make_mesh(2, expert=4)
    set_expert_mesh(mesh)
    try:
        sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
        simg, slabels = shard_batch((img, labels), mesh)
        step_ep = make_train_step(model_vit.apply, cfg, mesh=mesh)
        p_ep, _, aux_ep = step_ep(sp, optim.init(sp), simg, slabels, lr,
                                  jax.random.key(5))
    finally:
        set_expert_mesh(None)

    assert float(aux_ep["loss"]) == pytest.approx(float(aux_ref["loss"]),
                                                  rel=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6), p_ep, p_ref)


def test_moe_rejects_pipeline():
    cfg = small_vit_config(moe_experts=4, pipeline_stages=2)
    with pytest.raises(ValueError, match="pipeline_stages"):
        model_vit.init(jax.random.key(0), cfg)


def test_trainer_sets_ambient_meshes():
    """Trainer(mesh=...) publishes the seq/expert meshes the models read,
    and validates the config↔mesh axis agreement."""
    from cross_attention_vit_tpu.parallel import (active_expert_mesh,
                                                  active_seq_mesh)
    from cross_attention_vit_tpu.train.trainer import Trainer

    cfg = small_vit_config(seq_parallel=2, moe_experts=4)
    mesh = make_mesh(2, seq=2, expert=2)
    Trainer(model_vit, cfg, max_epochs=1, mesh=mesh)
    assert active_seq_mesh() is mesh
    assert active_expert_mesh() is mesh

    bad = small_vit_config(seq_parallel=4)
    with pytest.raises(ValueError, match="seq_parallel"):
        Trainer(model_vit, bad, max_epochs=1, mesh=mesh)
