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


# ---------------------------------------------------------------------------
# moe_experts through ModelCross (the namesake; r4 verdict item 8)
# ---------------------------------------------------------------------------

def test_model_cross_moe_init_structure():
    """config.moe_experts converts the per-STREAM self-block FFNs (each
    stream keeps its own router+experts, matching the reference's
    per-modality FFN weights, model_cross.py:19-31,122); cross-block FFNs
    stay dense (single-CLS-token inputs have nothing to route)."""
    cfg = small_cross_config(moe_experts=4)
    params = model_cross.init(jax.random.key(0), cfg)
    for blk in params["multi_blocks"]:
        for stream in blk["self_blocks"]:
            for layer in stream:
                assert "experts" in layer["ffn"] and "router" in layer["ffn"]
                assert layer["ffn"]["experts"]["fc1"]["kernel"].shape == (4, 32, 64)
        for cb in blk["cross_blocks"]:
            assert "experts" not in cb["ffn"] and "fc1" in cb["ffn"]

    # moe_every indexes per-stream depth: mb*num_self_blocks + layer
    every2 = small_cross_config(moe_experts=4, moe_every=2)
    p2 = model_cross.init(jax.random.key(0), every2)
    for blk in p2["multi_blocks"]:
        for stream in blk["self_blocks"]:
            assert "experts" not in stream[0]["ffn"]
            assert "experts" in stream[1]["ffn"]

    with pytest.raises(ValueError, match="stacked_streams"):
        model_cross.init(jax.random.key(0),
                         small_cross_config(moe_experts=4,
                                            stacked_streams=True))


def test_model_cross_moe_eval_loss_is_pure_ce():
    """Balance term enters the TRAIN objective only (same contract as
    ModelVIT): dropout off → train and eval logits coincide, and the train
    loss exceeds the eval smoothed-CE by exactly the weighted balance."""
    cfg = small_cross_config(moe_experts=4, dropout=0.0)
    params = model_cross.init(jax.random.key(1), cfg)
    img, labels = make_batch(cfg)

    logits_e, loss_e = model_cross.apply(params, cfg, img, labels, train=False)
    logits_t, loss_t = model_cross.apply(params, cfg, img, labels, train=True,
                                         rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(logits_t), np.asarray(logits_e),
                               rtol=1e-6, atol=1e-6)
    from cross_attention_vit_tpu.ops.losses import cross_entropy

    assert float(loss_e) == pytest.approx(
        float(cross_entropy(logits_e, labels, cfg.label_smoothing)), rel=1e-6)
    gap = float(loss_t) - float(loss_e)
    assert 0.0 < gap < 0.01 * cfg.moe_experts


def test_model_cross_moe_dense_equivalent_with_identical_experts():
    """Sanity pin for the wiring: with every expert holding IDENTICAL
    weights and top-2 renormalized gates (g1+g2 = 1) at ample capacity, the
    MoE output is exactly the dense FFN — g1·f(x) + g2·f(x) = f(x) — so
    logits match a dense model whose FFN weights are copied from expert 0.
    (top-1 would NOT match: Switch multiplies by the raw gate < 1.)"""
    cfg = small_cross_config(moe_experts=2, moe_num_selected=2,
                             moe_capacity_factor=4.0, dropout=0.0)
    params = model_cross.init(jax.random.key(3), cfg)
    # collapse to one REPEATED expert: routing becomes irrelevant
    import jax.numpy as _jnp

    def dup(tree):
        return jax.tree.map(lambda l: _jnp.stack([l[0], l[0]]), tree)

    dense_cfg = small_cross_config(dropout=0.0)
    dense = model_cross.init(jax.random.key(3), dense_cfg)
    for blk_m, blk_d in zip(params["multi_blocks"], dense["multi_blocks"]):
        for st_m, st_d in zip(blk_m["self_blocks"], blk_d["self_blocks"]):
            for lay_m, lay_d in zip(st_m, st_d):
                lay_m["ffn"]["experts"] = dup(lay_m["ffn"]["experts"])
                for w in ("fc1", "fc2"):
                    lay_d["ffn"][w] = {
                        "kernel": lay_m["ffn"]["experts"][w]["kernel"][0],
                        "bias": lay_m["ffn"]["experts"][w]["bias"][0]}
                for k in ("attn_norm", "attn", "ffn_norm"):
                    lay_d[k] = lay_m[k]
        # the MoE init consumes a different key stream, so every non-FFN
        # weight must be copied over too
        blk_d["cross_blocks"] = blk_m["cross_blocks"]
    for k in ("pos_embedding", "cls_token", "patch_to_embedding", "norm",
              "mlp_head"):
        dense[k] = params[k]

    img, labels = make_batch(cfg, seed=3)
    got, _ = model_cross.apply(params, cfg, img, labels, train=False)
    want, _ = model_cross.apply(dense, dense_cfg, img, labels, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _assert_params_close_except_wk_bias(p_got, p_want):
    """Compare updated param trees, excluding cross-attention wk BIASES.

    Their exact gradient is identically zero — adding a bias b to every key
    shifts each query's scores by the constant q·b, and softmax is
    shift-invariant — so the computed gradient is pure cancellation noise
    (~1e-8) and Adam's mhat/√vhat normalizes noise/noise to an O(1)
    direction: the first-step update is lr-scale ARBITRARY and legitimately
    differs between sharding layouts.  Those leaves get an lr-scale bound."""
    flat_w, _ = jax.tree_util.tree_flatten_with_path(p_want)
    flat_g = jax.tree.leaves(p_got)
    for (kp, want), got in zip(flat_w, flat_g):
        ks = jax.tree_util.keystr(kp)
        if "wk" in ks and "bias" in ks:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=5e-4)
        else:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-4, atol=1e-6, err_msg=ks)


def test_model_cross_moe_ep_train_step_matches_serial():
    """One jitted train step of the MoE ModelCross over ('data','expert'):
    loss and updated params equal the serial (mesh-less) step."""
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step

    cfg = small_cross_config(moe_experts=4)
    params = model_cross.init(jax.random.key(4), cfg)
    img, labels = make_batch(cfg, seed=4)
    lr = jnp.asarray(1e-4, jnp.float32)

    step = make_train_step(model_cross.apply, cfg)
    p_ref, _, aux_ref = step(jax.tree.map(jnp.copy, params),
                             optim.init(params), img, labels, lr,
                             jax.random.key(5))

    mesh = make_mesh(2, expert=4)
    set_expert_mesh(mesh)
    try:
        sp = shard_params(jax.tree.map(jnp.copy, params), mesh)
        fc1 = sp["multi_blocks"][0]["self_blocks"][0][0]["ffn"]["experts"]["fc1"]["kernel"]
        assert "expert" in str(fc1.sharding.spec)
        simg, slabels = shard_batch((img, labels), mesh)
        step_ep = make_train_step(model_cross.apply, cfg, mesh=mesh)
        p_ep, _, aux_ep = step_ep(sp, optim.init(sp), simg, slabels, lr,
                                  jax.random.key(5))
    finally:
        set_expert_mesh(None)

    assert float(aux_ep["loss"]) == pytest.approx(float(aux_ref["loss"]),
                                                  rel=1e-5)
    _assert_params_close_except_wk_bias(p_ep, p_ref)
