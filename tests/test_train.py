"""Training-runtime tests: Adam vs torch, cosine schedule vs torch, metrics
vs sklearn, checkpoint top-k, and an end-to-end overfit smoke run."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.configs import get_mgmt_config, modify_config
from cross_attention_vit_tpu.train import optim
from cross_attention_vit_tpu.train.checkpoint import (CheckpointManager,
                                                      LatestCheckpointer,
                                                      restore_pytree, save_pytree)
from cross_attention_vit_tpu.train.metrics import (MetricAccumulator, binary_auroc,
                                                   compute_metrics)
from cross_attention_vit_tpu.train.schedule import ReduceLROnPlateau, cosine_annealing_lr


# ---------------------------------------------------------------------------
# Adam parity vs torch.optim.Adam (L2 weight decay into grad)
# ---------------------------------------------------------------------------

def test_adam_matches_torch_trajectory():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(7, 5)).astype(np.float32)
    grads = [rng.normal(size=(7, 5)).astype(np.float32) for _ in range(25)]
    lr, wd = 1e-2, 5e-4

    # torch
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=lr, weight_decay=wd)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    # ours
    params = {"w": jnp.asarray(p0)}
    state = optim.init(params)
    for g in grads:
        params, state = optim.update({"w": jnp.asarray(g)}, state, params,
                                     lr, weight_decay=wd)
    np.testing.assert_allclose(np.asarray(params["w"]), tp.detach().numpy(),
                               atol=1e-5, rtol=1e-5)


def test_adam_lr_is_step_argument():
    """Changing lr must not change moments — only the applied step size."""
    params = {"w": jnp.ones((3,))}
    state = optim.init(params)
    g = {"w": jnp.ones((3,))}
    p1, s1 = optim.update(g, state, params, 0.1)
    p2, _ = optim.update(g, s1, p1, 0.0)  # zero lr → params unchanged
    np.testing.assert_allclose(np.asarray(p2["w"]), np.asarray(p1["w"]))


# ---------------------------------------------------------------------------
# Cosine schedule vs torch (epoch stepping, including past T_max)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t_max,epochs", [(250, 250), (150, 250)])
def test_cosine_matches_torch(t_max, epochs):
    base, eta_min = 1e-4, 1e-6
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max,
                                                       eta_min=eta_min)
    ours = cosine_annealing_lr(base, t_max, eta_min)
    for epoch in range(epochs):
        want = opt.param_groups[0]["lr"]
        assert ours(epoch) == pytest.approx(want, rel=1e-6, abs=1e-12), epoch
        opt.step()
        sched.step()


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(1e-3, factor=0.1, patience=2)
    lrs = [s.step(1.0) for _ in range(6)]  # no improvement after first
    assert lrs[:3] == [1e-3] * 3            # best=1.0 set at step 1; 2 bad allowed
    assert lrs[3] == pytest.approx(1e-4)


# ---------------------------------------------------------------------------
# Metrics vs sklearn
# ---------------------------------------------------------------------------

def test_confusion_metrics_vs_sklearn():
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)
    rng = np.random.default_rng(3)
    preds = rng.integers(0, 2, 200)
    labels = rng.integers(0, 2, 200)
    m = jax.device_get(compute_metrics(jnp.asarray(preds), jnp.asarray(labels)))
    assert m["accuracy"] == pytest.approx(accuracy_score(labels, preds))
    assert m["precision"] == pytest.approx(precision_score(labels, preds))
    assert m["recall"] == pytest.approx(recall_score(labels, preds))
    assert m["f1_score"] == pytest.approx(f1_score(labels, preds))
    tn = ((preds == 0) & (labels == 0)).sum()
    fn = ((preds == 0) & (labels == 1)).sum()
    assert m["npv"] == pytest.approx(tn / (tn + fn))
    tn_, fp_ = tn, ((preds == 1) & (labels == 0)).sum()
    assert m["specificity"] == pytest.approx(tn_ / (tn_ + fp_))


def test_metrics_zero_denominator_returns_zero():
    preds = jnp.zeros(4, jnp.int32)
    labels = jnp.ones(4, jnp.int32)   # no positive predictions, no negatives
    m = jax.device_get(compute_metrics(preds, labels))
    assert m["precision"] == 0.0 and m["specificity"] == 0.0 and m["npv"] == 0.0


@pytest.mark.parametrize("ties", [False, True])
def test_auroc_vs_sklearn(ties):
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(4)
    scores = rng.normal(size=300)
    if ties:
        scores = np.round(scores, 1)  # force many ties
    labels = (rng.normal(size=300) + 0.5 * scores > 0).astype(int)
    got = float(binary_auroc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    assert got == pytest.approx(want, abs=1e-6)


def test_auroc_single_class_is_zero_not_nan():
    assert float(binary_auroc(jnp.asarray([0.1, 0.9]), jnp.asarray([1, 1]))) == 0.0


def test_metric_accumulator_epoch_aggregation():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(5)
    acc = MetricAccumulator()
    all_scores, all_labels = [], []
    for _ in range(3):
        scores = rng.uniform(size=16)
        labels = rng.integers(0, 2, 16)
        preds = (scores > 0.5).astype(int)
        from cross_attention_vit_tpu.train.metrics import confusion_counts
        acc.update(0.5, jax.device_get(confusion_counts(jnp.asarray(preds),
                                                        jnp.asarray(labels))),
                   scores, labels)
        all_scores.append(scores)
        all_labels.append(labels)
    r = acc.result()
    want_auc = roc_auc_score(np.concatenate(all_labels), np.concatenate(all_scores))
    assert r["auc_roc"] == pytest.approx(want_auc, abs=1e-6)
    assert r["loss"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# Checkpointing
# ---------------------------------------------------------------------------

def test_pytree_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": [{"c": jnp.ones((4,))}, {"c": jnp.zeros((4,))}],
            "step": jnp.asarray(7, jnp.int32)}
    save_pytree(tmp_path / "x.npz", tree)
    got = restore_pytree(tmp_path / "x.npz", tree)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_manager_topk(tmp_path):
    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=2, mode="min")
    state = {"w": jnp.ones((2,))}
    assert mgr.save(0, 1.0, state) is not None
    assert mgr.save(1, 0.5, state) is not None
    assert mgr.save(2, 2.0, state) is None          # worse than both kept
    p = mgr.save(3, 0.1, state)                      # evicts 1.0
    assert p is not None
    kept = sorted(f.name for f in tmp_path.glob("*.npz"))
    assert len(kept) == 2
    assert mgr.best()["metric"] == pytest.approx(0.1)
    assert "val_loss=0.1000" in mgr.best_path().name


def test_latest_checkpointer_resume(tmp_path):
    lc = LatestCheckpointer(tmp_path, keep=2)
    like = {"w": jnp.zeros((3,)), "epoch": jnp.asarray(0, jnp.int32)}
    for step in [10, 20, 30]:
        lc.save(step, {"w": jnp.full((3,), float(step)),
                       "epoch": jnp.asarray(step // 10, jnp.int32)})
    assert lc.latest_step() == 30
    assert len(list(tmp_path.glob("step=*.npz"))) == 2  # keep=2 pruning
    step, state = lc.restore_latest(like)
    assert step == 30
    np.testing.assert_array_equal(np.asarray(state["w"]), [30.0] * 3)


def test_latest_checkpointer_survives_partial_write(tmp_path):
    """A SIGKILL during save_pytree's atomic write leaves `step=N.tmp.npz`
    (the os.replace never ran).  That partial matches the step=*.npz glob
    but is not a durable checkpoint: latest_step/_prune/restore must skip
    it — the r5 kill/resume drive crashed exactly here (docs/RUN_r05.md) —
    and latest_step sweeps it from disk."""
    lc = LatestCheckpointer(tmp_path, keep=2)
    like = {"w": jnp.zeros((3,))}
    for step in [10, 20]:
        lc.save(step, {"w": jnp.full((3,), float(step))})
    # a truncated partial from a killed writer, numerically newest
    (tmp_path / "step=30.tmp.npz").write_bytes(b"PK\x03\x04 truncated")

    assert lc.latest_step() == 20
    assert not (tmp_path / "step=30.tmp.npz").exists()  # swept
    step, state = lc.restore_latest(like)
    assert step == 20
    np.testing.assert_array_equal(np.asarray(state["w"]), [20.0] * 3)
    lc.save(40, {"w": jnp.full((3,), 40.0)})  # _prune must not crash
    assert lc.latest_step() == 40


# ---------------------------------------------------------------------------
# End-to-end: tiny ModelVIT overfits 8 synthetic samples
# ---------------------------------------------------------------------------

class FakeDataset:
    """In-memory dataset with the BrainDataset batch interface."""

    def __init__(self, imgs, labels):
        self.imgs, self.labels = imgs, labels

    def __len__(self):
        return len(self.labels)

    def batch(self, indices):
        idx = np.asarray(indices)
        return self.imgs[idx], self.labels[idx]


def test_trainer_overfits_tiny_vit(tmp_path):
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.train.loggers import CSVLogger
    from cross_attention_vit_tpu.train.trainer import Trainer

    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=32, mlp_dim=64, num_heads=4, num_layers=2,
                            img_size=(16, 16, 8), patch_size=(8, 8, 8),
                            num_modalities=1, dropout=0.0, lr=3e-4,
                            weight_decay=0.0, label_smoothing=0.0,
                            optim_params={"T_max": 30, "eta_min": 1e-6}))
    rng = np.random.default_rng(0)
    labels = np.array([0, 1] * 4, dtype=np.int32)
    # class-dependent mean makes the task learnable
    imgs = (rng.normal(size=(8, 1, 1, 16, 16, 8)) +
            labels[:, None, None, None, None, None] * 2.0).astype(np.float32)
    ds = FakeDataset(imgs, labels)
    loader = PrefetchLoader(ds, batch_size=4)

    logger = CSVLogger(tmp_path, "run0")
    trainer = Trainer(model_vit, cfg, max_epochs=25, logger=logger,
                      checkpoint=CheckpointManager(tmp_path / "ckpt", save_top_k=2))
    history = trainer.fit(loader, loader, verbose=False)

    assert history[-1]["train_loss"] < 0.25 < history[0]["train_loss"]
    assert history[-1]["val_acc"] == 1.0
    assert (tmp_path / "run0" / "metrics.csv").exists()
    assert len(list((tmp_path / "ckpt").glob("*.npz"))) == 2

    logits, targets = trainer.test(loader)
    assert logits.shape == (8, 2)
    np.testing.assert_array_equal(np.sort(targets), np.sort(labels))


def test_trainer_resume_from_latest(tmp_path):
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.train.trainer import Trainer

    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=16, mlp_dim=32, num_heads=2, num_layers=1,
                            img_size=(8, 8, 8), patch_size=(8, 8, 8),
                            num_modalities=1, dropout=0.0, lr=1e-3,
                            weight_decay=0.0, label_smoothing=0.0,
                            optim_params={"T_max": 10, "eta_min": 1e-6}))
    rng = np.random.default_rng(1)
    ds = FakeDataset(rng.normal(size=(4, 1, 1, 8, 8, 8)).astype(np.float32),
                     np.array([0, 1, 0, 1], dtype=np.int32))
    loader = PrefetchLoader(ds, batch_size=2)

    lc = LatestCheckpointer(tmp_path / "latest")
    t1 = Trainer(model_vit, cfg, max_epochs=3, latest=lc, seed=1)
    t1.fit(loader, loader, verbose=False)
    w_end = np.asarray(jax.tree.leaves(t1.params)[0])

    t2 = Trainer(model_vit, cfg, max_epochs=3, latest=lc, seed=1)
    t2.init_state()
    resume_epoch = t2.maybe_resume()
    assert resume_epoch == 3  # all epochs done
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(t2.params)[0]), w_end)


def test_trainer_with_augmentation_runs(tmp_path):
    """img_aug=True engages the device-side 9-transform pipeline in the
    train step (D == H required for RandRotate90)."""
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.train.trainer import Trainer

    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=16, mlp_dim=32, num_heads=2, num_layers=1,
                            img_size=(16, 16, 8), patch_size=(8, 8, 8),
                            num_modalities=1, dropout=0.0, lr=1e-3,
                            weight_decay=0.0, label_smoothing=0.0, img_aug=True,
                            optim_params={"T_max": 10, "eta_min": 1e-6}))
    rng = np.random.default_rng(2)
    ds = FakeDataset(rng.normal(size=(4, 1, 1, 16, 16, 8)).astype(np.float32) * 50,
                     np.array([0, 1, 0, 1], dtype=np.int32))
    loader = PrefetchLoader(ds, batch_size=2)
    t = Trainer(model_vit, cfg, max_epochs=2, seed=2)
    hist = t.fit(loader, loader, verbose=False)
    assert np.isfinite(hist[-1]["train_loss"])


def test_async_checkpoint_writes(tmp_path):
    from cross_attention_vit_tpu.train.checkpoint import (CheckpointManager,
                                                          LatestCheckpointer,
                                                          wait_for_writes)
    state = {"w": jnp.arange(100.0)}
    mgr = CheckpointManager(tmp_path / "topk", save_top_k=2, async_write=True)
    mgr.save(0, 1.0, state)
    mgr.save(1, 0.5, state)
    lc = LatestCheckpointer(tmp_path / "latest", keep=1, async_write=True)
    lc.save(10, state)
    lc.save(20, state)
    wait_for_writes()
    assert len(list((tmp_path / "topk").glob("*.npz"))) == 2
    latest = list((tmp_path / "latest").glob("step=*.npz"))
    assert [p.name for p in latest] == ["step=20.npz"]  # prune ordered after write
    step, got = lc.restore_latest(state)
    assert step == 20
    np.testing.assert_array_equal(np.asarray(got["w"]), np.arange(100.0))


def test_checkpoint_manager_resume_no_duplicate_entries(tmp_path):
    """A resumed run replays epochs it already saved: same filename, same
    metric.  The manifest must replace the old entry, not double-count it
    against the top-k budget (observed live: a SIGKILL+resume of the training
    CLI left epochs 2 and 3 listed twice)."""
    state = {"w": jnp.ones((2,))}
    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=4, mode="min")
    mgr.save(0, 1.0, state)
    mgr.save(1, 0.5, state)
    # simulate preemption + resume: a fresh manager reloads the manifest
    mgr2 = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=4, mode="min")
    mgr2.save(1, 0.5, state)   # replayed epoch
    mgr2.save(2, 0.7, state)
    assert len(mgr2._entries) == 3
    assert sorted(e["epoch"] for e in mgr2._entries) == [0, 1, 2]
    assert len(list(tmp_path.glob("*.npz"))) == 3


def test_csv_logger_appends_across_resume(tmp_path):
    """A resumed run's CSVLogger must keep the pre-preemption rows (observed
    live: resume overwrote metrics.csv, losing epochs 0-1), and a replayed
    epoch replaces its row instead of duplicating it."""
    from cross_attention_vit_tpu.train.loggers import CSVLogger

    lg = CSVLogger(tmp_path, "run")
    lg.log_metrics({"train_loss": 1.0}, 0)
    lg.log_metrics({"train_loss": 0.8}, 1)
    # fresh process after preemption: resume intent must be explicit
    lg2 = CSVLogger(tmp_path, "run", resume=True)
    lg2.log_metrics({"train_loss": 0.8}, 1)  # replayed epoch
    lg2.log_metrics({"train_loss": 0.6, "val_loss": 0.9}, 2)

    import csv as _csv
    with open(tmp_path / "run" / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert [int(r["epoch"]) for r in rows] == [0, 1, 2]
    assert float(rows[2]["val_loss"]) == 0.9


def test_early_stopping_unit():
    from cross_attention_vit_tpu.train.trainer import EarlyStopping

    es = EarlyStopping(patience=2, mode="min")
    assert not es.step(1.0)   # improves (best was inf)
    assert not es.step(0.5)   # improves
    assert not es.step(0.6)   # bad 1
    assert not es.step(0.4)   # improves again → counter resets
    assert not es.step(0.6)   # bad 1
    assert es.step(0.5)       # bad 2 → patience reached → stop
    es3 = EarlyStopping(patience=1, mode="max", min_delta=0.1)
    es3.step(0.5)
    assert es3.step(0.55)     # +0.05 < min_delta → not an improvement → stop


def test_trainer_early_stopping_halts(tmp_path):
    """patience on val_loss ends the run early — the capability the reference
    comments out twice (main_mist.py:36-42, other_model.py:268-283)."""
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.train.trainer import EarlyStopping, Trainer

    cfg = get_mgmt_config()
    modify_config(cfg, dict(hidden_dim=16, mlp_dim=32, num_heads=2, num_layers=1,
                            img_size=(8, 8, 8), patch_size=(8, 8, 8),
                            num_modalities=1, dropout=0.0, lr=1e-3,
                            weight_decay=0.0, label_smoothing=0.0,
                            optim_params={"T_max": 10, "eta_min": 1e-6}))
    rng = np.random.default_rng(3)
    ds = FakeDataset(rng.normal(size=(4, 1, 1, 8, 8, 8)).astype(np.float32),
                     np.array([0, 1, 0, 1], dtype=np.int32))
    loader = PrefetchLoader(ds, batch_size=2)
    # min_delta so large nothing after epoch 0 ever counts as improvement
    es = EarlyStopping(monitor="val_loss", patience=2, min_delta=100.0)
    t = Trainer(model_vit, cfg, max_epochs=20, seed=3, early_stopping=es)
    hist = t.fit(loader, loader, verbose=False)
    assert len(hist) == 3  # epoch 0 improves, epochs 1-2 bad → stop
    # off by default: same config without the callback runs to max_epochs
    t2 = Trainer(model_vit, cfg, max_epochs=4, seed=3)
    assert len(t2.fit(loader, loader, verbose=False)) == 4


def test_csv_logger_fresh_run_ignores_stale_file(tmp_path):
    """A NEW run pointed at a previously-used dir must not inherit the old
    run's rows (round-2 advisor finding)."""
    from cross_attention_vit_tpu.train.loggers import CSVLogger

    lg = CSVLogger(tmp_path, "run")
    lg.log_metrics({"train_loss": 1.0}, 0)
    lg2 = CSVLogger(tmp_path, "run")  # resume NOT requested
    lg2.log_metrics({"train_loss": 2.0}, 0)

    import csv as _csv
    with open(tmp_path / "run" / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 1 and float(rows[0]["train_loss"]) == 2.0


def test_csv_logger_torn_write_leaves_old_file_intact(tmp_path, monkeypatch):
    """Kill-mid-write simulation: if the process dies between writing the
    temp file and the atomic rename, the previous metrics.csv survives whole
    (the r02 flagship artifact lost epochs 0-1 to an in-place rewrite)."""
    import cross_attention_vit_tpu.train.loggers as loggers_mod
    from cross_attention_vit_tpu.train.loggers import CSVLogger

    lg = CSVLogger(tmp_path, "run")
    lg.log_metrics({"train_loss": 1.0}, 0)
    lg.log_metrics({"train_loss": 0.8}, 1)

    real_replace = loggers_mod.os.replace
    monkeypatch.setattr(loggers_mod.os, "replace",
                        lambda *a: (_ for _ in ()).throw(KeyboardInterrupt()))
    try:
        lg.log_metrics({"train_loss": 0.6}, 2)
    except KeyboardInterrupt:
        pass
    monkeypatch.setattr(loggers_mod.os, "replace", real_replace)

    import csv as _csv
    with open(tmp_path / "run" / "metrics.csv", newline="") as f:
        rows = list(_csv.DictReader(f))
    # old file whole: exactly the two pre-kill epochs, fully parseable
    assert [int(r["epoch"]) for r in rows] == [0, 1]


def test_checkpoint_manager_replay_skips_durable_rewrite(tmp_path):
    """A resumed run replaying an epoch bit-identically must not re-fetch and
    re-write a checkpoint that is already durable with the same epoch and
    exact metric (observed live: each duplicate 3 GB re-save cost minutes of
    relayed D2H during the RUN_r03 resume).  A changed metric still
    overwrites."""
    state = {"w": jnp.ones((2,))}
    mgr = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=4, mode="min")
    p = mgr.save(0, 0.5, state)
    mtime = p.stat().st_mtime_ns

    # fresh manager = resumed process; replayed epoch with identical metric
    mgr2 = CheckpointManager(tmp_path, monitor="val_loss", save_top_k=4, mode="min")
    p2 = mgr2.save(0, 0.5, {"w": jnp.ones((2,))})
    assert p2 == p
    assert p.stat().st_mtime_ns == mtime        # not rewritten
    assert len(mgr2._entries) == 1

    # same epoch, different metric (non-identical replay): must overwrite
    p3 = mgr2.save(0, 0.4, state)
    assert p3 != p and p3.exists()
