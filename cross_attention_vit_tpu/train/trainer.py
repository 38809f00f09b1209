"""Trainer — the L.Trainer + LightningModule-hooks equivalent, TPU-native.

One jitted `train_step` (value_and_grad → Adam update, buffers donated so
params/optimizer state update in place in HBM) and one jitted `eval_step`,
driven by a host epoch loop that reproduces the reference runtime behavior
(reference main_mist.py:142-149, model_cross.py:260-292):

  * weighted sampling per epoch (create_sampler, main_mist.py:44-53);
  * Adam(lr, weight_decay) + CosineAnnealingLR stepped per epoch;
  * epoch-aggregated train/val loss, acc/prec/rec/spec/f1/npv + AUROC,
    logged to CSV + TensorBoard;
  * top-k val_loss checkpointing, plus a rolling latest-step checkpoint for
    preemption-safe resume (a TPU-robustness addition the reference lacks).

Under a mesh, pass `data_sharding`/`replicated` (see parallel/) — the same
step functions then run SPMD with compiler-inserted gradient psums, replacing
Lightning DDP + NCCL.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config
from . import optim
from .checkpoint import CheckpointManager, LatestCheckpointer
from .loggers import MultiLogger
from .metrics import MetricAccumulator, confusion_counts
from .schedule import cosine_annealing_lr


class EarlyStopping:
    """Stop training after `patience` epochs without improvement on a
    monitored metric — the capability the reference gestures at twice but
    never enables (Lightning EarlyStopping commented at main_mist.py:36-42;
    manual patience loop commented at other_model.py:268-283).  Off by
    default; semantics follow the Lightning callback the reference imports:
    an epoch counts as improved when the metric beats the best seen by more
    than `min_delta` in the `mode` direction."""

    def __init__(self, monitor: str = "val_loss", min_delta: float = 0.0,
                 patience: int = 25, mode: str = "min", verbose: bool = False):
        if mode not in ("min", "max"):
            raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
        self.monitor = monitor
        self.min_delta = min_delta
        self.patience = patience
        self.mode = mode
        self.verbose = verbose
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad = 0

    def step(self, metric: float) -> bool:
        """Record one epoch's monitored value; returns True → stop now."""
        improved = (metric < self.best - self.min_delta if self.mode == "min"
                    else metric > self.best + self.min_delta)
        if improved:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad >= self.patience:
            if self.verbose:
                print(f"EarlyStopping: {self.monitor} did not improve for "
                      f"{self.patience} epochs (best {self.best:.4f})")
            return True
        return False


def _replicate_aux(aux: dict, mesh) -> dict:
    """Constrain the per-step metric outputs to a fully-replicated layout.

    Scalars (loss, counts) come out of the reduction replicated already; the
    per-sample probs/labels are batch-sharded over 'data' — the constraint
    makes GSPMD all-gather them (a few hundred floats), so every HOST holds
    the full vectors and epoch-end `device_get` works under multi-host
    (the sync_dist=True equivalent, reference model_cross.py:246-255)."""
    if mesh is None:
        return aux
    from jax.sharding import NamedSharding, PartitionSpec

    rep = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep), aux)


def make_train_step(model_apply, config: Config, donate: bool = True,
                    mesh=None, grad_accum: int = 1, accum_impl: str = "scan"):
    """Builds the jitted SPMD train step.

    Signature: (params, opt_state, img, labels, lr, rng) →
               (params, opt_state, aux-dict)

    grad_accum > 1 splits the batch into that many equal microbatches and
    accumulates gradients before the single Adam update — the capability row
    the reference lacks (SURVEY.md §2.3).  Activation memory scales with
    batch/grad_accum while the update sees the full-batch mean gradient
    (identical up to summation order; dropout draws fresh per-microbatch
    keys, the same independence a larger batch would have).  Equality is
    exact-to-f32-noise on CPU (test_parallel); on TPU the MXU's default
    matmul precision makes per-sample values batch-shape-dependent at ~1e-3
    relative, so accumulated vs one-shot steps agree to that level.

    accum_impl: 'scan' rolls the microbatch loop into one lax.scan — compact
    HLO, compile time independent of grad_accum; the default and the right
    choice on a directly-attached TPU/CPU runtime.  'unroll' emits the loop
    body grad_accum times — compile time scales with grad_accum, but the
    program contains no while-loop.  Use it on RELAYED device runtimes
    (e.g. the axon tunnel this repo benches on), where each while-loop
    iteration pays a host round-trip: measured 17.6 s vs 0.5 s per step at
    config-4 geometry, a 35x difference from dispatch gaps alone (device op
    time was identical; docs/PERF_r03.md).
    """
    weight_decay = config.weight_decay
    img_aug = bool(config.get("img_aug", False))
    aug_bf16 = config.get("augment_dtype", "float32") == "bfloat16"
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    if accum_impl not in ("scan", "unroll"):
        raise ValueError(f"accum_impl must be 'scan' or 'unroll', "
                         f"got {accum_impl!r}")

    def step(params, opt_state, img, labels, lr, rng):
        from ..ops.layers import promote_input

        img = promote_input(img)  # bf16/f16 H2D transfers; f32 math below
        if img_aug:
            # device-side batched augmentation (reference runs its MONAI
            # pipeline per-sample on CPU workers; dataset_ucsf.py:94-113)
            from ..data.augment import augment_batch

            aug_rng, rng = jax.random.split(rng)
            if aug_bf16:
                # augment_dtype='bfloat16': the pipeline's step boundaries
                # (gathers/scatters/selects/cond buffers — the dominant aug
                # cost) carry bf16; each transform's internal math stays f32.
                # Only sensible with activation_dtype bf16, where the model
                # would round the volumes to bf16 at its first matmul anyway.
                img = img.astype(jnp.bfloat16)
            img = augment_batch(aug_rng, img)
            img = promote_input(img)  # restore the f32 model-entry contract

        def loss_fn(p, im, lb, r):
            logits, loss = model_apply(p, config, im, lb, train=True, rng=r)
            return loss, logits

        if grad_accum == 1:
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, img, labels, rng)
        else:
            batch = img.shape[0]
            if batch % grad_accum:
                raise ValueError(f"batch {batch} not divisible by "
                                 f"grad_accum {grad_accum}")
            micro = batch // grad_accum
            imgs = img.reshape(grad_accum, micro, *img.shape[1:])
            labs = labels.reshape(grad_accum, micro)
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

            if accum_impl == "unroll":
                g_sum, loss_sum, logit_parts = None, 0.0, []
                for i in range(grad_accum):
                    im, lb = imgs[i], labs[i]
                    if g_sum is not None:
                        # Tie each microbatch's input to the previous
                        # accumulation so XLA cannot overlap their activation
                        # lifetimes — without this the scheduler interleaves
                        # the unrolled subgraphs and peak HLO-temp grows with
                        # grad_accum (measured: depth-24 b32 ga4 OOMs at
                        # 18.3 GB; sequenced it fits like the scan form).
                        g_sum, loss_sum, im = jax.lax.optimization_barrier(
                            (g_sum, loss_sum, im))
                    (l, lo), g = grad_fn(params, im, lb,
                                         jax.random.fold_in(rng, i))
                    g_sum = (jax.tree.map(lambda x: x.astype(jnp.float32), g)
                             if g_sum is None else
                             jax.tree.map(lambda a, b: a + b.astype(jnp.float32),
                                          g_sum, g))
                    loss_sum = loss_sum + l
                    logit_parts.append(lo)
                logits = jnp.concatenate(logit_parts)
            else:
                def body(carry, xs):
                    g_acc, loss_acc = carry
                    im, lb, i = xs
                    (l, lo), g = grad_fn(params, im, lb,
                                         jax.random.fold_in(rng, i))
                    g_acc = jax.tree.map(
                        lambda a, b: a + b.astype(jnp.float32), g_acc, g)
                    return (g_acc, loss_acc + l), lo

                g0 = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32),
                                  params)
                (g_sum, loss_sum), logits = jax.lax.scan(
                    body, (g0, jnp.zeros((), jnp.float32)),
                    (imgs, labs, jnp.arange(grad_accum)))
                logits = logits.reshape(batch, *logits.shape[2:])
            grads = jax.tree.map(lambda g: g / grad_accum, g_sum)
            loss = loss_sum / grad_accum

        params, opt_state = optim.update(grads, opt_state, params, lr,
                                         weight_decay=weight_decay)
        preds = jnp.argmax(logits, axis=1)
        aux = {
            "loss": loss,
            "counts": confusion_counts(preds, labels),
            "probs": jax.nn.softmax(logits, axis=1)[:, 1],
            "labels": labels,
        }
        return params, opt_state, _replicate_aux(aux, mesh)

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_eval_step(model_apply, config: Config, mesh=None):
    def step(params, img, labels):
        logits, loss = model_apply(params, config, img, labels, train=False)
        preds = jnp.argmax(logits, axis=1)
        return _replicate_aux({
            "loss": loss,
            "logits": logits,
            "counts": confusion_counts(preds, labels),
            "probs": jax.nn.softmax(logits, axis=1)[:, 1],
            "labels": labels,
        }, mesh)

    return jax.jit(step)


def make_stateful_train_step(model_apply, config: Config, donate: bool = True,
                             mesh=None):
    """Train step for models with mutable state (BatchNorm running stats —
    the vit3d family): apply(params, state, cfg, img, labels, train, rng)
    → (logits, loss, new_state).  Gradients flow through params only; the
    state update rides along (torch semantics: BN stats are buffers)."""
    weight_decay = config.weight_decay
    img_aug = bool(config.get("img_aug", False))
    aug_bf16 = config.get("augment_dtype", "float32") == "bfloat16"

    def step(params, model_state, opt_state, img, labels, lr, rng):
        from ..ops.layers import promote_input

        img = promote_input(img)  # bf16/f16 H2D transfers; f32 math below
        if img_aug:
            from ..data.augment import augment_batch

            aug_rng, rng = jax.random.split(rng)
            if aug_bf16:
                img = img.astype(jnp.bfloat16)  # see make_train_step
            img = augment_batch(aug_rng, img)
            img = promote_input(img)  # restore the f32 model-entry contract

        def loss_fn(p):
            logits, loss, new_state = model_apply(p, model_state, config, img,
                                                  labels, train=True, rng=rng)
            return loss, (logits, new_state)

        (loss, (logits, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        params, opt_state = optim.update(grads, opt_state, params, lr,
                                         weight_decay=weight_decay)
        preds = jnp.argmax(logits, axis=1)
        aux = {
            "loss": loss,
            "counts": confusion_counts(preds, labels),
            "probs": jax.nn.softmax(logits, axis=1)[:, 1],
            "labels": labels,
        }
        return params, new_state, opt_state, _replicate_aux(aux, mesh)

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_stateful_eval_step(model_apply, config: Config, mesh=None):
    def step(params, model_state, img, labels):
        logits, loss, _ = model_apply(params, model_state, config, img, labels,
                                      train=False)
        preds = jnp.argmax(logits, axis=1)
        return _replicate_aux({
            "loss": loss,
            "logits": logits,
            "counts": confusion_counts(preds, labels),
            "probs": jax.nn.softmax(logits, axis=1)[:, 1],
            "labels": labels,
        }, mesh)

    return jax.jit(step)


class Trainer:
    def __init__(self, model_module, config: Config, max_epochs: int,
                 logger=None, checkpoint: CheckpointManager | None = None,
                 latest: LatestCheckpointer | None = None, seed: int = 0,
                 data_sharding=None, log_every_epochs: int = 1,
                 stateful: bool = False, schedule: str = "cosine",
                 latest_every: int = 1, checkpoint_monitor: str = "val_loss",
                 mesh=None, early_stopping: EarlyStopping | None = None,
                 fsdp: bool = False, grad_accum: int = 1,
                 accum_impl: str = "scan"):
        """stateful: model carries mutable state (BatchNorm families) —
        init returns (params, state), apply takes/returns state.
        schedule: 'cosine' (model_cross/model_vit contract) or 'plateau'
        (the vit3d/cnn_vit contract — ReduceLROnPlateau on val_loss,
        reference modelv2.py:280-292, model.py:322-334).
        latest_every: rolling-checkpoint cadence in epochs (full-size states
        are ~3 GB; every epoch is wasteful for long runs).
        mesh: a parallel.make_mesh Mesh — params/opt state are placed per the
        TP sharding rules and batches shard over the 'data' axis; this is the
        Trainer-level replacement for Lightning's devices/num_nodes.
        fsdp: additionally shard params + Adam moments over the 'data' axis
        (ZeRO/FSDP — parallel/sharding.py); requires a mesh.
        grad_accum: split each batch into this many sequential microbatches
        inside the jitted step (summed-then-averaged grads == the one-shot
        step's; trades step time for activation memory).  Stateless models
        only (BN-running-stat families update state once per step).
        accum_impl: 'scan' (default) or 'unroll' — see make_train_step;
        pick 'unroll' on relayed device runtimes."""
        self.model = model_module
        self.config = config
        self.max_epochs = max_epochs
        self.logger = logger or MultiLogger()
        self.checkpoint = checkpoint
        self.latest = latest
        self.latest_every = max(1, latest_every)
        self.seed = seed
        self.mesh = mesh
        self.fsdp = bool(fsdp)
        if self.fsdp and mesh is None:
            raise ValueError("fsdp=True requires a mesh")
        if grad_accum > 1 and stateful:
            raise ValueError("grad_accum > 1 is not supported for stateful "
                             "(BatchNorm) models")
        self.pipeline = config.get("pipeline_stages", 0) > 1
        if mesh is not None and data_sharding is None:
            from ..parallel import batch_sharding

            data_sharding = batch_sharding(mesh, 6)  # (B, M, C, D, H, W)
        if self.pipeline and mesh is not None:
            # PP models read the ambient pipeline mesh (parallel/pipeline.py)
            from ..parallel import set_pipeline_mesh

            set_pipeline_mesh(mesh)
        if config.get("seq_parallel", 0) > 1 and mesh is not None:
            # SP models route attention through the ambient seq mesh
            # (parallel/ring.py sharded_ring_sdpa)
            if mesh.shape.get("seq", 1) != config.get("seq_parallel"):
                raise ValueError(
                    f"config.seq_parallel={config.get('seq_parallel')} but "
                    f"mesh 'seq' axis is {mesh.shape.get('seq', 1)} — build "
                    f"the mesh with make_mesh(..., seq=P)")
            from ..parallel import set_seq_mesh

            set_seq_mesh(mesh)
        if config.get("moe_experts", 0) > 1 and mesh is not None \
                and mesh.shape.get("expert", 1) > 1:
            # EP models pin dispatch/combine shardings to the ambient expert
            # mesh (parallel/moe.py); a mesh without an 'expert' axis keeps
            # the bit-identical serial MoE program
            if config.get("moe_experts") % mesh.shape["expert"]:
                raise ValueError(
                    f"moe_experts={config.get('moe_experts')} not divisible "
                    f"by mesh 'expert' axis {mesh.shape['expert']}")
            from ..parallel import set_expert_mesh

            set_expert_mesh(mesh)
        self.data_sharding = data_sharding
        self.log_every = log_every_epochs
        self.stateful = stateful
        # which history key gates top-k checkpoints: val_loss for the live
        # driver (main_mist.py:176), train_loss for the stale one (main.py:28)
        self.checkpoint_monitor = checkpoint_monitor
        self.early_stopping = early_stopping

        if schedule == "cosine":
            self.lr_fn = cosine_annealing_lr(
                config.lr, config.optim_params["T_max"],
                config.optim_params["eta_min"])
            self.plateau = None
        elif schedule == "plateau":
            from .schedule import ReduceLROnPlateau

            op = config.optim_params
            self.plateau = ReduceLROnPlateau(
                config.lr, factor=op.get("factor", 0.1),
                patience=op.get("patience", 10))
            self.lr_fn = lambda epoch: self.plateau.lr
        else:
            raise ValueError(f"unknown schedule {schedule!r}")

        if stateful:
            self.train_step = make_stateful_train_step(model_module.apply,
                                                       config, mesh=mesh)
            self.eval_step = make_stateful_eval_step(model_module.apply,
                                                     config, mesh=mesh)
        else:
            self.train_step = make_train_step(model_module.apply, config,
                                              mesh=mesh, grad_accum=grad_accum,
                                              accum_impl=accum_impl)
            self.eval_step = make_eval_step(model_module.apply, config,
                                            mesh=mesh)

        self.params = None
        self.model_state = None
        self.opt_state = None
        self.global_step = 0

    # -- lifecycle -----------------------------------------------------------
    def init_state(self, params=None, model_state=None):
        if params is None:
            out = self.model.init(jax.random.key(self.seed), self.config)
            if self.stateful:
                params, model_state = out
            else:
                params = out
        if self.mesh is not None:
            from ..parallel import replicated, shard_params

            params = shard_params(params, self.mesh, fsdp=self.fsdp,
                                  pipeline=self.pipeline)
            if model_state is not None:
                model_state = jax.device_put(model_state, replicated(self.mesh))
        self.params = params
        self.model_state = model_state
        # zeros_like preserves shardings, so Adam moments inherit the params'
        # mesh placement automatically
        self.opt_state = optim.init(params)
        return self

    def _ckpt_state(self, epoch: int) -> dict:
        state = {"params": self.params, "opt": self.opt_state,
                 "epoch": jnp.asarray(epoch, jnp.int32)}
        if self.stateful:
            state["model_state"] = self.model_state
        if self.plateau is not None:
            # ReduceLROnPlateau is stateful (current lr / best / bad-epoch
            # count) — without this a resumed plateau run silently restarts
            # at the base lr with reset patience
            state["plateau"] = {
                "lr": jnp.asarray(self.plateau.lr, jnp.float32),
                "best": jnp.asarray(self.plateau.best, jnp.float32),
                "num_bad": jnp.asarray(self.plateau.num_bad, jnp.int32),
            }
        if self.early_stopping is not None:
            # same rationale as the plateau state: a resumed run must not
            # restart the patience counter
            state["early_stop"] = {
                "best": jnp.asarray(self.early_stopping.best, jnp.float32),
                "num_bad": jnp.asarray(self.early_stopping.num_bad, jnp.int32),
            }
        return state

    def maybe_resume(self):
        """Resume params/opt/epoch from the rolling latest checkpoint."""
        if self.latest is None or self.params is None:
            return 0
        like = self._ckpt_state(0)
        step, state = self.latest.restore_latest(like)
        if state is None:
            return 0
        params, opt = state["params"], state["opt"]
        if self.mesh is not None:
            # restore returns host arrays — re-place them per the mesh rules
            from ..parallel import replicated, shard_params

            params = shard_params(params, self.mesh, fsdp=self.fsdp)
            opt = optim.AdamState(step=jax.device_put(opt.step,
                                                      replicated(self.mesh)),
                                  mu=shard_params(opt.mu, self.mesh,
                                                  fsdp=self.fsdp),
                                  nu=shard_params(opt.nu, self.mesh,
                                                  fsdp=self.fsdp))
            if self.stateful:
                state["model_state"] = jax.device_put(state["model_state"],
                                                      replicated(self.mesh))
        self.params, self.opt_state = params, opt
        if self.stateful:
            self.model_state = state["model_state"]
        if self.plateau is not None and "plateau" in state:
            self.plateau.lr = float(state["plateau"]["lr"])
            self.plateau.best = float(state["plateau"]["best"])
            self.plateau.num_bad = int(state["plateau"]["num_bad"])
        if self.early_stopping is not None and "early_stop" in state:
            self.early_stopping.best = float(state["early_stop"]["best"])
            self.early_stopping.num_bad = int(state["early_stop"]["num_bad"])
        self.global_step = step
        return int(state["epoch"]) + 1

    def _host_snapshot(self, epoch: int) -> dict:
        """Fetch the checkpoint state to host numpy.  Multi-host: TP-sharded
        params are not fully addressable from one process, so a jitted
        identity with replicated out-shardings all-gathers them first (every
        process must call this — it is a collective)."""
        state = self._ckpt_state(epoch)
        if self.mesh is not None and jax.process_count() > 1:
            from ..parallel import replicated

            state = jax.jit(lambda s: s,
                            out_shardings=replicated(self.mesh))(state)
        return jax.device_get(state)

    # -- loops ----------------------------------------------------------------
    def _run_epoch_train(self, loader, indices, lr, epoch_rng):
        acc = MetricAccumulator()
        for imgs, labels in loader(indices):
            rng = jax.random.fold_in(epoch_rng, self.global_step)
            lr_arr = jnp.asarray(lr, jnp.float32)
            if self.stateful:
                (self.params, self.model_state, self.opt_state,
                 aux) = self.train_step(self.params, self.model_state,
                                        self.opt_state, imgs, labels, lr_arr, rng)
            else:
                self.params, self.opt_state, aux = self.train_step(
                    self.params, self.opt_state, imgs, labels, lr_arr, rng)
            self.global_step += 1
            # device-side accumulation: nothing here blocks on the device —
            # the epoch does O(1) device_gets total (in acc.result())
            acc.update(aux["loss"], aux["counts"], aux["probs"], aux["labels"])
        return acc.result()

    def _run_epoch_eval(self, loader, indices):
        acc = MetricAccumulator()
        for imgs, labels in loader(indices):
            if self.stateful:
                aux = self.eval_step(self.params, self.model_state, imgs, labels)
            else:
                aux = self.eval_step(self.params, imgs, labels)
            acc.update(aux["loss"], aux["counts"], aux["probs"], aux["labels"])
        return acc.result()

    def fit(self, train_loader, val_loader, sampler=None,
            start_epoch: int | None = None, verbose: bool = True):
        """train_loader/val_loader: PrefetchLoader instances; sampler: optional
        WeightedRandomSampler (train index order per epoch)."""
        if self.params is None:
            self.init_state()
        if start_epoch is None:
            start_epoch = self.maybe_resume()
        if self.data_sharding is not None:
            for ld in (train_loader, val_loader):
                if getattr(ld, "sharding", None) is None:
                    ld.sharding = self.data_sharding

        n_train = len(train_loader.dataset)
        n_val = len(val_loader.dataset)
        # multi-host: every process runs this loop over ITS shard of each
        # epoch's indices; batches are assembled into global arrays by
        # loader._put and metric outputs come back replicated, so all hosts
        # compute identical history rows.  Only process 0 writes artifacts.
        nproc = jax.process_count()
        pid = jax.process_index()
        is_main = pid == 0
        history = []
        for epoch in range(start_epoch, self.max_epochs):
            t0 = time.time()
            lr = self.lr_fn(epoch)
            epoch_rng = jax.random.fold_in(jax.random.key(self.seed), epoch)
            if sampler is not None:
                train_idx = sampler.epoch_indices(epoch, host_id=pid,
                                                  num_hosts=nproc)
            else:
                train_idx = np.random.default_rng((self.seed, epoch)).permutation(n_train)
                train_idx = host_shard(train_idx, pid, nproc)
            val_idx = host_shard(np.arange(n_val), pid, nproc)

            train_m = self._run_epoch_train(train_loader, train_idx, lr, epoch_rng)
            val_m = self._run_epoch_eval(val_loader, val_idx)

            row = {f"train_{_short(k)}": v for k, v in train_m.items()}
            row.update({f"val_{_short(k)}": v for k, v in val_m.items()})
            row["lr"] = lr
            row["epoch_time_s"] = time.time() - t0
            if is_main and (epoch % self.log_every == 0
                            or epoch == self.max_epochs - 1):
                self.logger.log_metrics(row, epoch)
            history.append(row)

            if self.plateau is not None:
                self.plateau.step(row["val_loss"])
            # step the patience counter BEFORE the checkpoint snapshot (like
            # plateau) so a resumed run doesn't lose this epoch's tick
            stop = (self.early_stopping is not None and
                    self.early_stopping.step(row[self.early_stopping.monitor]))
            want_latest = self.latest is not None and (
                epoch % self.latest_every == self.latest_every - 1
                or epoch == self.max_epochs - 1 or stop)
            if self.checkpoint is not None or want_latest:
                # fetch the state to host ONCE per epoch — a full-size
                # device_get is ~3 GB over the host link, and both managers
                # save the same snapshot.  Under multi-host the fetch is a
                # collective (all-gather of TP shards), so every process
                # participates; only process 0 writes files.
                host_state = self._host_snapshot(epoch)
                if is_main:
                    if self.checkpoint is not None:
                        self.checkpoint.save(epoch, row[self.checkpoint_monitor],
                                             host_state)
                    if want_latest:
                        self.latest.save(self.global_step, host_state)
            if verbose and is_main:
                print(f"epoch {epoch:3d}  lr {lr:.2e}  "
                      f"train_loss {row['train_loss']:.4f}  "
                      f"val_loss {row['val_loss']:.4f}  "
                      f"val_acc {row['val_acc']:.3f}  "
                      f"({row['epoch_time_s']:.1f}s)")
            if stop:
                break
        self.logger.finalize()
        from .checkpoint import wait_for_writes

        wait_for_writes()  # flush async checkpoint writes before returning
        return history

    def test(self, test_loader):
        """Collect logits/targets over a loader (reference test hooks,
        model_cross.py:294-308)."""
        logits, targets = [], []
        n = len(test_loader.dataset)
        for imgs, labels in test_loader(np.arange(n)):
            if self.stateful:
                aux = self.eval_step(self.params, self.model_state, imgs, labels)
            else:
                aux = self.eval_step(self.params, imgs, labels)
            logits.append(np.asarray(aux["logits"]))
            targets.append(np.asarray(aux["labels"]))
        return np.concatenate(logits), np.concatenate(targets)

    def predict(self, loader, probabilities: bool = True):
        """Inference over a loader: softmax positive-class probabilities (or
        raw logits) + ids — the legacy manual-trainer predict() capability
        (reference other_model.py:454-503, sigmoid over its single logit)."""
        logits, _ = self.test(loader)
        if not probabilities:
            return logits
        if logits.ndim == 1:  # single-logit BCE heads
            return 1.0 / (1.0 + np.exp(-logits))
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return (e / e.sum(axis=1, keepdims=True))[:, 1]


def host_shard(indices: np.ndarray, pid: int, nproc: int) -> np.ndarray:
    """This process's contiguous share of an epoch's index order.

    Pads by wrap-around so every process yields the SAME number of
    equally-sized batches (unequal counts would deadlock the collective
    batch assembly) — the torch DistributedSampler convention the
    reference inherits from Lightning DDP (SURVEY.md §2.3 caveat)."""
    if nproc <= 1:
        return indices
    share = -(-len(indices) // nproc)  # ceil
    padded = np.resize(indices, share * nproc)
    return padded[pid * share:(pid + 1) * share]


_SHORT = {"accuracy": "acc", "precision": "prec", "recall": "rec",
          "specificity": "spec", "f1_score": "f1", "npv": "npv",
          "loss": "loss", "auc_roc": "auc_roc"}


def _short(k: str) -> str:
    return _SHORT.get(k, k)
