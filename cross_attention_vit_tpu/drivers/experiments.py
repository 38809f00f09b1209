"""Experiment drivers — the main_mist.py equivalents.

Reproduces the live driver's behavior (reference main_mist.py):
  * the Params hyperparameter grids (main_mist.py:69-79, same values);
  * `train_full`: 4 test seeds × {ModelCross, ModelVIT} × grid; 15% test
    split then 18% val split with the same seed (:167, :182); weighted
    sampler; top-10 val_loss checkpoints with run-tagged filenames
    (:174-180); TensorBoard+CSV loggers (:183-184); config mutated in place
    across grid points via modify_config (:186-188 — preserved, quirk and
    all);
  * `train_cv`: the StratifiedKFold variant (:84-149).  The reference's
    version crashes on undefined names (:94-95, :106); this one implements
    its evident intent and is tested.

Unlike the reference (which trains at import, main_mist.py:222), these are
functions with a __main__ guard and flags.  `devices`/`num_nodes` become a
Mesh: DP over all local devices by default; multi-host via
parallel.multihost_init.
"""

from __future__ import annotations

from pathlib import Path


from ..configs import Params, get_mgmt_config, get_mgmt_cross_config, modify_config
from ..data.dataset import BrainDataset, WeightedRandomSampler, create_sampler_weights
from ..data.labels import clean_data, load_labels
from ..data.loader import PrefetchLoader, transfer_dtype_for
from ..models import model_cross, model_vit
from ..train.checkpoint import CheckpointManager, LatestCheckpointer
from ..train.loggers import CSVLogger, MultiLogger, TensorBoardLogger
from ..train.trainer import Trainer

MODS = ["DWI", "SWI", "T1c", "brain_parenchyma_segmentation",
        "tumor_segmentation", "T2", "ADC", "ASL", "FLAIR"]

# the live grids (reference main_mist.py:69-79)
params_list1 = [
    Params(lr=1e-4, dropout=0.25, attn_order={"0": "1", "1": "2", "2": "0"},
           optim_params={"T_max": 250, "eta_min": 1e-6}, weight_decay=5e-4,
           img_types=(MODS[0], MODS[1], MODS[7]), label_smoothing=0.0,
           img_aug=True),
    Params(lr=1e-4, dropout=0.2, attn_order={"0": "1", "1": "2"},
           optim_params={"T_max": 250, "eta_min": 1e-6}, weight_decay=5e-4,
           img_types=(MODS[0], MODS[1], MODS[7]), label_smoothing=0.0,
           img_aug=True),
]

params_list2 = [
    Params(lr=1e-4, dropout=0.1, attn_order={},
           optim_params={"T_max": 150, "eta_min": 1e-6}, weight_decay=5e-4,
           img_types=(MODS[1], MODS[0]), label_smoothing=0.0, img_aug=False),
    Params(lr=1e-4, dropout=0.1, attn_order={},
           optim_params={"T_max": 150, "eta_min": 1e-6}, weight_decay=5e-4,
           img_types=(MODS[1], MODS[0]), label_smoothing=0.0, img_aug=True),
]

_MODELS = [model_cross, model_vit]
_CONFIG_FACTORIES = [get_mgmt_cross_config, get_mgmt_config]


def filter_available(data, folder) -> "object":
    """Keep only subjects whose NIfTI folder exists on disk — the labels CSV
    covers the full 501-subject cohort while a checkout may bundle a subset
    (6 subjects here).  The reference crashes mid-epoch in that situation."""
    mask = data["ID"].apply(lambda c: (Path(folder) / f"{c}_nifti").is_dir())
    return data[mask]


def _run_one(model_module, cur_config, params, train_df, val_df, *, folder,
             out_dir, run_name, max_epochs, batch_size, seed, verbose,
             mesh=None, latest_every=5, fsdp=False, grad_accum=1,
             accum_impl="scan", early_stop_patience=0,
             early_stop_min_delta=0.0):
    out = Path(out_dir)
    checkpoint = CheckpointManager(out / "checkpoints" / "cross",
                                   monitor="val_loss", save_top_k=10,
                                   mode="min", tag=run_name, async_write=True,
                                   config=cur_config)
    latest = LatestCheckpointer(out / "latest" / run_name, async_write=True)
    # resume intent == a rolling checkpoint exists for this run name; only
    # then does the CSV logger inherit prior rows (a fresh run reusing the
    # dir starts a fresh metrics.csv)
    resuming = latest.latest_step() is not None
    logger = MultiLogger(
        TensorBoardLogger(out / "lightning_logs" / "cross", run_name),
        CSVLogger(out / "csv_logs" / "cross", run_name, resume=resuming))

    sampler = WeightedRandomSampler(
        create_sampler_weights(train_df, cur_config.target),
        num_samples=len(train_df), seed=seed)

    # disk cache: decode each volume once per cohort instead of once per
    # epoch×run; scales past RAM unlike the in-memory cache (501 subjects
    # × modalities ≈ 6 GB decoded)
    vol_cache = str(out / "vol_cache")
    train_ds = BrainDataset(train_df, cur_config, types=params.img_types,
                            is_train=True, folder=folder, cache=False,
                            disk_cache=vol_cache)
    val_ds = BrainDataset(val_df, cur_config, types=params.img_types,
                          is_train=False, folder=folder, cache=False,
                          disk_cache=vol_cache)
    td = transfer_dtype_for(cur_config)
    train_loader = PrefetchLoader(train_ds, batch_size=batch_size, num_workers=5,
                                  transfer_dtype=td)
    val_loader = PrefetchLoader(val_ds, batch_size=batch_size, num_workers=5,
                                transfer_dtype=td)

    from ..ops.layers import apply_config_knobs

    apply_config_knobs(cur_config)  # --set gelu_approx=True etc.
    early = None
    if early_stop_patience > 0:
        from ..train.trainer import EarlyStopping

        early = EarlyStopping(monitor="val_loss", patience=early_stop_patience,
                              min_delta=early_stop_min_delta, verbose=verbose)
    trainer = Trainer(model_module, cur_config, max_epochs=max_epochs,
                      logger=logger, checkpoint=checkpoint, latest=latest,
                      seed=seed, latest_every=latest_every, mesh=mesh,
                      fsdp=fsdp, grad_accum=grad_accum, accum_impl=accum_impl,
                      early_stopping=early)
    history = trainer.fit(train_loader, val_loader, sampler=sampler,
                          verbose=verbose)
    return trainer, history


def train_full(params_big=None, *, labels_csv="labels.csv", folder="ucsf-data",
               out_dir="runs", run=200, test_seeds=(2004, 4444, 9780, 7564),
               max_epochs=250, batch_size=8, verbose=True, overrides=None,
               only_available=False, mesh=None, latest_every=5,
               fsdp=False, grad_accum=1, accum_impl="scan",
               early_stop_patience=0, early_stop_min_delta=0.0):
    """The live driver (reference main_mist.py:156-219).

    mesh: a parallel.make_mesh ('data','model') Mesh — the replacement for
    the reference's `Trainer(devices=4, num_nodes=2)` (main_mist.py:216-217).
    batch_size is per process: the global batch under a single-process mesh;
    under multi-host the global batch is batch_size × process_count (the
    reference's 8/rank × 8 ranks semantics)."""
    from sklearn.model_selection import train_test_split

    params_big = params_big or [params_list1, params_list2]
    big_data = clean_data(load_labels(labels_csv), "MGMT status")
    if only_available:
        big_data = filter_available(big_data, folder)

    results = {}
    for r, seed in enumerate(test_seeds):
        data, test_df = train_test_split(big_data, test_size=0.15,
                                         random_state=seed)
        for m, (model_module, factory) in enumerate(zip(_MODELS,
                                                        _CONFIG_FACTORIES)):
            cur_config = factory()
            for i, params in enumerate(params_big[m]):
                # .18 * .85 ≈ .15 (reference comment, main_mist.py:181)
                train_df, val_df = train_test_split(data, test_size=0.18,
                                                    random_state=seed)
                modify_config(cur_config, params)
                modify_config(cur_config,
                              {"num_modalities": len(params.img_types)})
                if overrides:
                    modify_config(cur_config, overrides)
                run_name = f"test_{run}_{r}_{m}_{i}"
                trainer, history = _run_one(
                    model_module, cur_config, params, train_df, val_df,
                    folder=folder, out_dir=out_dir, run_name=run_name,
                    max_epochs=max_epochs, batch_size=batch_size, seed=seed,
                    verbose=verbose, mesh=mesh, latest_every=latest_every,
                    fsdp=fsdp, grad_accum=grad_accum, accum_impl=accum_impl,
                    early_stop_patience=early_stop_patience,
                    early_stop_min_delta=early_stop_min_delta)
                results[run_name] = history
    return results


def train_cv(params_big=None, *, labels_csv="labels.csv", folder="ucsf-data",
             out_dir="runs", run=145, test_seed=6969, cv_seeds=(6253, 9253),
             k: int = 5, max_epochs=250, batch_size=8, verbose=True,
             overrides=None, only_available=False, mesh=None, fsdp=False,
             grad_accum=1, accum_impl="scan"):
    """Stratified k-fold variant (reference main_mist.py:84-149, repaired)."""
    from sklearn.model_selection import StratifiedKFold, train_test_split

    params_big = params_big or [params_list1, params_list2]
    big_data = clean_data(load_labels(labels_csv), "MGMT status")
    if only_available:
        big_data = filter_available(big_data, folder)
    data, _test_df = train_test_split(big_data, test_size=0.15,
                                      random_state=test_seed)

    results = {}
    for r, cv_seed in enumerate(cv_seeds):
        for m, (model_module, factory) in enumerate(zip(_MODELS,
                                                        _CONFIG_FACTORIES)):
            cur_config = factory()
            kfold = StratifiedKFold(n_splits=k, shuffle=True,
                                    random_state=cv_seed)
            for i, params in enumerate(params_big[m]):
                modify_config(cur_config, params)
                modify_config(cur_config,
                              {"num_modalities": len(params.img_types)})
                if overrides:
                    modify_config(cur_config, overrides)
                splits = kfold.split(data, data[cur_config.target])
                for fold, (train_idx, val_idx) in enumerate(splits):
                    run_name = f"{run}_{i}_{fold}_{m}_{r}"
                    trainer, history = _run_one(
                        model_module, cur_config, params,
                        data.iloc[train_idx], data.iloc[val_idx],
                        folder=folder, out_dir=out_dir, run_name=run_name,
                        max_epochs=max_epochs, batch_size=batch_size,
                        seed=cv_seed, verbose=verbose, mesh=mesh,
                        fsdp=fsdp, grad_accum=grad_accum,
                        accum_impl=accum_impl)
                    results[run_name] = history
    return results


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="cross_attention_vit_tpu trainer")
    p.add_argument("--mode", choices=["full", "cv"], default="full")
    p.add_argument("--labels", default="/root/reference/labels.csv")
    p.add_argument("--data", default="/root/reference/ucsf-data")
    p.add_argument("--out", default="runs")
    p.add_argument("--epochs", type=int, default=250)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seeds", type=int, nargs="*", default=None,
                   help="test seeds (default: the reference's 4 seeds)")
    p.add_argument("--grid-index", type=int, default=None,
                   help="run only this grid point of each params list")
    p.add_argument("--model", choices=["cross", "vit", "both"], default="both")
    p.add_argument("--only-available", action="store_true",
                   help="drop labels rows whose volumes are not on disk")
    # distribution — the reference's `devices=4, num_nodes=2`
    # (main_mist.py:216-217) as mesh axes + multi-host runtime init
    p.add_argument("--dp", type=int, default=-1,
                   help="data-parallel mesh axis; -1 = all remaining devices "
                        "(default), 0 = no mesh (single device, unsharded)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh axis (must divide num_heads)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline mesh axis (pair with "
                        "--set pipeline_stages=N on ModelVIT runs; "
                        "parallel/pipeline.py)")
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel mesh axis: exact ring attention "
                        "over 'seq' (sets config seq_parallel to match; "
                        "parallel/ring.py)")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel mesh axis (pair with "
                        "--set moe_experts=E — trunk FFNs become GShard "
                        "MoEs on both models; must divide E; "
                        "parallel/moe.py)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + Adam moments over the 'data' axis "
                        "(ZeRO/FSDP; see parallel/sharding.py)")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="microbatches accumulated per optimizer step "
                        "(batch-size must be divisible by it)")
    p.add_argument("--accum-impl", choices=["scan", "unroll"], default="scan",
                   help="microbatch loop form: lax.scan (default) or "
                        "unrolled (use on relayed TPU runtimes, where "
                        "while-loop iterations pay host round-trips)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port "
                        "(auto-detected on Cloud TPU)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache")
    p.add_argument("--set", dest="sets", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="config override, e.g. --set remat=True "
                        "--set compute_dtype=bfloat16 (python-literal values)")
    p.add_argument("--latest-every", type=int, default=5,
                   help="rolling resume-checkpoint cadence in epochs")
    p.add_argument("--early-stop-patience", type=int, default=0,
                   help="stop a run after this many epochs without val_loss "
                        "improvement (0 = off; the capability the reference "
                        "comments out, main_mist.py:36-42)")
    p.add_argument("--early-stop-min-delta", type=float, default=0.0)
    args = p.parse_args(argv)

    overrides = {}
    for kv in args.sets:
        key, _, value = kv.partition("=")
        if not _:
            raise SystemExit(f"--set expects KEY=VALUE, got {kv!r}")
        import ast

        try:
            overrides[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            overrides[key] = value  # bare strings allowed

    if args.coordinator or args.num_processes:
        from ..parallel import multihost_init

        multihost_init(args.coordinator, args.num_processes, args.process_id)

    if not args.no_compile_cache:
        from ..utils import enable_compilation_cache

        enable_compilation_cache(str(Path(args.out) / "jit_cache"))

    mesh = None
    if args.dp != 0:
        from ..parallel import make_mesh

        mesh = make_mesh(args.dp, args.tp, pipe=args.pp, seq=args.sp,
                         expert=args.ep)
    elif args.sp > 1 or args.ep > 1:
        raise SystemExit("--sp/--ep require a mesh (don't pass --dp 0)")
    if args.sp > 1:
        # the mesh axis is the source of truth; the config knob routes the
        # models' attention through the ring (ops/attention.attention_impl)
        overrides.setdefault("seq_parallel", args.sp)

    grids = [list(params_list1), list(params_list2)]
    if args.grid_index is not None:
        grids = [[g[args.grid_index]] for g in grids]
    if args.model != "both":
        keep = 0 if args.model == "cross" else 1
        grids = [g if m == keep else [] for m, g in enumerate(grids)]

    if args.fsdp and mesh is None:
        raise SystemExit("--fsdp requires a mesh (don't pass --dp 0)")
    kwargs = dict(labels_csv=args.labels, folder=args.data, out_dir=args.out,
                  max_epochs=args.epochs, batch_size=args.batch_size,
                  only_available=args.only_available, mesh=mesh,
                  overrides=overrides or None, fsdp=args.fsdp,
                  grad_accum=args.grad_accum, accum_impl=args.accum_impl)
    if args.mode == "full":
        kwargs["latest_every"] = args.latest_every
        kwargs["early_stop_patience"] = args.early_stop_patience
        kwargs["early_stop_min_delta"] = args.early_stop_min_delta
    if args.mode == "full":
        if args.seeds:
            kwargs["test_seeds"] = tuple(args.seeds)
        return train_full(grids, **kwargs)
    return train_cv(grids, **kwargs)


if __name__ == "__main__":
    main()
