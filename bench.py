"""End-to-end benchmark: NIfTI → logits volumes/sec/chip (BASELINE.md north star).

Measures the flagship pipeline on the real chip — host gunzip+decode+crop
(no cache, honest steady state) overlapped with the jitted bf16 ModelCross
forward — over the 6-subject ucsf-data cohort, 3 modalities each.

`vs_baseline` is the speedup over the PyTorch reference model's forward on
this host's CPU (the reference stack has no published numbers, SURVEY.md §6;
CPU-reference throughput is the driver-specified denominator).  The CPU
measurement is cached in bench_cpu_baseline.json because it is slow and
stable.

Prints ONE JSON line:
  {"metric": ..., "value": vol/s, "unit": ..., "vs_baseline": ratio, ...extras}
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

UCSF = "/root/reference/ucsf-data"
LABELS = "/root/reference/labels.csv"
CPU_CACHE = Path(__file__).parent / "bench_cpu_baseline.json"
MODALITIES = ("DWI", "SWI", "ASL")  # live grid params_list1 (main_mist.py:71)
REPEATS = 5


def _live_cfg():
    from cross_attention_vit_tpu.configs import (Params, get_mgmt_cross_config,
                                                 modify_config)

    p = Params(lr=1e-4, dropout=0.25, attn_order={"0": "1", "1": "2", "2": "0"},
               optim_params={"T_max": 250, "eta_min": 1e-6}, weight_decay=5e-4,
               img_types=MODALITIES, label_smoothing=0.0, img_aug=True)
    cfg = get_mgmt_cross_config()
    modify_config(cfg, p)
    modify_config(cfg, {"num_modalities": len(MODALITIES)})
    return cfg


def _cohort():
    import pandas as pd

    from cross_attention_vit_tpu.data.labels import clean_data, load_labels

    df = clean_data(load_labels(LABELS), "MGMT status")
    bundled = ["UCSF-PDGM-0085", "UCSF-PDGM-0279", "UCSF-PDGM-0381",
               "UCSF-PDGM-0392", "UCSF-PDGM-0451", "UCSF-PDGM-0516"]
    df = df[df["ID"].isin(bundled)].reset_index(drop=True)
    assert len(df) == 6, len(df)
    return df


def bench_tpu(cfg, df) -> tuple[float, float]:
    """Returns (volumes_per_sec_e2e, p50_latency_ms_per_volume)."""
    import jax

    from cross_attention_vit_tpu.data.dataset import BrainDataset
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.models import model_cross

    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True
    params = model_cross.init(jax.random.key(0), cfg)
    fwd = jax.jit(lambda p, x: model_cross.apply(p, cfg, x, train=False))

    ds = BrainDataset(df, cfg, types=MODALITIES, is_train=False, folder=UCSF,
                      cache=False)
    loader = PrefetchLoader(ds, batch_size=6, num_workers=8, prefetch=3)

    # warmup: compile + touch every file once
    for imgs, _ in loader(np.arange(6)):
        jax.block_until_ready(fwd(params, imgs))

    # steady state: three measurement windows of REPEATS cohort passes each,
    # decode included (no cache); report the median window — the shared-vCPU
    # host + loopback relay make single windows noisy by up to ±50%.
    rates = []
    for _ in range(3):
        idx = np.tile(np.arange(6), REPEATS)
        t0 = time.perf_counter()
        n = 0
        last = None
        for imgs, _ in loader(idx):
            last = fwd(params, imgs)  # async dispatch; decode overlaps compute
            n += imgs.shape[0]
        jax.block_until_ready(last)
        rates.append(n / (time.perf_counter() - t0))
    vols_per_sec = float(np.median(rates))

    # p50 per-volume latency: single subject end to end (decode 3 vols + fwd)
    lat = []
    for r in range(2 * len(df)):
        i = r % len(df)
        t0 = time.perf_counter()
        imgs, label = ds[i]
        jax.block_until_ready(fwd(params, imgs[None]))
        lat.append((time.perf_counter() - t0) * 1000)
    return vols_per_sec, float(np.percentile(lat, 50))


def bench_cpu_reference(cfg, df) -> float:
    """PyTorch reference-model forward throughput on this host's CPU
    (volumes/sec, batch 1, eval mode, float32).  Cached across runs."""
    if CPU_CACHE.exists():
        cached = json.loads(CPU_CACHE.read_text())
        if cached.get("modalities") == list(MODALITIES):
            return cached["volumes_per_sec"]

    import torch

    from cross_attention_vit_tpu.data.dataset import BrainDataset

    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    import torch_oracle

    torch_oracle.DTYPE = torch.float32  # fair CPU baseline precision

    import jax

    params = jax.tree.map(
        np.asarray,
        __import__("cross_attention_vit_tpu.models.model_cross",
                   fromlist=["init"]).init(jax.random.key(0), cfg))

    ds = BrainDataset(df, cfg, types=MODALITIES, is_train=False, folder=UCSF)
    img, _ = ds[0]
    img = img[None]

    with torch.no_grad():
        torch_oracle.cross_forward(params, cfg, img)  # warmup
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            torch_oracle.cross_forward(params, cfg, img)
        dt = time.perf_counter() - t0
    vps = reps / dt
    CPU_CACHE.write_text(json.dumps(
        {"volumes_per_sec": vps, "modalities": list(MODALITIES),
         "note": "torch float32 reference-math forward, batch 1, host CPU"}))
    return vps


def main():
    cfg = _live_cfg()
    df = _cohort()
    vps, p50 = bench_tpu(cfg, df)
    cpu_vps = bench_cpu_reference(cfg, df)
    print(json.dumps({
        "metric": "e2e_volumes_per_sec_per_chip",
        "value": round(vps, 3),
        "unit": "subject-volumes/s (NIfTI->logits, 3 modalities/volume)",
        "vs_baseline": round(vps / cpu_vps, 2),
        "p50_latency_ms": round(p50, 1),
        "cpu_reference_volumes_per_sec": round(cpu_vps, 4),
        "config": "ModelCross 3-stream live grid, bf16, batch 6",
    }))


if __name__ == "__main__":
    main()
