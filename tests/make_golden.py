"""Generate the golden-logit parity fixtures (tests/golden/*.npz).

Runs the float64 torch oracle (reference-exact math, validated against the
reference's torch semantics in test_ops/test_models_parity) at the FULL live
configs over the 6 bundled UCSF-PDGM subjects with fixed-seed framework
weights, and records the logits.  test_golden.py then holds the JAX float32
path to within the 1e-3 parity budget against these numbers, pinning
end-to-end behavior (NIfTI decode → pad/crop → model) across refactors.

Run me from tests/: python make_golden.py
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_platforms", "cpu")

import pandas as pd
import torch_oracle

from cross_attention_vit_tpu.configs import (get_mgmt_config,
                                             get_mgmt_cross_config,
                                             modify_config)
from cross_attention_vit_tpu.data.dataset import BrainDataset
from cross_attention_vit_tpu.data.labels import clean_data, load_labels
from cross_attention_vit_tpu.models import model_cross, model_vit

UCSF = "/root/reference/ucsf-data"
BUNDLED = ["UCSF-PDGM-0085", "UCSF-PDGM-0279", "UCSF-PDGM-0381",
           "UCSF-PDGM-0392", "UCSF-PDGM-0451", "UCSF-PDGM-0516"]
GOLDEN_DIR = Path(__file__).parent / "golden"
SEED = 42


def cohort_df():
    df = clean_data(load_labels("/root/reference/labels.csv"), "MGMT status")
    return df[df["ID"].isin(BUNDLED)].sort_values("ID").reset_index(drop=True)


def cross_live_config():
    cfg = get_mgmt_cross_config()
    modify_config(cfg, dict(num_modalities=3,
                            attn_order={"0": "1", "1": "2", "2": "0"},
                            dropout=0.25, lr=1e-4, weight_decay=5e-4,
                            label_smoothing=0.0,
                            optim_params={"T_max": 250, "eta_min": 1e-6}))
    return cfg, ("DWI", "SWI", "ASL")


def vit_live_config():
    cfg = get_mgmt_config()
    modify_config(cfg, dict(num_modalities=2, dropout=0.1, lr=1e-4,
                            weight_decay=5e-4, label_smoothing=0.0,
                            optim_params={"T_max": 150, "eta_min": 1e-6}))
    return cfg, ("SWI", "DWI")  # params_list2 modality order (main_mist.py:76)


def main():
    GOLDEN_DIR.mkdir(exist_ok=True)
    df = cohort_df()

    for name, model, (cfg, types), fwd in [
        ("cross_live", model_cross, cross_live_config(), torch_oracle.cross_forward),
        ("vit_live", model_vit, vit_live_config(), torch_oracle.vit_forward),
    ]:
        ds = BrainDataset(df, cfg, types=types, is_train=False, folder=UCSF)
        imgs, labels = ds.batch(range(len(ds)))
        params = jax.tree.map(np.asarray,
                              model.init(jax.random.key(SEED), cfg))
        logits = fwd(params, cfg, imgs)
        np.savez(GOLDEN_DIR / f"{name}.npz",
                 logits=np.asarray(logits, np.float64),
                 labels=labels,
                 subjects=np.asarray(df["ID"].tolist()),
                 seed=SEED)
        print(name, "logits:\n", np.asarray(logits))


if __name__ == "__main__":
    main()
