"""Reproduce and explain docs/RUN_r02.md's epoch-0 `val_loss 0.0000`.

Replicates the r02 flagship drive's exact configuration (live grid 0:
3-stream ModelCross, dropout 0.25, label_smoothing 0, bf16 compute, flash
attention, device augmentation, seed 2004, batch 3, 6-subject cohort,
15%/18% splits) for ONE epoch, then prints the val volume's raw logits and
the f32 cross-entropy at full precision — plus the margin→loss map that
turns a logit margin into the displayed 4-decimal value.

Run (real TPU): python benchmarks/valloss_probe.py
"""

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

UCSF = "/root/reference/ucsf-data"
LABELS = "/root/reference/labels.csv"


def main():
    from cross_attention_vit_tpu.utils import enable_compilation_cache

    enable_compilation_cache(str(ROOT / ".bench_jit_cache"))

    import jax
    import jax.numpy as jnp
    from sklearn.model_selection import train_test_split

    from cross_attention_vit_tpu.configs import (get_mgmt_cross_config,
                                                 modify_config)
    from cross_attention_vit_tpu.data.dataset import (BrainDataset,
                                                      WeightedRandomSampler,
                                                      create_sampler_weights)
    from cross_attention_vit_tpu.data.labels import clean_data, load_labels
    from cross_attention_vit_tpu.data.loader import PrefetchLoader
    from cross_attention_vit_tpu.drivers.experiments import (filter_available,
                                                             params_list1)
    from cross_attention_vit_tpu.models import model_cross
    from cross_attention_vit_tpu.train.trainer import Trainer

    seed = 2004
    params = params_list1[0]
    big = filter_available(clean_data(load_labels(LABELS), "MGMT status"), UCSF)
    data, _test = train_test_split(big, test_size=0.15, random_state=seed)
    train_df, val_df = train_test_split(data, test_size=0.18, random_state=seed)
    print(f"train {list(train_df['ID'])} val {list(val_df['ID'])}")

    cfg = get_mgmt_cross_config()
    modify_config(cfg, params)
    modify_config(cfg, {"num_modalities": len(params.img_types)})
    cfg.compute_dtype = "bfloat16"
    cfg.use_flash_attention = True

    train_ds = BrainDataset(train_df, cfg, types=params.img_types,
                            is_train=True, folder=UCSF)
    val_ds = BrainDataset(val_df, cfg, types=params.img_types,
                          is_train=False, folder=UCSF)
    train_loader = PrefetchLoader(train_ds, batch_size=3, num_workers=4)
    val_loader = PrefetchLoader(val_ds, batch_size=3, num_workers=4)

    sampler = WeightedRandomSampler(
        create_sampler_weights(train_df, cfg.target),
        num_samples=len(train_df), seed=seed)

    trainer = Trainer(model_cross, cfg, max_epochs=1, seed=seed)
    hist = trainer.fit(train_loader, val_loader, sampler=sampler,
                       verbose=False)
    print("epoch-0 row:", {k: hist[0][k] for k in
                           ("train_loss", "val_loss")})
    print(f"epoch-0 val_loss full precision: {hist[0]['val_loss']!r}")

    # raw val logits after epoch 0
    logits, targets = trainer.test(val_loader)
    print("val logits:", logits.tolist(), "targets:", targets.tolist())
    m = np.abs(logits[:, 1] - logits[:, 0])
    print("margins:", m.tolist())

    # the margin→displayed-loss map (all f32, like ops/losses.py)
    print("\nf32 log1p(exp(-m)) for margins:")
    for mm in [5, 10, 17, 25, 88, 104]:
        v = np.log1p(np.exp(np.float32(-mm), dtype=np.float32))
        print(f"  m={mm:4d} -> loss={v!r}  (prints {v:.4f})")


if __name__ == "__main__":
    main()
