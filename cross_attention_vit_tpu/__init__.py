"""cross_attention_vit_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multi-modal 3D brain-MRI classification.

Re-designed from scratch with the capabilities of the PyTorch research codebase
``vsahni3/cross-attention-ViT`` (see SURVEY.md): NIfTI ingest, on-device
preprocessing/augmentation, single-stream 3D ViT (``models.model_vit``) and
CLS-token cross-attention fusion (``models.model_cross``) plus the legacy model
families, a functional training runtime (Adam + cosine schedule, confusion-count
metrics, AUROC, top-k checkpointing, CSV/TensorBoard logging), and mesh-based
data/tensor parallelism over ICI instead of NCCL/DDP.

Layout:
    configs/   frozen-ish config objects + Params-grid overlay merge
    data/      NIfTI-1 reader, labels hygiene, pad/crop, augmentations, loader
    ops/       patchify, attention, layers, losses, inits (pure functions)
    models/    init/apply model cores (ModelVIT, ModelCross, legacy families)
    train/     train/eval steps, optimizer, schedule, metrics, checkpoints, logs
    parallel/  Mesh construction + sharding rules (DP/TP), multi-host init
    kernels/   Pallas TPU kernels (fused flash attention)
    drivers/   experiment-grid entry points mirroring main_mist.py
"""

__version__ = "0.1.0"
