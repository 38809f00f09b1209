"""Analytic matmul-FLOP counts for the live models — the numerator of MFU.

Counts multiply-accumulates ×2 for every GEMM on the forward path (elementwise
ops, softmax and LayerNorm are bandwidth-, not FLOP-, dominated and are
excluded, per the usual MFU convention).  Training steps are counted as
3× forward (backward ≈ 2× forward for matmul-dominated graphs).

Reference geometry being costed: model_cross.py:186-212 / modelv3.py:123-147.
"""

from __future__ import annotations


def _patches(cfg) -> int:
    return ((cfg.img_size[0] // cfg.patch_size[0])
            * (cfg.img_size[1] // cfg.patch_size[1])
            * (cfg.img_size[2] // cfg.patch_size[2]))


def _self_block_flops(n: int, d: int, mlp: int) -> int:
    """One pre-norm self-attention block over an n-token stream."""
    qkv = 2 * n * d * 3 * d
    scores = 2 * n * n * d          # QKᵀ over all heads
    av = 2 * n * n * d
    out = 2 * n * d * d
    ffn = 2 * n * d * mlp * 2
    return qkv + scores + av + out + ffn


def _cross_block_flops(n: int, d: int, mlp: int) -> int:
    """CLS-query cross-attention block: q is 1 token, k/v span n tokens
    (reference model_cross.py:74-114)."""
    wq = 2 * 1 * d * d
    wkv = 2 * n * d * d * 2
    scores = 2 * 1 * n * d
    av = 2 * 1 * n * d
    proj = 2 * 1 * d * d
    ffn = 2 * 1 * d * mlp * 2
    return wq + wkv + scores + av + proj + ffn


def model_cross_fwd_flops(cfg, batch: int) -> int:
    """Forward matmul FLOPs of ModelCross for one batch."""
    m = cfg.num_modalities
    n_p = _patches(cfg)
    n = n_p + 1  # + CLS
    d, mlp = cfg.hidden_dim, cfg.mlp_dim
    p1, p2, p3 = cfg.patch_size
    patch_dim = p1 * p2 * p3 * cfg.in_channels

    embed = m * 2 * n_p * patch_dim * d
    n_self = cfg.num_multi_blocks * m * cfg.num_self_blocks
    n_cross = cfg.num_multi_blocks * len(cfg.attn_order)
    blocks = (n_self * _self_block_flops(n, d, mlp)
              + n_cross * _cross_block_flops(n, d, mlp))
    heads = m * 2 * (d * mlp + mlp * cfg.num_classes)  # per-modality CLS MLP
    return batch * (embed + blocks + heads)


def model_vit_fwd_flops(cfg, batch: int) -> int:
    """Forward matmul FLOPs of ModelVIT: one concatenated stream of
    num_patches·M + 1 tokens through num_layers blocks (modelv3.py:123-147)."""
    m = cfg.num_modalities
    n_p = _patches(cfg)
    n = n_p * m + 1
    d, mlp = cfg.hidden_dim, cfg.mlp_dim
    p1, p2, p3 = cfg.patch_size
    patch_dim = p1 * p2 * p3 * cfg.in_channels

    embed = m * 2 * n_p * patch_dim * d
    blocks = cfg.num_layers * _self_block_flops(n, d, mlp)
    head = 2 * (d * mlp + mlp * cfg.num_classes)
    return batch * (embed + blocks + head)


def train_flops(fwd_flops: int) -> int:
    """fwd + bwd ≈ 3× fwd for GEMM-dominated graphs (bwd does two matmuls
    per forward matmul); the Adam update is elementwise and excluded."""
    return 3 * fwd_flops


# bf16 peak matmul throughput per chip, FLOP/s (public spec sheets)
_PEAK_BF16 = (
    ("v6", 918e12),       # Trillium
    ("v5p", 459e12),
    ("v5", 197e12),       # v5e / "TPU v5 lite"
    ("v4", 275e12),
)


def chip_peak_bf16_flops(device=None) -> float:
    """Peak bf16 FLOP/s of the attached chip, from device_kind."""
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for tag, peak in _PEAK_BF16:
        if tag in kind:
            return peak
    return 197e12  # assume v5e when unrecognized


def mfu(flops_per_step: int, step_seconds: float, device=None) -> float:
    return flops_per_step / step_seconds / chip_peak_bf16_flops(device)
