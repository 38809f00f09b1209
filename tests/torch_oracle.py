"""Independent PyTorch oracle for parity tests.

Computes the reference models' forward math (eval mode, fp32/fp64) directly
with torch functional ops on OUR param pytrees, so JAX outputs can be checked
against torch numerics without importing (or copying) the reference code.
The math follows SURVEY.md §2.2's contract; einops patterns are the exact
strings the reference uses (model_cross.py:193), which pins token ordering.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from einops import rearrange


# Oracle precision: float64 for parity tests; bench.py flips this to float32
# for a fair CPU-throughput baseline.
DTYPE = torch.float64
# 'none' = torch nn.GELU() default (exact erf); 'tanh' mirrors the framework's
# ops.layers.GELU_APPROX=True mode (torch nn.GELU(approximate='tanh'))
GELU_APPROXIMATE = "none"


def t(x, dtype=None) -> torch.Tensor:
    if isinstance(x, torch.Tensor):
        return x.to(dtype or DTYPE)  # pass-through keeps autograd intact
    return torch.from_numpy(np.asarray(x)).to(dtype or DTYPE)


# Framework attention kernels carry an explicit heads axis (layouts
# (H,3,K,D) / (H,K,D) / (K,D,H)); torch math uses the flattened 2-D weight.
# The heads axis is a pure reshape of the torch layout (see
# ops/initializers.py), so flattening recovers the torch weight exactly.


def linear_t(p: dict, x: torch.Tensor) -> torch.Tensor:
    kernel = t(p["kernel"])
    if kernel.ndim == 4:                 # fused qkv (H, 3, K, D)
        kernel = kernel.reshape(kernel.shape[0], -1)
    y = x @ kernel
    if "bias" in p:
        y = y + t(p["bias"]).reshape(-1)
    return y


def head_in_t(p: dict, x: torch.Tensor) -> torch.Tensor:
    """(H, K, D) kernel, (K, D) bias → torch Linear(H, H)."""
    k = t(p["kernel"])
    y = x @ k.reshape(k.shape[0], -1)
    if "bias" in p:
        y = y + t(p["bias"]).reshape(-1)
    return y


def head_out_t(p: dict, x: torch.Tensor) -> torch.Tensor:
    """(K, D, H) kernel → torch Linear(H, H) on merged-heads input."""
    k = t(p["kernel"])
    y = x @ k.reshape(-1, k.shape[-1])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def ln_t(p: dict, x: torch.Tensor, eps: float = 1e-5) -> torch.Tensor:
    return F.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


def ffn_t(p: dict, x: torch.Tensor) -> torch.Tensor:
    return linear_t(p["fc2"], F.gelu(linear_t(p["fc1"], x), approximate=GELU_APPROXIMATE))


def self_attn_t(p: dict, x: torch.Tensor, heads: int) -> torch.Tensor:
    qkv = linear_t(p["qkv"], x)
    q, k, v = qkv.chunk(3, dim=-1)
    q, k, v = (rearrange(z, "b n (h d) -> b h n d", h=heads) for z in (q, k, v))
    scale = q.shape[-1] ** -0.5
    attn = (q @ k.transpose(-1, -2) * scale).softmax(dim=-1)
    out = rearrange(attn @ v, "b h n d -> b n (h d)")
    # heads==1 → to_out = nn.Identity() (reference model_cross.py:37,45-48);
    # params then carry no "out"
    return head_out_t(p["out"], out) if "out" in p else out


def cross_attn_t(p: dict, x: torch.Tensor, heads: int) -> torch.Tensor:
    B, N, C = x.shape
    d = C // heads
    q = head_in_t(p["wq"], x[:, 0:1]).reshape(B, 1, heads, d).permute(0, 2, 1, 3)
    k = head_in_t(p["wk"], x).reshape(B, N, heads, d).permute(0, 2, 1, 3)
    v = head_in_t(p["wv"], x).reshape(B, N, heads, d).permute(0, 2, 1, 3)
    attn = (q @ k.transpose(-2, -1) * d ** -0.5).softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, 1, C)
    return head_out_t(p["proj"], out)


def self_block_t(p: dict, x: torch.Tensor, heads: int) -> torch.Tensor:
    x = self_attn_t(p["attn"], ln_t(p["attn_norm"], x), heads) + x
    x = ffn_t(p["ffn"], ln_t(p["ffn_norm"], x)) + x
    return x


def cross_block_t(p: dict, x: torch.Tensor, heads: int) -> torch.Tensor:
    x1 = cross_attn_t(p["attn"], ln_t(p["attn_norm"], x), heads) + x[:, 0:1]
    return ffn_t(p["ffn"], ln_t(p["ffn_norm"], x1)) + x1


def patchify_t(vol: torch.Tensor, patch: tuple[int, int, int]) -> torch.Tensor:
    p1, p2, p3 = patch
    return rearrange(vol, "b c (d p1) (h p2) (w p3) -> b (h w d) (p1 p2 p3 c)",
                     p1=p1, p2=p2, p3=p3)


def embed_stream_t(params: dict, vol: torch.Tensor, patch) -> torch.Tensor:
    x = linear_t(params["patch_to_embedding"], patchify_t(vol, patch))
    cls = t(params["cls_token"]).expand(x.shape[0], -1, -1)
    x = torch.cat([cls, x], dim=1)
    return x + t(params["pos_embedding"])


def cross_forward(params: dict, config, img: np.ndarray,
                  labels: np.ndarray | None = None, as_tensor: bool = False):
    """Eval-mode ModelCross forward (reference model_cross.py:186-212).

    as_tensor=True keeps the torch graph (params may be requires_grad
    tensors) — used by the training-dynamics parity harness."""
    imgt = t(img)
    M = imgt.shape[1]
    streams = [embed_stream_t(params, imgt[:, m], config.patch_size) for m in range(M)]

    for block in params["multi_blocks"]:
        attn = []
        for m in range(M):
            x = streams[m]
            for blk in block["self_blocks"][m]:
                x = self_block_t(blk, x, config.num_heads)
            attn.append(x)
        outs, cc = [], 0
        for i in range(M):
            if str(i) in config.attn_order:
                j = int(config.attn_order[str(i)])
                tmp = torch.cat([attn[i][:, 0:1], attn[j][:, 1:]], dim=1)
                tmp = cross_block_t(block["cross_blocks"][cc], tmp, config.num_heads)
                outs.append(torch.cat([tmp, attn[i][:, 1:]], dim=1))
                cc += 1
            else:
                outs.append(attn[i])
        streams = outs

    streams = [ln_t(params["norm"][i], streams[i]) for i in range(M)]
    logits = torch.stack([
        linear_t(params["mlp_head"][i]["fc2"],
                 F.gelu(linear_t(params["mlp_head"][i]["fc1"], streams[i][:, 0]),
                        approximate=GELU_APPROXIMATE))
        for i in range(M)
    ]).mean(dim=0)

    if labels is None:
        return logits.numpy()
    loss = F.cross_entropy(logits, torch.from_numpy(np.asarray(labels)).long(),
                           label_smoothing=config.label_smoothing)
    if as_tensor:
        return logits, loss
    return logits.detach().numpy(), loss.item()


def vit_forward(params: dict, config, img: np.ndarray,
                labels: np.ndarray | None = None, as_tensor: bool = False):
    """Eval-mode ModelVIT forward (reference modelv3.py:123-147).

    as_tensor=True keeps the torch graph (see cross_forward)."""
    imgt = t(img)
    M = imgt.shape[1]
    tokens = torch.cat([
        linear_t(params["patch_to_embedding"], patchify_t(imgt[:, m], config.patch_size))
        for m in range(M)
    ], dim=1)
    cls = t(params["cls_token"]).expand(tokens.shape[0], -1, -1)
    x = torch.cat([cls, tokens], dim=1) + t(params["pos_embedding"])

    for layer in params["layers"]:
        x = self_attn_t(layer["attn"], ln_t(layer["attn_norm"], x), config.num_heads) + x
        x = ffn_t(layer["ffn"], ln_t(layer["ffn_norm"], x)) + x

    h = params["head"]
    cls_out = ln_t(h["norm"], x[:, 0])
    logits = linear_t(h["fc2"], F.gelu(linear_t(h["fc1"], cls_out), approximate=GELU_APPROXIMATE))

    if labels is None:
        return logits.numpy()
    loss = F.cross_entropy(logits, torch.from_numpy(np.asarray(labels)).long())
    if as_tensor:
        return logits, loss
    return logits.detach().numpy(), loss.item()
