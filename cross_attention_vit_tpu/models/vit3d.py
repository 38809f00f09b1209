"""ViT3D — CNN-stem ViT with a torch-post-norm transformer (legacy family).

Capability parity with the reference's modelv2.py `ViT3D` (marked stale
there — config keys it needs are absent; here it runs):

  * CNN3DEncoder stem (modelv2.py:14-58): conv3(s1,p1)+BN+ReLU+pool ×2, then
    two strided conv3+BN+ReLU — ÷16 spatial, `hidden_dim` channels; tokens
    are channels at each spatial site, shared stem across modalities,
    per-modality token sequences concatenated (modelv2.py:197-210);
  * OR a DenseNet-121 stem truncated at a dotted layer path
    (modelv2.py:131-141; live path "features.denseblock3.denselayer24.layers.conv1");
  * optional CLS token; mean-pool head alternative (modelv2.py:231-236);
  * `nn.TransformerEncoder` semantics (modelv2.py:61-87): POST-norm blocks,
    fused-QKV-with-bias attention, ReLU feed-forward of width 4·embed,
    dropout on attention probs + both residual branches;
  * head LayerNorm → Linear(H, H/8) → Linear(H/8, classes) — two stacked
    Linears with no activation, as the reference has it (modelv2.py:168-172);
  * cross-entropy with label smoothing; ReduceLROnPlateau is the matching
    schedule (modelv2.py:280-292 — see train.schedule.ReduceLROnPlateau).

BatchNorm makes this model stateful: apply returns (logits, loss, new_state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops import initializers as init_ops
from ..ops.conv import batch_norm3d, batchnorm3d_params, conv3d, max_pool3d, relu
from ..ops.layers import RngStream, dropout, layernorm, linear, promote_input
from ..ops.losses import cross_entropy
from . import densenet

DENSENET_TRUNCATION = "features.denseblock3.denselayer24.layers.conv1"


# ---------------------------------------------------------------------------
# CNN3DEncoder stem
# ---------------------------------------------------------------------------

def _cnn_encoder_init(kg, in_channels: int, hidden: int):
    chans = [in_channels, hidden // 8, hidden // 4, hidden // 2, hidden]
    params, state = {}, {}
    for i in range(4):
        params[f"conv{i+1}"] = {
            "kernel": init_ops.xavier_uniform(
                kg(), (chans[i + 1], chans[i], 3, 3, 3),
                fan_in=chans[i] * 27, fan_out=chans[i + 1] * 27),
            "bias": init_ops.zeros((chans[i + 1],)),
        }
        bn_p, bn_s = batchnorm3d_params(chans[i + 1])
        params[f"bn{i+1}"] = bn_p
        state[f"bn{i+1}"] = bn_s
    return params, state


def _cnn_encoder_apply(p, s, x, train):
    ns = {}
    h = conv3d(p["conv1"], x, stride=1, padding=1)
    h, ns["bn1"] = batch_norm3d(p["bn1"], s["bn1"], h, train)
    h = max_pool3d(relu(h), 2)
    h = conv3d(p["conv2"], h, stride=1, padding=1)
    h, ns["bn2"] = batch_norm3d(p["bn2"], s["bn2"], h, train)
    h = max_pool3d(relu(h), 2)
    h = conv3d(p["conv3"], h, stride=2, padding=1)
    h, ns["bn3"] = batch_norm3d(p["bn3"], s["bn3"], h, train)
    h = relu(h)
    h = conv3d(p["conv4"], h, stride=2, padding=1)
    h, ns["bn4"] = batch_norm3d(p["bn4"], s["bn4"], h, train)
    return relu(h), ns  # (B, hidden, D/16, H/16, W/16)


# ---------------------------------------------------------------------------
# torch TransformerEncoderLayer (post-norm)
# ---------------------------------------------------------------------------

def _encoder_layer_init(kg, H: int, heads: int):
    p = init_ops.fused_qkv_params(kg(), H, heads)
    d = H // heads
    return {
        "qkv": {"kernel": p["kernel"], "bias": init_ops.zeros((3, heads, d))},
        "out": init_ops.head_out_params(kg(), H, heads),
        "norm1": init_ops.layernorm_params(H),
        "fc1": init_ops.linear_params(kg(), H, 4 * H),
        "fc2": init_ops.linear_params(kg(), 4 * H, H),
        "norm2": init_ops.layernorm_params(H),
    }


def _mha(p, x, heads, drop, rng, train, cdt):
    """torch nn.MultiheadAttention: fused QKV WITH bias, dropout on probs."""
    in_dtype = x.dtype
    if cdt is not None:
        x = x.astype(cdt)
    qkv = jnp.einsum("bnh,hskd->sbknd", x, p["qkv"]["kernel"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    qkv = qkv + p["qkv"]["bias"].astype(jnp.float32)[:, None, :, None, :]
    qkv = qkv.astype(x.dtype)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = q.shape[-1] ** -0.5
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1)
    attn = dropout(attn, drop, rng, train).astype(v.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    y = jnp.einsum("bknd,kdh->bnh", o, p["out"]["kernel"].astype(o.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["out"]["bias"].astype(jnp.float32)).astype(in_dtype)


def _encoder_layer_apply(p, x, heads, drop, rng, train, cdt):
    # post-norm: x = norm1(x + dropout(attn(x))); x = norm2(x + ff(x))
    a = _mha(p, x, heads, drop, rng, train, cdt)
    x = layernorm(p["norm1"], x + dropout(a, drop, rng, train))
    h = relu(linear(p["fc1"], x, cdt))
    h = dropout(h, drop, rng, train)
    h = linear(p["fc2"], h, cdt)
    x = layernorm(p["norm2"], x + dropout(h, drop, rng, train))
    return x


# ---------------------------------------------------------------------------
# ViT3D
# ---------------------------------------------------------------------------

def _stem_geometry(config: Config, pretrained: bool) -> tuple[int, int]:
    """(tokens_per_modality, stem_channels)."""
    D, H, W = config.img_size
    if pretrained:
        # DenseNet /16 at denseblock3; conv1 emits bn_size*growth channels
        bn_size, growth = 4, config.get("growth_rate", 16)
        return (D // 16) * (H // 16) * (W // 16), bn_size * growth
    return (D // 16) * (H // 16) * (W // 16), config.hidden_dim


def init(key: jax.Array, config: Config):
    """Returns (params, state).

    config extras: num_layers (transformer depth), add_cls_token (default
    True), pretrained_cnn (default False → CNN3DEncoder), growth_rate.
    """
    H = config.hidden_dim
    heads = config.num_heads
    M = config.num_modalities
    pretrained = bool(config.get("pretrained_cnn", False))
    add_cls = bool(config.get("add_cls_token", True))
    n_tok, stem_ch = _stem_geometry(config, pretrained)
    if stem_ch != H:
        raise ValueError(
            f"transformer width must equal stem output channels: "
            f"hidden_dim={H} but stem emits {stem_ch} "
            f"({'DenseNet-trunc' if pretrained else 'CNN3DEncoder'})")

    kg = init_ops.KeyGen(key)
    params: dict = {}
    state: dict = {}
    if pretrained and M != 1:
        # The reference sizes pos_embed from cnn_out_dim without the modality
        # factor (modelv2.py:154-159), so its pretrained path only admits one
        # modality; keep that contract but fail loudly.
        raise ValueError("pretrained_cnn supports num_modalities == 1 "
                         f"(got {M})")
    if pretrained:
        dn_p, dn_s, meta = densenet.init(
            kg(), in_channels=config.in_channels,
            growth_rate=config.get("growth_rate", 16),
            num_classes=config.num_classes)
        params["encoder"], state["encoder"] = dn_p, dn_s
    else:
        params["encoder"], state["encoder"] = _cnn_encoder_init(
            kg, config.in_channels, H)

    num_tokens = n_tok * (M if not pretrained else 1)
    params["pos_embed"] = init_ops.trunc_or_normal_02(kg(), (1, num_tokens + int(add_cls), H))
    if add_cls:
        params["cls_token"] = init_ops.trunc_or_normal_02(kg(), (1, 1, H))
    params["layers"] = [_encoder_layer_init(kg, H, heads)
                        for _ in range(config.num_layers)]
    params["head"] = {
        "norm": init_ops.layernorm_params(H),
        "fc1": init_ops.linear_params(kg(), H, H // 8),
        "fc2": init_ops.linear_params(kg(), H // 8, config.num_classes),
    }
    return params, state


def apply(params: dict, state: dict, config: Config, img: jax.Array,
          labels: jax.Array | None = None, train: bool = False,
          rng: jax.Array | None = None):
    """img (B, M, C, D, H, W) → (logits, loss?, new_state)."""
    img = promote_input(img)
    cdt = jnp.dtype(config.compute_dtype) if config.compute_dtype != "float32" else None
    pretrained = bool(config.get("pretrained_cnn", False))
    add_cls = bool(config.get("add_cls_token", True))
    drop = config.get("dropout", 0.0)
    rngs = RngStream(rng)
    B, M = img.shape[0], img.shape[1]

    tokens = []
    new_state = dict(state)
    enc_state = state["encoder"]  # shared stem: BN stats chain across streams
    for m in range(M):
        if pretrained:
            feat, enc_state = densenet.apply(
                params["encoder"], enc_state, img[:, m], train,
                upto=DENSENET_TRUNCATION)
        else:
            feat, enc_state = _cnn_encoder_apply(
                params["encoder"], enc_state, img[:, m], train)
        # (B, C, d, h, w) → (B, C, N): channels become token features
        tokens.append(feat.reshape(B, feat.shape[1], -1))
    new_state["encoder"] = enc_state
    x = jnp.concatenate(tokens, axis=2).transpose(0, 2, 1)  # (B, N·M, C)

    if add_cls:
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                               (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    for layer in params["layers"]:
        x = _encoder_layer_apply(layer, x, config.num_heads, drop, rngs,
                                 train, cdt)

    pooled = x[:, 0] if add_cls else jnp.mean(x, axis=1)
    h = layernorm(params["head"]["norm"], pooled)
    h = linear(params["head"]["fc1"], h, cdt)
    logits = linear(params["head"]["fc2"], h, cdt).astype(jnp.float32)

    if labels is None:
        return logits, new_state
    loss = cross_entropy(logits, labels, config.get("label_smoothing", 0.0))
    return logits, loss, new_state
