"""3-D DenseNet-121 backbone with dotted-path truncation.

Provides the legacy capability of `monai.networks.nets.DenseNet121` +
`modify_model.get_model_upto_layer` (reference modelv2.py:131-141,
modify_model.py:63-125): a DenseNet whose forward can be cut at any dotted
layer path — e.g. the reference's live truncation point
``features.denseblock3.denselayer24.layers.conv1``.

Layer names mirror MONAI's module tree so the reference's path strings work
verbatim:
  features.conv0 / norm0 / relu0 / pool0
  features.denseblock{i}.denselayer{j}.layers.{norm1,relu1,conv1,norm2,relu2,conv2}
  features.transition{i}.{norm,relu,conv,pool}
  features.norm5
  class_layers.{relu,pool,flatten,out}

Truncation semantics match `get_model_upto_layer`: every module strictly
before the target keeps its full behavior (dense layers concatenate their
input), the target's own containing dense layer is flattened — its prefix
norm/relu/conv run WITHOUT the concat (the reference rebuilds the prefix as a
plain nn.Sequential).

Init: xavier-uniform convs/linears, ones/zeros norms — the reference applies
its `reset_weights` over the pretrained-shaped model (modelv2.py:89-99, 139).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import initializers as init_ops
from ..ops.conv import (avg_pool3d, batch_norm3d, batchnorm3d_params, conv3d,
                        global_avg_pool3d, max_pool3d, relu)

BLOCK_CONFIG_121 = (6, 12, 24, 16)


def _conv_params(key, in_ch: int, out_ch: int, k: int) -> dict:
    fan_in = in_ch * k ** 3
    fan_out = out_ch * k ** 3
    kernel = init_ops.xavier_uniform(key, (out_ch, in_ch, k, k, k),
                                     fan_in=fan_in, fan_out=fan_out)
    return {"kernel": kernel}  # DenseNet convs are bias-free


def init(key: jax.Array, in_channels: int = 1, growth_rate: int = 16,
         block_config: tuple = BLOCK_CONFIG_121, bn_size: int = 4,
         init_features: int = 64, num_classes: int = 2):
    """Returns (params, state, meta). meta['paths'] lists every dotted path."""
    kg = init_ops.KeyGen(key)
    params: dict = {"features": {}, "class_layers": {}}
    state: dict = {"features": {}}
    paths: list[str] = []

    f, s = params["features"], state["features"]
    f["conv0"] = _conv_params(kg(), in_channels, init_features, 7)
    f["norm0"], s["norm0"] = batchnorm3d_params(init_features)
    paths += ["features.conv0", "features.norm0", "features.relu0",
              "features.pool0"]

    ch = init_features
    for bi, n_layers in enumerate(block_config, start=1):
        block, bstate = {}, {}
        for li in range(1, n_layers + 1):
            lp, ls = {}, {}
            lp["norm1"], ls["norm1"] = batchnorm3d_params(ch)
            lp["conv1"] = _conv_params(kg(), ch, bn_size * growth_rate, 1)
            lp["norm2"], ls["norm2"] = batchnorm3d_params(bn_size * growth_rate)
            lp["conv2"] = _conv_params(kg(), bn_size * growth_rate, growth_rate, 3)
            block[f"denselayer{li}"] = lp
            bstate[f"denselayer{li}"] = ls
            base = f"features.denseblock{bi}.denselayer{li}.layers"
            paths += [f"{base}.{n}" for n in
                      ("norm1", "relu1", "conv1", "norm2", "relu2", "conv2")]
            ch += growth_rate
        f[f"denseblock{bi}"] = block
        s[f"denseblock{bi}"] = bstate
        if bi != len(block_config):
            tp, ts = {}, {}
            tp["norm"], ts["norm"] = batchnorm3d_params(ch)
            tp["conv"] = _conv_params(kg(), ch, ch // 2, 1)
            f[f"transition{bi}"] = tp
            s[f"transition{bi}"] = ts
            paths += [f"features.transition{bi}.{n}"
                      for n in ("norm", "relu", "conv", "pool")]
            ch = ch // 2
    f["norm5"], s["norm5"] = batchnorm3d_params(ch)
    paths.append("features.norm5")

    params["class_layers"]["out"] = init_ops.linear_params(kg(), ch, num_classes)
    paths += ["class_layers.relu", "class_layers.pool", "class_layers.flatten",
              "class_layers.out"]
    meta = {"paths": paths, "out_channels": ch,
            "block_config": tuple(block_config)}
    return params, state, meta


class _Done(Exception):
    """Signals that the truncation point produced its output."""

    def __init__(self, value):
        self.value = value


def _step(name: str, upto: str | None, value):
    if upto is not None and name == upto:
        raise _Done(value)
    return value


def _dense_layer(lp, ls, x, train, base, upto, dropout=0.0):
    """norm1→relu1→conv1→norm2→relu2→conv2, output concat([x, new])."""
    h, ls1 = batch_norm3d(lp["norm1"], ls["norm1"], x, train)
    _step(f"{base}.norm1", upto, h)
    h = _step(f"{base}.relu1", upto, relu(h))
    h = _step(f"{base}.conv1", upto, conv3d(lp["conv1"], h))
    h, ls2 = batch_norm3d(lp["norm2"], ls["norm2"], h, train)
    _step(f"{base}.norm2", upto, h)
    h = _step(f"{base}.relu2", upto, relu(h))
    h = _step(f"{base}.conv2", upto, conv3d(lp["conv2"], h, padding=1))
    new_state = {"norm1": ls1, "norm2": ls2}
    return jnp.concatenate([x, h], axis=1), new_state


def apply(params: dict, state: dict, x: jax.Array, train: bool = False,
          upto: str | None = None):
    """Forward pass; `upto` cuts the network after the named layer
    (get_model_upto_layer semantics).  Returns (out, new_state)."""
    f, s = params["features"], state["features"]
    new_s: dict = {}
    try:
        h = _step("features.conv0", upto, conv3d(f["conv0"], x, stride=2, padding=3))
        h, new_s["norm0"] = batch_norm3d(f["norm0"], s["norm0"], h, train)
        _step("features.norm0", upto, h)
        h = _step("features.relu0", upto, relu(h))
        h = _step("features.pool0", upto, max_pool3d(h, 3, 2, padding=1))

        n_blocks = len([k for k in f if k.startswith("denseblock")])
        for bi in range(1, n_blocks + 1):
            block, bstate = f[f"denseblock{bi}"], s[f"denseblock{bi}"]
            nb_state = {}
            for li in range(1, len(block) + 1):
                base = f"features.denseblock{bi}.denselayer{li}.layers"
                h, nb_state[f"denselayer{li}"] = _dense_layer(
                    block[f"denselayer{li}"], bstate[f"denselayer{li}"],
                    h, train, base, upto)
            new_s[f"denseblock{bi}"] = nb_state
            if f"transition{bi}" in f:
                tp, ts = f[f"transition{bi}"], s[f"transition{bi}"]
                h, tns = batch_norm3d(tp["norm"], ts["norm"], h, train)
                new_s[f"transition{bi}"] = {"norm": tns}
                _step(f"features.transition{bi}.norm", upto, h)
                h = _step(f"features.transition{bi}.relu", upto, relu(h))
                h = _step(f"features.transition{bi}.conv", upto,
                          conv3d(tp["conv"], h))
                h = _step(f"features.transition{bi}.pool", upto, avg_pool3d(h, 2))
        h, new_s["norm5"] = batch_norm3d(f["norm5"], s["norm5"], h, train)
        _step("features.norm5", upto, h)

        h = _step("class_layers.relu", upto, relu(h))
        h = _step("class_layers.pool", upto, global_avg_pool3d(h))
        h = _step("class_layers.flatten", upto, h.reshape(h.shape[0], -1))
        from ..ops.layers import linear

        h = _step("class_layers.out", upto,
                  linear(params["class_layers"]["out"], h))
    except _Done as done:
        return done.value, {"features": {**s, **new_s}}
    if upto is not None:
        raise KeyError(f"layer path {upto!r} not found in DenseNet")
    return h, {"features": {**s, **new_s}}
