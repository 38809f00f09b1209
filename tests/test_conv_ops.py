"""Conv-op parity vs torch: conv3d, max/avg pool, BatchNorm3d semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from cross_attention_vit_tpu.ops.conv import (avg_pool3d, batch_norm3d,
                                              batchnorm3d_params, conv3d,
                                              global_avg_pool3d, max_pool3d,
                                              relu)


def test_conv3d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 9, 10)).astype(np.float32)
    w = rng.normal(size=(5, 3, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    for stride, padding in [(1, 0), (1, 1), (2, 1), ((1, 2, 1), (0, 1, 1))]:
        got = np.asarray(conv3d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
                                jnp.asarray(x), stride=stride, padding=padding))
        want = F.conv3d(torch.from_numpy(x), torch.from_numpy(w),
                        torch.from_numpy(b), stride=stride,
                        padding=padding).numpy()
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_max_pool3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 8, 8, 8)).astype(np.float32)
    got = np.asarray(max_pool3d(jnp.asarray(x), 2))
    want = F.max_pool3d(torch.from_numpy(x), 2).numpy()
    np.testing.assert_array_equal(got, want)
    # k3 s2 p1 (DenseNet pool0)
    got = np.asarray(max_pool3d(jnp.asarray(x), 3, 2, padding=1))
    want = F.max_pool3d(torch.from_numpy(x), 3, 2, padding=1).numpy()
    np.testing.assert_array_equal(got, want)


def test_avg_pool3d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 8, 8, 8)).astype(np.float32)
    got = np.asarray(avg_pool3d(jnp.asarray(x), 2))
    want = F.avg_pool3d(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_global_avg_pool_matches_adaptive():
    x = np.random.default_rng(3).normal(size=(2, 4, 3, 5, 6)).astype(np.float32)
    got = np.asarray(global_avg_pool3d(jnp.asarray(x)))
    want = F.adaptive_avg_pool3d(torch.from_numpy(x), 1).flatten(1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_batchnorm3d_matches_torch_train_and_eval():
    rng = np.random.default_rng(4)
    C = 3
    x1 = rng.normal(size=(4, C, 5, 6, 7)).astype(np.float32) * 3 + 1
    x2 = rng.normal(size=(4, C, 5, 6, 7)).astype(np.float32)

    bn = torch.nn.BatchNorm3d(C)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.normal(size=C).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.normal(size=C).astype(np.float32)))

    params, state = batchnorm3d_params(C)
    params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
              "bias": jnp.asarray(bn.bias.detach().numpy())}

    # two train steps: outputs + running stats must track torch
    bn.train()
    for x in (x1, x2):
        want = bn(torch.from_numpy(x)).detach().numpy()
        got, state = batch_norm3d(params, state, jnp.asarray(x), train=True)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               bn.running_var.numpy(), atol=1e-4, rtol=1e-4)

    # eval: running stats used, state unchanged
    bn.eval()
    want = bn(torch.from_numpy(x1)).detach().numpy()
    got, state2 = batch_norm3d(params, state, jnp.asarray(x1), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(state2["mean"]),
                                  np.asarray(state["mean"]))


def test_relu():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    np.testing.assert_array_equal(np.asarray(relu(x)), [0.0, 0.0, 2.0])
