"""Layer-level parity tests: tecogan_tpu.nn vs torch layers."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tecogan_tpu import nn


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 10, 12, 5)).astype(np.float32)
    w = rng.standard_normal((4, 5, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal(4).astype(np.float32)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)}
    got = np.asarray(nn.conv2d(p, jnp.asarray(x), padding=1))
    want = F.conv2d(torch.from_numpy(to_nchw(x)), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-5)


def test_conv2d_strided_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    w = rng.standard_normal((8, 3, 4, 4)).astype(np.float32)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
    got = np.asarray(nn.conv2d(p, jnp.asarray(x), stride=2, padding=1))
    want = F.conv2d(torch.from_numpy(to_nchw(x)), torch.from_numpy(w),
                    stride=2, padding=1).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-5)


def test_conv2d_transpose_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 6)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)  # torch (in,out,k,k)
    b = rng.standard_normal(4).astype(np.float32)
    w_eq = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # flipped HWIO
    p = {"w": jnp.asarray(np.ascontiguousarray(w_eq)), "b": jnp.asarray(b)}
    got = np.asarray(nn.conv2d_transpose(p, jnp.asarray(x)))
    want = F.conv_transpose2d(
        torch.from_numpy(to_nchw(x)), torch.from_numpy(w),
        torch.from_numpy(b), stride=2, padding=1, output_padding=1).numpy()
    assert got.shape == to_nhwc(want).shape == (2, 14, 18, 4)
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("train", [True, False])
def test_batch_norm_matches_torch(rng, train):
    x = rng.standard_normal((4, 6, 6, 8)).astype(np.float32)
    bn_t = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        bn_t.weight.copy_(torch.rand(8) + 0.5)
        bn_t.bias.copy_(torch.rand(8))
        bn_t.running_mean.copy_(torch.randn(8) * 0.1)
        bn_t.running_var.copy_(torch.rand(8) + 0.5)
    # note: .numpy() views alias torch storage and jax's CPU backend can
    # zero-copy them — copy explicitly so the in-place BN update below
    # doesn't leak into our param snapshot
    p = {
        "scale": jnp.asarray(np.array(bn_t.weight.detach().numpy())),
        "bias": jnp.asarray(np.array(bn_t.bias.detach().numpy())),
        "mean": jnp.asarray(np.array(bn_t.running_mean.numpy())),
        "var": jnp.asarray(np.array(bn_t.running_var.numpy())),
    }
    bn_t.train(train)
    want = bn_t(torch.from_numpy(to_nchw(x))).detach().numpy()
    got, new_p = nn.batch_norm(p, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), rtol=1e-4,
                               atol=1e-5)
    if train:  # running stats must track torch's EMA
        np.testing.assert_allclose(
            np.asarray(new_p["mean"]), bn_t.running_mean.numpy(), rtol=1e-4,
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_p["var"]), bn_t.running_var.numpy(), rtol=1e-4,
            atol=1e-6)


@pytest.mark.parametrize("hw", [(8, 8), (9, 7)])
def test_max_pool_matches_torch(rng, hw):
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    got = np.asarray(nn.max_pool_2x2(jnp.asarray(x)))
    want = F.max_pool2d(torch.from_numpy(to_nchw(x)), 2, 2).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), atol=0)


@pytest.mark.parametrize("hw", [(8, 8), (9, 7)])
def test_max_pool_grad_matches_torch(rng, hw):
    """The custom first-argmax backward must route gradients exactly as
    torch's MaxPool2d — including at ties (first maximal element of the
    window in row-major order), which quantised/duplicated activations do
    hit in practice."""
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    # engineer exact ties: duplicate whole 2x2 windows and plant constant
    # windows, so every tie-routing branch is exercised
    x[0, 0:2, 0:2, :] = 0.7
    x[1, 2:4, 2:4, 0] = x[1, 2, 2, 0]
    x[0, 4:6, 0, 1] = x[0, 4, 1, 1] = -0.3

    def loss_j(xj):
        return jnp.sum(nn.max_pool_2x2(xj) ** 2)

    got = np.asarray(jax.grad(loss_j)(jnp.asarray(x)))

    xt = torch.from_numpy(to_nchw(x)).requires_grad_(True)
    F.max_pool2d(xt, 2, 2).pow(2).sum().backward()
    np.testing.assert_allclose(got, to_nhwc(xt.grad.numpy()), atol=1e-6)


def test_leaky_relu_matches_torch(rng):
    x = rng.standard_normal((100,)).astype(np.float32)
    got = np.asarray(nn.leaky_relu(jnp.asarray(x), 0.2))
    want = F.leaky_relu(torch.from_numpy(x), 0.2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-7)
