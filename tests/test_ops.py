"""Numerical-parity tests for core ops against torch's CUDA-free reference
semantics (grid_sample / interpolate / conv2d are the ground-truth oracles
the reference implementation delegates to)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tecogan_tpu.ops import (
    backward_warp,
    downsample_bd,
    imresize_matlab,
    space_to_depth,
    depth_to_space,
    upsample_bilinear,
    upsample_tecogan_bicubic,
    rgb_to_ycbcr,
    float32_to_uint8,
)


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


# --------------------------------------------------------------------------
# backward_warp vs grid_sample(align_corners=True, padding_mode='border')
# --------------------------------------------------------------------------
@pytest.mark.parametrize("shape,maxflow", [((2, 16, 24, 3), 5.0),
                                           ((1, 9, 7, 4), 30.0)])
def test_backward_warp_matches_grid_sample(rng, shape, maxflow):
    n, h, w, c = shape
    x = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal((n, h, w, 2)) * maxflow).astype(np.float32)

    got = np.asarray(backward_warp(jnp.asarray(x), jnp.asarray(flow)))

    # torch oracle: build the normalized grid the same way the reference does
    xt = torch.from_numpy(to_nchw(x))
    iu = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(n, -1, h, -1)
    iv = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(n, -1, -1, w)
    grid = torch.cat([iu, iv], 1)
    ft = torch.from_numpy(to_nchw(flow))
    ft = torch.cat(
        [ft[:, 0:1] / ((w - 1.0) / 2.0), ft[:, 1:2] / ((h - 1.0) / 2.0)], dim=1
    )
    grid = (grid + ft).permute(0, 2, 3, 1)
    want = F.grid_sample(
        xt, grid, mode="bilinear", padding_mode="border", align_corners=True
    ).numpy()

    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-5, atol=1e-5)


def test_backward_warp_zero_flow_identity(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    np.testing.assert_allclose(
        np.asarray(backward_warp(jnp.asarray(x), jnp.asarray(flow))), x,
        atol=1e-6)


# --------------------------------------------------------------------------
# bilinear upsampling vs F.interpolate(align_corners=False)
# --------------------------------------------------------------------------
@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.parametrize("hw", [(16, 20), (7, 9)])
def test_bilinear_upsample_matches_torch(rng, scale, hw):
    x = rng.standard_normal((2, *hw, 3)).astype(np.float32)
    got = np.asarray(upsample_bilinear(jnp.asarray(x), scale))
    want = F.interpolate(
        torch.from_numpy(to_nchw(x)), scale_factor=scale, mode="bilinear",
        align_corners=False).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# TecoGAN bicubic upsampler vs the reference's separable conv formulation
# (single oracle shared with the network-parity tests)
# --------------------------------------------------------------------------
from torch_oracles import torch_bicubic_up as _torch_tecogan_bicubic  # noqa: E402,E501


@pytest.mark.parametrize("scale", [2, 4])
def test_tecogan_bicubic_matches_reference_formulation(rng, scale):
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    got = np.asarray(upsample_tecogan_bicubic(jnp.asarray(x), scale))
    want = _torch_tecogan_bicubic(torch.from_numpy(to_nchw(x)), scale).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# BD degradation vs blur-conv oracle
# --------------------------------------------------------------------------
def _gauss_kernel_2d(sigma):
    ksize = 1 + 2 * int(sigma * 3.0)
    n = np.arange(ksize) - (ksize - 1) / 2.0
    g1 = np.exp(-(n ** 2) / (2 * sigma ** 2))
    k2 = np.outer(g1, g1)
    return (k2 / k2.sum()).astype(np.float32)


@pytest.mark.parametrize("pad", [False, True])
@pytest.mark.parametrize("scale,sigma", [(4, 1.5), (2, 1.5)])
def test_downsample_bd_matches_conv(rng, pad, scale, sigma):
    x = rng.random((2, 40, 44, 3)).astype(np.float32)
    got = np.asarray(
        downsample_bd(jnp.asarray(x), scale, sigma=sigma, pad_data=pad))

    k2 = _gauss_kernel_2d(sigma)
    ksize = k2.shape[0]
    weight = torch.zeros(3, 3, ksize, ksize)
    for ch in range(3):
        weight[ch, ch] = torch.from_numpy(k2)
    xt = torch.from_numpy(to_nchw(x))
    if pad:
        p = ksize - 1
        pt, pl = p // 2, p // 2
        xt = F.pad(xt, (pl, p - pl, pt, p - pt), mode="reflect")
    want = F.conv2d(xt, weight, stride=scale).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# space_to_depth matches the reference channel ordering
# --------------------------------------------------------------------------
@pytest.mark.parametrize("scale", [2, 4])
def test_space_to_depth_matches_reference_order(rng, scale):
    n, c, h, w = 2, 3, 8, 12
    x_nchw = rng.standard_normal((n, c, h, w)).astype(np.float32)

    # reference semantics (net_utils.py:36-47): reshape + permute(0,3,5,1,2,4)
    r = x_nchw.reshape(n, c, h // scale, scale, w // scale, scale)
    want_nchw = r.transpose(0, 3, 5, 1, 2, 4).reshape(
        n, scale * scale * c, h // scale, w // scale)

    got = np.asarray(space_to_depth(jnp.asarray(to_nhwc(x_nchw)), scale))
    np.testing.assert_allclose(got, to_nhwc(want_nchw), atol=0)

    # roundtrip
    back = np.asarray(depth_to_space(jnp.asarray(got), scale))
    np.testing.assert_allclose(back, to_nhwc(x_nchw), atol=0)


# --------------------------------------------------------------------------
# matlab imresize: sanity properties (constant preservation, downscale size)
# --------------------------------------------------------------------------
def test_imresize_matlab_properties(rng):
    x = np.full((1, 32, 48, 3), 0.37, np.float32)
    y = imresize_matlab(x, scale=0.25)
    assert y.shape == (1, 8, 12, 3)
    np.testing.assert_allclose(y, 0.37, rtol=1e-6)

    # antialiased downscale of noise must reduce variance vs naive decimation
    x = rng.standard_normal((1, 64, 64, 1)).astype(np.float32)
    y = imresize_matlab(x, scale=0.25)
    assert y.std() < x[:, ::4, ::4].std()


def test_color_utils(rng):
    img = (rng.random((5, 6, 3)) * 255).astype(np.uint8)
    y = rgb_to_ycbcr(img)
    assert y.dtype == np.uint8 and y.shape == img.shape
    # grey input => Cb = Cr = 128-ish
    grey = np.full((4, 4, 3), 128, np.uint8)
    yg = rgb_to_ycbcr(grey)
    assert abs(int(yg[0, 0, 1]) - 128) <= 1 and abs(int(yg[0, 0, 2]) - 128) <= 1

    f = np.array([-0.1, 0.0, 0.5, 1.0, 1.2], np.float32)
    np.testing.assert_array_equal(
        float32_to_uint8(f), np.array([0, 0, 128, 255, 255], np.uint8))


def test_matlab_imresize_matrix_matches_literal_contributions():
    """Oracle: a literal 1-indexed port of Matlab imresize's
    contributions() algorithm, including the aux=[1:m, m:-1:1] symmetric
    boundary mirroring — edge-clamping instead deviates in the border band
    of antialiased downscales (the widened kernel reaches ~2/scale-1 px
    past the border)."""
    from tecogan_tpu.ops.resize import matlab_imresize_matrix

    def matlab_contributions(in_len, out_len, antialias=True, scale=None):
        # Matlab's scale-given convention maps with the GIVEN scale while
        # out_len = ceil(in_len * scale); the OutputSize convention derives
        # scale = out/in (identical when in_len divides evenly)
        if scale is None:
            scale = out_len / in_len

        def h(x):
            x = np.abs(x)
            x2, x3 = x * x, x ** 3
            return ((1.5 * x3 - 2.5 * x2 + 1) * (x <= 1)
                    + (-0.5 * x3 + 2.5 * x2 - 4 * x + 2)
                    * ((1 < x) & (x <= 2)))

        if scale < 1 and antialias:
            kernel = lambda x: scale * h(scale * x)  # noqa: E731
            kernel_width = 4 / scale
        else:
            kernel, kernel_width = h, 4.0
        x = np.arange(1, out_len + 1, dtype=np.float64)
        u = x / scale + 0.5 * (1 - 1 / scale)
        left = np.floor(u - kernel_width / 2)
        P = int(np.ceil(kernel_width)) + 2
        ind = left[:, None] + np.arange(P)[None, :]
        w = kernel(u[:, None] - ind)
        w /= w.sum(1, keepdims=True)
        aux = np.concatenate([np.arange(1, in_len + 1),
                              np.arange(in_len, 0, -1)])
        ind_m = aux[np.mod(ind.astype(np.int64) - 1, aux.size)]
        M = np.zeros((out_len, in_len))
        for o in range(out_len):
            np.add.at(M[o], ind_m[o] - 1, w[o])
        return M

    for n, out in [(64, 16), (48, 24), (16, 32), (33, 8), (7, 2)]:
        ours = matlab_imresize_matrix(n, out)
        ref = matlab_contributions(n, out)
        np.testing.assert_allclose(ours, ref, atol=1e-7)

    # scale-given convention at non-divisible sizes: out = ceil(n*s) but
    # the mapping must use the REQUESTED scale, not out/n
    for n, s in [(101, 0.25), (33, 0.5), (13, 0.25), (10, 0.35)]:
        out = int(np.ceil(n * s))
        ours = matlab_imresize_matrix(n, out, scale=s)
        ref = matlab_contributions(n, out, scale=s)
        np.testing.assert_allclose(ours, ref, atol=1e-7)
        # and the two conventions genuinely differ here, so threading the
        # scale through is load-bearing
        assert np.abs(ours - matlab_imresize_matrix(n, out)).max() > 1e-4


def test_imresize_matlab_scale_given_nondivisible():
    """imresize_matlab(x, scale=s) on a non-multiple size uses the
    requested scale in the mapping (Matlab parity), pinned against a
    direct dense application of the oracle matrices."""
    from tecogan_tpu.ops.resize import matlab_imresize_matrix

    rng = np.random.default_rng(0)
    x = rng.random((1, 101, 53, 3)).astype(np.float64)
    y = imresize_matlab(x, scale=0.25)
    assert y.shape == (1, 26, 14, 3)
    mh = matlab_imresize_matrix(101, 26, scale=0.25).astype(np.float64)
    mw = matlab_imresize_matrix(53, 14, scale=0.25).astype(np.float64)
    want = np.einsum("Oh,Pw,nhwc->nOPc", mh, mw, x)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-10)
