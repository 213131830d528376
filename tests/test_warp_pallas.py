"""Pallas warp kernel parity vs the gather-based reference implementation
(interpret mode so it runs on the CPU test mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tecogan_tpu.ops import backward_warp
from tecogan_tpu.ops.warp_pallas import backward_warp_pallas


@pytest.mark.parametrize("shape,maxflow", [
    ((1, 24, 40, 3), 6.0),     # smooth small flow
    ((2, 16, 130, 3), 30.0),   # large flow, cross-block taps, odd width
    ((1, 9, 257, 1), 300.0),   # heavily clamped flow, border behaviour
    # 32-aligned height (h == hp): the last tile's displacement loop can
    # reach sy_start == hp exactly, where the slab mod-roll aliases row 0 —
    # correct only because every weight is provably zero in that iteration
    ((1, 64, 128, 3), 80.0),
])
def test_pallas_warp_matches_gather(rng, shape, maxflow):
    n, h, w, c = shape
    x = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal((n, h, w, 2)) * maxflow).astype(np.float32)
    want = np.asarray(backward_warp(jnp.asarray(x), jnp.asarray(flow)))
    got = np.asarray(backward_warp_pallas(
        jnp.asarray(x), jnp.asarray(flow), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_warp_zero_flow_identity(rng):
    x = rng.standard_normal((1, 16, 128, 3)).astype(np.float32)
    flow = np.zeros((1, 16, 128, 2), np.float32)
    got = np.asarray(backward_warp_pallas(
        jnp.asarray(x), jnp.asarray(flow), interpret=True))
    np.testing.assert_allclose(got, x, atol=1e-6)


def test_packed_warp_matches_reference_path(rng):
    """backward_warp_pallas_packed == d2s -> gather warp -> s2d."""
    from tecogan_tpu.ops import depth_to_space, space_to_depth
    from tecogan_tpu.ops.warp_pallas import backward_warp_pallas_packed

    n, h2, w2, c = 1, 16, 128, 3
    scale = 4
    hr_p2 = rng.standard_normal((n, h2, w2, 4 * c)).astype(np.float32)
    flow = (rng.standard_normal((n, 2 * h2, 2 * w2, 2)) * 9).astype(
        np.float32)

    got = np.asarray(backward_warp_pallas_packed(
        jnp.asarray(hr_p2), jnp.asarray(flow), scale, interpret=True))

    hr = depth_to_space(jnp.asarray(hr_p2), 2)
    want = np.asarray(space_to_depth(
        backward_warp(hr, jnp.asarray(flow)), scale))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _phase_coords(flow, s):
    """(n, H, W, 2) HR flow -> clamped per-phase sample coords (n,s²,h,w)x2."""
    n, H, W, _ = flow.shape
    h, w = H // s, W // s
    sy = np.empty((n, s * s, h, w), np.float32)
    sx = np.empty((n, s * s, h, w), np.float32)
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    for py in range(s):
        for px in range(s):
            q = py * s + px
            f = flow[:, py::s, px::s, :]
            sy[:, q] = np.clip(s * ii + py + f[..., 1], 0, H - 1)
            sx[:, q] = np.clip(s * jj + px + f[..., 0], 0, W - 1)
    return sy, sx


@pytest.mark.parametrize("s,hw", [(4, (32, 128)), (2, (24, 256))])
def test_fully_packed_warp_matches_gather(rng, s, hw):
    from tecogan_tpu.ops import space_to_depth
    from tecogan_tpu.ops.warp_pallas import backward_warp_packed_planes

    h, w = hw
    H, W = s * h, s * w
    n, c = 1, 3
    hr = rng.standard_normal((n, H, W, c)).astype(np.float32)
    flow = (rng.standard_normal((n, H, W, 2)) * 11).astype(np.float32)

    # build phase planes from the HR image
    planes = hr.reshape(n, h, s, w, s, c).transpose(0, 2, 4, 5, 1, 3)
    planes = planes.reshape(n, s * s, c, h, w)
    sy, sx = _phase_coords(flow, s)

    got = np.asarray(backward_warp_packed_planes(
        jnp.asarray(planes), jnp.asarray(sy), jnp.asarray(sx), s,
        interpret=True))  # (n, c, s², h, w)

    want_nhwc = np.asarray(space_to_depth(
        backward_warp(jnp.asarray(hr), jnp.asarray(flow)), s))
    # s2d channel = q*c + ch -> planes (n, c, q, h, w)
    want = want_nhwc.reshape(n, h, w, s * s, c).transpose(0, 4, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="exercises the compiled packed16 path")
def test_p16_inference_matches_gather_path_on_tpu(rng):
    """Full streaming inference: fully-packed path vs the gather fallback."""
    from tecogan_tpu.models.networks import (
        FRNetConfig, infer_sequence, init_frnet)

    cfg = FRNetConfig(nf=16, nb=2, scale=4, degradation="BD",
                      compute_dtype="bfloat16", packed16=True)
    cfg_ref = FRNetConfig(nf=16, nb=2, scale=4, degradation="BD",
                          compute_dtype="bfloat16", pallas_warp=False)
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = rng.random((5, 40, 48, 3)).astype(np.float32)
    a = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg, chunk=5))
    b = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg_ref, chunk=5))
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert d.max() <= 1 and (d > 0).mean() < 0.02


def test_fully_packed_warp_extreme_flow(rng):
    """Near the supported |flow| bound (~184 px) with heavy border clamping.

    (Flows beyond the bound are displacement-clamped by the kernel's safety
    net rather than matching the gather — FRNet's tanh-bounded flow keeps
    real inputs well inside the contract.)"""
    from tecogan_tpu.ops import space_to_depth
    from tecogan_tpu.ops.warp_pallas import backward_warp_packed_planes

    s, h, w, c = 4, 16, 128, 3
    H, W = s * h, s * w
    hr = rng.standard_normal((1, H, W, c)).astype(np.float32)
    flow = np.clip(rng.standard_normal((1, H, W, 2)) * 150,
                   -170, 170).astype(np.float32)

    planes = hr.reshape(1, h, s, w, s, c).transpose(0, 2, 4, 5, 1, 3)
    planes = planes.reshape(1, s * s, c, h, w)
    sy, sx = _phase_coords(flow, s)
    got = np.asarray(backward_warp_packed_planes(
        jnp.asarray(planes), jnp.asarray(sy), jnp.asarray(sx), s,
        interpret=True))
    want_nhwc = np.asarray(space_to_depth(
        backward_warp(jnp.asarray(hr), jnp.asarray(flow)), s))
    want = want_nhwc.reshape(1, h, w, s * s, c).transpose(0, 4, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
