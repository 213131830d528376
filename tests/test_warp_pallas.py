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
