"""Wiring math of the fully-packed streaming recurrence: phase flow
coordinates, packed2->planes conversion, planes->conv_in layout."""

import numpy as np
import pytest

import jax.numpy as jnp

from tecogan_tpu.models.networks import FRNetConfig
from tecogan_tpu.models.networks.frnet import (
    _hr_flow,
    _packed2_to_planes,
    _phase_flow_coords,
    _planes_to_conv_in,
)
from tecogan_tpu.ops import depth_to_space, space_to_depth


@pytest.mark.parametrize("scale,degradation", [(4, "BD"), (2, "BI")])
def test_phase_flow_coords_match_hr_flow(rng, scale, degradation):
    """Per-phase coords must equal clip(pixel + HR_flow) at the phase's
    strided HR positions."""
    cfg = FRNetConfig(scale=scale, degradation=degradation)
    h, w = 16, 24
    lr_flow = (rng.standard_normal((2, h, w, 2)) * 5).astype(np.float32)

    sy, sx = _phase_flow_coords(cfg, jnp.asarray(lr_flow), h, w)
    hr_flow = np.asarray(_hr_flow(cfg, jnp.asarray(lr_flow), h, w))
    s = scale
    hh, ww = s * h, s * w
    ii = np.arange(h)[:, None]
    jj = np.arange(w)[None, :]
    for py in range(s):
        for px in range(s):
            q = py * s + px
            f = hr_flow[:, py::s, px::s, :]
            want_y = np.clip(s * ii + py + f[..., 1], 0, hh - 1)
            want_x = np.clip(s * jj + px + f[..., 0], 0, ww - 1)
            np.testing.assert_allclose(np.asarray(sy)[:, q], want_y,
                                       rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(np.asarray(sx)[:, q], want_x,
                                       rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("scale", [4, 2])
def test_packed2_to_planes_roundtrip(rng, scale):
    """packed2 -> phase planes must equal s2d-phase extraction of the HR."""
    s = scale
    n, h, w, c = 2, 6, 10, 3
    p2 = rng.standard_normal(
        (n, s * h // 2, s * w // 2, 4 * c)).astype(np.float32)
    hr = np.asarray(depth_to_space(jnp.asarray(p2), 2))  # (n, sh, sw, c)

    planes = np.asarray(_packed2_to_planes(jnp.asarray(p2), s))
    assert planes.shape == (n, s * s, c, h, w)
    for py in range(s):
        for px in range(s):
            q = py * s + px
            want = hr[:, py::s, px::s, :].transpose(0, 3, 1, 2)
            np.testing.assert_array_equal(planes[:, q], want)


def test_planes_to_conv_in_matches_s2d(rng):
    """(n, c, q, h, w) planes -> NHWC packed must equal space_to_depth."""
    s, n, h, w, c = 4, 1, 6, 8, 3
    hr = rng.standard_normal((n, s * h, s * w, c)).astype(np.float32)
    want = np.asarray(space_to_depth(jnp.asarray(hr), s))
    # build (n, c, q, h, w) planes from hr
    planes = hr.reshape(n, h, s, w, s, c).transpose(0, 5, 2, 4, 1, 3)
    planes = planes.reshape(n, c, s * s, h, w)
    got = np.asarray(_planes_to_conv_in(jnp.asarray(planes)))
    np.testing.assert_array_equal(got, want)
