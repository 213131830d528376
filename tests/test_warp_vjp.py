"""Custom-VJP Pallas warp (ops/warp_vjp.py) vs autodiff of the gather path.

Runs the kernels in interpret mode on CPU; covers interior flows, border
clamping in every direction, odd (non-tile-aligned) sizes and both
gradients (image and flow). The training steps BPTT through this warp at
every frame, so gradient parity here underwrites training parity on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tecogan_tpu.ops.warp import backward_warp
from tecogan_tpu.ops.warp_vjp import backward_warp_diff


def _loss_ref(x, fl):
    return jnp.sum(jnp.sin(backward_warp(x, fl) * 3))


def _loss_new(x, fl):
    return jnp.sum(jnp.sin(backward_warp_diff(x, fl, interpret=True) * 3))


@pytest.mark.parametrize("shape", [(2, 32, 48, 3), (1, 17, 23, 3),
                                   (2, 40, 128, 3), (1, 64, 128, 3)])
def test_warp_vjp_matches_gather_autodiff(rng, shape):
    n, h, w, c = shape
    x = jnp.asarray(rng.random((n, h, w, c)), jnp.float32)
    flow = jnp.asarray((rng.random((n, h, w, 2)) - 0.5) * 9, jnp.float32)
    # out-of-range flows exercise the border-clamp gradient semantics
    flow = flow.at[:, :3, :3].set(25.0).at[:, -2:, -2:].set(-30.0)
    if h % 32 == 0:
        # 32-aligned heights: strong downward flow in the last tile's top
        # rows drives the slab loops to sy_start == hp exactly, where the
        # mod-roll aliases row 0 (all-masked by construction — pin it)
        flow = flow.at[:, h - 32:h - 28, :, 1].set(float(h))

    out_ref = backward_warp(x, flow)
    out_new = backward_warp_diff(x, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(out_new), np.asarray(out_ref),
                               atol=2e-6)

    gx_r, gf_r = jax.grad(_loss_ref, (0, 1))(x, flow)
    gx_n, gf_n = jax.grad(_loss_new, (0, 1))(x, flow)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf_n), np.asarray(gf_r), atol=1e-5)


def test_warp_vjp_zero_and_axis_aligned_flows(rng):
    n, h, w, c = 1, 16, 128, 3
    x = jnp.asarray(rng.random((n, h, w, c)), jnp.float32)
    ramps = [
        jnp.zeros((n, h, w, 2), jnp.float32),
        jnp.full((n, h, w, 2), -2.7, jnp.float32),
        jnp.zeros((n, h, w, 2), jnp.float32).at[..., 0].set(
            jnp.linspace(-1.5, 1.5, w)[None, None, :]),
        jnp.zeros((n, h, w, 2), jnp.float32).at[..., 1].set(
            jnp.linspace(-1.5, 1.5, h)[None, :, None]),
    ]
    for flow in ramps:
        gx_r, gf_r = jax.grad(_loss_ref, (0, 1))(x, flow)
        gx_n, gf_n = jax.grad(_loss_new, (0, 1))(x, flow)
        np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf_n), np.asarray(gf_r),
                                   atol=1e-5)


def test_warp_vjp_bf16_inputs(rng):
    """Mixed-precision training passes bf16 activations; values and grads
    must come back in the input dtypes without blowing up."""
    n, h, w, c = 1, 16, 32, 3
    x = jnp.asarray(rng.random((n, h, w, c)), jnp.bfloat16)
    flow = jnp.asarray((rng.random((n, h, w, 2)) - 0.5) * 5, jnp.float32)
    out = backward_warp_diff(x, flow, interpret=True)
    assert out.dtype == jnp.bfloat16

    def loss(x, fl):
        return jnp.sum(backward_warp_diff(x, fl, interpret=True)
                       .astype(jnp.float32))

    gx, gf = jax.grad(loss, (0, 1))(x, flow)
    assert gx.dtype == jnp.bfloat16 and gf.dtype == jnp.float32
    assert bool(jnp.isfinite(gf).all())


def test_warp_vjp_bf16_io_exact_vs_upcast_first(rng):
    """bf16 I/O is a pure-traffic change: the kernels convert to f32 after
    the VMEM load and do all math/accumulation in f32, so feeding bf16
    values directly must give EXACTLY the same results as upcasting those
    same bf16 values to f32 at the boundary (the pre-bf16-I/O behavior)."""
    n, h, w, c = 2, 33, 40, 3
    x16 = jnp.asarray(rng.random((n, h, w, c)), jnp.bfloat16)
    flow = jnp.asarray((rng.random((n, h, w, 2)) - 0.5) * 7, jnp.float32)
    flow = flow.at[:, :2, :2].set(19.0).at[:, -2:, -2:].set(-21.0)

    def loss16(x, fl):
        return jnp.sum(jnp.sin(
            backward_warp_diff(x, fl, interpret=True).astype(jnp.float32)))

    def loss32(x, fl):
        return jnp.sum(jnp.sin(
            backward_warp_diff(x, fl, interpret=True)
            .astype(jnp.bfloat16).astype(jnp.float32)))

    out16 = backward_warp_diff(x16, flow, interpret=True)
    out32 = backward_warp_diff(x16.astype(jnp.float32), flow,
                               interpret=True).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out16, np.float32), np.asarray(out32, np.float32))

    gx16, gf16 = jax.grad(loss16, (0, 1))(x16, flow)
    gx32, gf32 = jax.grad(loss32, (0, 1))(x16.astype(jnp.float32), flow)
    np.testing.assert_array_equal(np.asarray(gx16, np.float32),
                                  np.asarray(gx32.astype(jnp.bfloat16),
                                             np.float32))
    np.testing.assert_array_equal(np.asarray(gf16), np.asarray(gf32))
