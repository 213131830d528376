"""Differentiable Pallas backward-warp (custom VJP) for TRAINING paths.

The gather formulation of ``backward_warp`` (ops/warp.py) autodiffs into
XLA gathers + 4 scatter-adds per warp; at the TecoGAN training geometry
those dominate the whole GAN step (measured ~85% of a 500 ms iteration:
four 47 ms scatter fusions for one 72-frame warp adjoint alone). This
module provides ``backward_warp_diff`` — forward = the channel-interleaved
Pallas warp kernel (ops/warp_pallas.py), backward = two Pallas kernels:

- ``_dimage``: the adjoint wrt the warped image. A gather's adjoint is a
  scatter, but scatters don't vectorise; instead the kernel re-enumerates
  the (small, data-dependent) integer displacement range like the forward
  kernel and ACCUMULATES ``mask * shifted(g)`` into a full-image VMEM
  block across the (sequential) row-tile grid — scatter-free.
- ``_dflow``: the adjoint wrt the flow. Same slab/tap enumeration as the
  forward kernel, but accumulating the four bilinear tap VALUES
  (A00/A01/A10/A11) instead of the weighted sum, then combining
  dfx = g*((1-wy)(A01-A00) + wy(A11-A10)) and symmetrically dfy.

Gradient semantics match autodiff of the gather path: coordinates are
clamped before flooring, so at borders the tap values coincide and the
flow gradient vanishes — exactly what the gather path's clamped indices
produce (its unclamped fractional weights multiply zero differences).

All kernels work on the channel-interleaved flat layout (h, w*c) — a FREE
reshape of NHWC — so no layout changes surround them. Image and cotangent
operands cross HBM in their OWN dtype (bf16 in the mixed-precision step)
and are converted to fp32 in VMEM after load — the convert is exact, all
in-kernel math and accumulation stay fp32, so bf16 I/O halves the
image/cotangent traffic with bit-identical results. Flow lanes stay fp32
(bf16 cannot resolve subpixel offsets at large magnitudes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import backward_warp
from .warp_pallas import backward_warp_rgb_flat

__all__ = ["backward_warp_diff"]

_TH = 32
_TW = 128  # pixel tile width (lane width is _TW * c)


def _lane_flow(flow, c: int, hp: int, wp: int):
    """(n, h, w, 2) flow -> per-lane fp32 (fy, fx) of shape (n, hp, wp*c),
    zero-padded (padded lanes clamp to the border and the padded cotangent
    is zero, so they never contribute)."""
    n, h, w, _ = flow.shape
    fy = flow[..., 1].astype(jnp.float32)
    fx = flow[..., 0].astype(jnp.float32)
    if (hp, wp) != (h, w):
        fy = jnp.pad(fy, ((0, 0), (0, hp - h), (0, wp - w)))
        fx = jnp.pad(fx, ((0, 0), (0, hp - h), (0, wp - w)))
    lane = lambda f: jnp.broadcast_to(  # noqa: E731
        f[..., None], (n, hp, wp, c)).reshape(n, hp, wp * c)
    return lane(fy), lane(fx)


def _pad_img(x, hp: int, wp: int):
    n, h, w, c = x.shape
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    return x.reshape(n, hp, wp * c)


# --------------------------------------------------------------------------
# d(image): displacement-enumerated accumulation (scatter-free adjoint)
# --------------------------------------------------------------------------

def _dimage_kernel(fy_ref, fx_ref, g_ref, out_ref, *, c: int, th: int,
                   h: int, w: int, hp: int, wpc: int):
    """Grid (n, hp//th), SEQUENTIAL: programs of one image accumulate into
    the shared full-image output block.

    For destination tile rows [i0, i0+th): enumerate integer (dy, dx) over
    the tile's displacement range; elements whose floor-tap matches the
    enumerated offset contribute ``weight * g`` to source position
    (row + dy, lane + c*dx) — realised as a lane roll plus an 8-aligned
    row-slab accumulate with a mod-roll (wrapped rows only ever carry
    zero-mask contributions, as in the forward kernel's slab loads).
    """
    i0 = pl.program_id(1) * th

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[0] = jnp.zeros((hp, wpc), out_ref.dtype)

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, wpc), 0).astype(
        jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (th, wpc), 1)
    px = (lanes // c).astype(jnp.float32)

    syc = jnp.clip(i0 + rows + fy_ref[0], 0.0, h - 1.0)
    sxc = jnp.clip(px + fx_ref[0], 0.0, w - 1.0)
    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    wy = syc - y0
    wx = sxc - x0
    dyc = y0 - (i0 + rows)
    dxc = x0 - px

    # exclude alignment-padding lanes/rows from the enumeration range:
    # their clamped coords fake displacements as large as the padding
    # (w=32 -> wp=128 would add ~96 all-zero-weight dx iterations) while
    # their masks are zero anyway (padded g is zero)
    live = jnp.logical_and(px <= w - 1.0, i0 + rows <= h - 1.0)
    dyc_r = jnp.where(live, dyc, 0.0)
    dxc_r = jnp.where(live, dxc, 0.0)

    dy_lo = jnp.min(dyc_r).astype(jnp.int32)
    dy_hi = jnp.max(dyc_r).astype(jnp.int32) + 1
    dx_lo = jnp.min(dxc_r).astype(jnp.int32)
    dx_hi = jnp.max(dxc_r).astype(jnp.int32) + 1

    # cotangent arrives in its own dtype (bf16 under mixed precision) and
    # is converted after the VMEM load — exact, halves the HBM read
    g_t = g_ref[0].astype(jnp.float32)
    slab = min(th + 8, hp)
    pad_r = slab - th

    def y_body(dy, _):
        dyf = dy.astype(jnp.float32)
        w_y = jnp.where(dyc == dyf, 1.0 - wy, 0.0) + jnp.where(
            dyc == dyf - 1.0, wy, 0.0)
        row_start = i0 + dy
        q = jnp.clip((row_start // 8) * 8, 0, hp - slab)
        q = pl.multiple_of(q, 8)
        ry = jnp.mod(row_start - q, slab)

        def x_body(dx, _):
            dxf = dx.astype(jnp.float32)
            w_x = jnp.where(dxc == dxf, 1.0 - wx, 0.0) + jnp.where(
                dxc == dxf - 1.0, wx, 0.0)
            contrib = g_t * w_y * w_x
            if pad_r:
                contrib = jnp.concatenate(
                    [contrib, jnp.zeros((pad_r, wpc), contrib.dtype)], 0)
            contrib = pltpu.roll(contrib, ry, axis=0)
            contrib = pltpu.roll(contrib, jnp.mod(c * dx, wpc), axis=1)
            out_ref[0, pl.ds(q, slab), :] += contrib
            return 0

        return jax.lax.fori_loop(dx_lo, dx_hi + 1, x_body, 0)

    jax.lax.fori_loop(dy_lo, dy_hi + 1, y_body, 0)


def _dimage(g, flow, c: int, h: int, w: int, interpret: bool = False):
    """Adjoint wrt image: cotangent g (n, h, w, c) -> (n, h, w, c) fp32."""
    n = g.shape[0]
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    wpc = wp * c
    fy, fx = _lane_flow(flow, c, hp, wp)
    gl = _pad_img(g, hp, wp)

    grid = (n, hp // _TH)
    out = pl.pallas_call(
        functools.partial(_dimage_kernel, c=c, th=_TH, h=h, w=w, hp=hp,
                          wpc=wpc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, wpc), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, wpc), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, wpc), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wpc), lambda b, i: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wpc), jnp.float32),
        interpret=interpret,
    )(fy, fx, gl)
    return out.reshape(n, hp, wp, c)[:, :h, :w]


# --------------------------------------------------------------------------
# d(flow): forward-style tap-value accumulation
# --------------------------------------------------------------------------

def _dflow_kernel(fy_ref, fx_ref, g_ref, img_ref, dfy_ref, dfx_ref, *,
                  c: int, th: int, tw: int, h: int, w: int, hp: int,
                  wcp: int):
    """Forward-kernel slab structure (see _warp_kernel_rgb), accumulating
    the four bilinear tap VALUES instead of their weighted sum."""
    twc = tw * c
    i0 = pl.program_id(1) * th
    j0 = pl.program_id(2) * tw

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, twc), 0).astype(
        jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (th, twc), 1)
    px_abs = (j0 + lanes // c).astype(jnp.float32)
    ch_lane = lanes - c * (lanes // c)

    syc = jnp.clip(i0 + rows + fy_ref[0], 0.0, h - 1.0)
    sxc = jnp.clip(px_abs + fx_ref[0], 0.0, w - 1.0)
    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    wy = syc - y0
    wx = sxc - x0

    # tap coordinates CLAMPED like the gather path's indices: at the border
    # the two taps coincide, so their difference (the flow gradient) is
    # zero — without the clamp the second tap would read garbage under an
    # active mask (the forward kernel never needs this because its
    # fractional weight is zero there, but here the raw tap VALUE matters)
    y1 = jnp.minimum(y0 + 1.0, h - 1.0)
    dyc = y0 - (i0 + rows)
    dyc1 = y1 - (i0 + rows)
    # padded rows (last row tile) fake large negative displacements via the
    # coordinate clamp; their outputs are discarded, so keep them out of
    # the enumeration range
    live_r = (i0 + rows) <= h - 1.0
    dy_lo = jnp.min(jnp.where(live_r, dyc, 0.0)).astype(jnp.int32)
    dy_hi = jnp.max(jnp.where(live_r, dyc1, 0.0)).astype(jnp.int32)

    l0 = x0.astype(jnp.int32) * c + ch_lane
    l1 = jnp.minimum(x0.astype(jnp.int32) + 1, w - 1) * c + ch_lane
    blk0 = l0 // 128
    blk1 = l1 // 128
    b_lo = jnp.min(blk0)
    b_hi = jnp.max(blk1)

    slab_r = min(th + 8, hp)
    nt = twc // 128

    def y_body(dy, acc):
        dyf = dy.astype(jnp.float32)
        m_y0 = jnp.where(dyc == dyf, 1.0, 0.0)
        m_y1 = jnp.where(dyc1 == dyf, 1.0, 0.0)
        sy_start = i0 + dy
        q = jnp.clip((sy_start // 8) * 8, 0, hp - slab_r)
        q = pl.multiple_of(q, 8)
        ry = jnp.mod(sy_start - q, slab_r)

        def b_body(b, acc):
            a00, a01, a10, a11 = acc
            base = jnp.minimum(b * 128, wcp - 128)
            base = pl.multiple_of(base, 128)
            idx0 = jnp.clip(l0 - base, 0, 127)
            idx1 = jnp.clip(l1 - base, 0, 127)
            m_x0 = jnp.where(blk0 == b, 1.0, 0.0)
            m_x1 = jnp.where(blk1 == b, 1.0, 0.0)

            blk = img_ref[0, pl.ds(q, slab_r),
                          pl.ds(base, 128)].astype(jnp.float32)
            blk = pltpu.roll(blk, slab_r - ry, axis=0)
            slab = blk[:th, :]
            g0 = jnp.concatenate(
                [jnp.take_along_axis(slab, idx0[:, 128 * t:128 * (t + 1)],
                                     axis=1) for t in range(nt)], axis=1)
            g1 = jnp.concatenate(
                [jnp.take_along_axis(slab, idx1[:, 128 * t:128 * (t + 1)],
                                     axis=1) for t in range(nt)], axis=1)
            a00 = a00 + m_y0 * m_x0 * g0
            a01 = a01 + m_y0 * m_x1 * g1
            a10 = a10 + m_y1 * m_x0 * g0
            a11 = a11 + m_y1 * m_x1 * g1
            return a00, a01, a10, a11

        return jax.lax.fori_loop(b_lo, b_hi + 1, b_body, acc)

    zero = jnp.zeros((th, twc), jnp.float32)
    a00, a01, a10, a11 = jax.lax.fori_loop(
        dy_lo, dy_hi + 1, y_body, (zero, zero, zero, zero))

    # chain factor of the coordinate clamp: below 0 the clamped taps still
    # differ (y0=0, y1=1) but the function is constant in the flow, so the
    # gradient must be masked; at the UPPER clamp the taps coincide
    # (y1 = min(y0+1, h-1) = y0) and the difference self-zeroes.
    g_t = g_ref[0].astype(jnp.float32)
    m_x = jnp.where(px_abs + fx_ref[0] >= 0.0, 1.0, 0.0)
    m_yc = jnp.where(i0 + rows + fy_ref[0] >= 0.0, 1.0, 0.0)
    dfx_ref[0] = g_t * m_x * ((1.0 - wy) * (a01 - a00) + wy * (a11 - a10))
    dfy_ref[0] = g_t * m_yc * ((1.0 - wx) * (a10 - a00) + wx * (a11 - a01))


def _dflow(g, x, flow, interpret: bool = False):
    """Adjoint wrt flow: -> (n, h, w, 2) fp32 (lane sums done XLA-side)."""
    n, h, w, c = x.shape
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    wcp = wp * c
    fy, fx = _lane_flow(flow, c, hp, wp)
    gl = _pad_img(g, hp, wp)
    xi = _pad_img(x, hp, wp)  # the kernel casts after its VMEM loads

    grid = (n, hp // _TH, wp // _TW)
    dfy_l, dfx_l = pl.pallas_call(
        functools.partial(_dflow_kernel, c=c, th=_TH, tw=_TW, h=h, w=w,
                          hp=hp, wcp=wcp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wcp), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hp, wcp), jnp.float32),
            jax.ShapeDtypeStruct((n, hp, wcp), jnp.float32),
        ),
        interpret=interpret,
    )(fy, fx, gl, xi)

    dfy = dfy_l.reshape(n, hp, wp, c).sum(-1)[:, :h, :w]
    dfx = dfx_l.reshape(n, hp, wp, c).sum(-1)[:, :h, :w]
    return jnp.stack([dfx, dfy], axis=-1)


# --------------------------------------------------------------------------
# custom-VJP wrapper + dispatch
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_cvjp(x, flow, interpret):
    n, h, w, c = x.shape
    # x crosses HBM in its own dtype (the warp kernel converts to f32
    # after the VMEM load and accumulates taps in f32 — exact)
    out = backward_warp_rgb_flat(
        x.reshape(n, h, w * c), flow, c, interpret=interpret)
    return out.reshape(n, h, w, c).astype(x.dtype)


def _warp_cvjp_fwd(x, flow, interpret):
    return _warp_cvjp(x, flow, interpret), (x, flow)


def _warp_cvjp_bwd(interpret, res, g):
    x, flow = res
    n, h, w, c = x.shape
    dimg = _dimage(g, flow, c, h, w, interpret).astype(x.dtype)
    dflow = _dflow(g, x, flow, interpret).astype(flow.dtype)
    return dimg, dflow


_warp_cvjp.defvjp(_warp_cvjp_fwd, _warp_cvjp_bwd)


def _fits_vmem(h: int, w: int, c: int) -> bool:
    """The backward kernels hold one full fp32 image (dimage: the output;
    dflow: the source) in VMEM."""
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    return hp * wp * c * 4 <= 10 * 2 ** 20


def backward_warp_diff(x: jnp.ndarray, flow: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Differentiable backward warp: the Pallas custom-VJP path on TPU
    (or in interpret mode for tests), the gather path elsewhere.

    Drop-in replacement for ops.warp.backward_warp inside training steps;
    identical values (the Pallas forward is tested exactly equal) and
    gradient-equivalent (border-clamped taps zero the flow gradient the
    same way the gather path's clamped indices do).
    """
    n, h, w, c = x.shape
    use_pallas = interpret or (jax.default_backend() == "tpu"
                               and _fits_vmem(h, w, c))
    if not use_pallas:
        return backward_warp(x, flow)
    return _warp_cvjp(x, flow, interpret)
