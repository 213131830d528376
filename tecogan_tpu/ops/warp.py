"""Flow-guided backward warping (bilinear gather with border clamp).

TPU-native replacement for CUDA ``F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)`` as used by the reference's
``backward_warp`` (`codes/utils/net_utils.py:50-82`).

With align_corners=True the reference's normalized mesh grid + flow
normalization reduces to sampling input pixel ``(j + flow_x, i + flow_y)``
with coordinates clamped to the image bounds — so we skip the normalized
round-trip entirely and gather directly, which is both exact and cheaper.

Numerical parity with grid_sample is covered by tests/test_warp.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["backward_warp", "backward_warp_window"]


def backward_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp ``x`` backward along ``flow``.

    Args:
        x: source images, shape (n, h, w, c).
        flow: displacement field, shape (n, h, w, 2); channel 0 is the
            horizontal (width/x) displacement, channel 1 vertical (height/y),
            in pixels — matching the reference flow convention.

    Returns:
        Warped images (n, h, w, c): ``out[i, j] = x[i + fy, j + fx]`` sampled
        bilinearly with border clamping.
    """
    n, h, w, c = x.shape
    # coordinates/weights always in fp32: bf16 cannot represent pixel
    # indices beyond 256, which would corrupt HR-resolution warps
    ft = jnp.promote_types(flow.dtype, jnp.float32)
    flow = flow.astype(ft)

    sx = jnp.arange(w, dtype=ft)[None, None, :] + flow[..., 0]
    sy = jnp.arange(h, dtype=ft)[None, :, None] + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)

    def gather(img, yi, xi):
        return img[yi, xi]  # (h, w, c) indexed by (h, w) grids -> (h, w, c)

    g = jax.vmap(gather)
    v00 = g(x, y0i, x0i)
    v01 = g(x, y0i, x1i)
    v10 = g(x, y1i, x0i)
    v11 = g(x, y1i, x1i)

    wx = wx.astype(x.dtype)
    wy = wy.astype(x.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def backward_warp_window(x: jnp.ndarray, flow: jnp.ndarray, out_y0,
                         x_y0, h_glob: int) -> jnp.ndarray:
    """Row-windowed ``backward_warp`` for spatially-partitioned inference.

    Samples a row SLAB of a taller global image: ``x`` (n, hx, w, c) holds
    global rows ``[x_y0, x_y0 + hx)`` of an ``h_glob``-row image, and the
    output lives at global rows ``[out_y0, out_y0 + ho)`` where ``ho`` is
    ``flow``'s row count. Vertical sample coordinates are clamped at the
    GLOBAL image border (exactly like ``backward_warp`` on the full image),
    then translated into the slab; the caller guarantees the slab covers
    every clamped sample of the rows it will keep (|flow_y| bound + halo).
    Pre-clamping the float coordinate is exact: beyond the border both
    bilinear taps collapse onto the border row, which is what the unclamped
    coordinate's clipped integer taps produce too.

    ``out_y0`` / ``x_y0`` may be traced scalars (mesh-position dependent).

    Bit-exactness: all FLOAT math (floor, bilinear weights) happens in
    GLOBAL coordinates, identical op-for-op to ``backward_warp`` — adding
    the slab offset to the float coordinate first would perturb the
    fractional part by an ulp and break the SP path's bit-identical
    guarantee. Only the already-clamped integer taps are translated into
    the slab (exact integer arithmetic).
    """
    n, hx, w, c = x.shape
    ho = flow.shape[1]
    ft = jnp.promote_types(flow.dtype, jnp.float32)
    flow = flow.astype(ft)

    # global float coordinates; out_y0 + arange == the global arange
    # segment exactly (integers are exact in fp32 at image scales)
    sx = jnp.arange(w, dtype=ft)[None, None, :] + flow[..., 0]
    sy = jnp.asarray(out_y0, ft) + jnp.arange(ho, dtype=ft)[None, :, None] \
        + flow[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    # clamp at the GLOBAL border, then translate into the slab; the local
    # clip can only fire for rows outside the caller's validity guarantee
    # (discarded halo garbage)
    y0g = jnp.clip(y0.astype(jnp.int32), 0, h_glob - 1)
    y1g = jnp.clip(y0.astype(jnp.int32) + 1, 0, h_glob - 1)
    off = jnp.asarray(x_y0, jnp.int32)
    y0i = jnp.clip(y0g - off, 0, hx - 1)
    y1i = jnp.clip(y1g - off, 0, hx - 1)

    def gather(img, yi, xi):
        return img[yi, xi]

    g = jax.vmap(gather)
    v00 = g(x, y0i, x0i)
    v01 = g(x, y0i, x1i)
    v10 = g(x, y1i, x0i)
    v11 = g(x, y1i, x1i)

    wx = wx.astype(x.dtype)
    wy = wy.astype(x.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy
