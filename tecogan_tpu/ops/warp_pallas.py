"""Pallas TPU kernel for flow-guided backward warping.

XLA's per-element gather is the single slowest op in the frame-recurrent
pipeline on TPU (~20 ms per 536x1280 warp — slower than the whole SRNet).
This kernel replaces the gather with a *displacement-range enumeration*:

For each (8, 128) output tile, the set of integer displacements
(dy = source_row - dest_row, dx likewise) actually used inside the tile is
computed on the fly; the kernel loops over that (typically tiny) dynamic
range and accumulates ``weight_mask * shifted_slab`` with pure vector ops:

    out[i,j] = sum_{dy, dx}  Wy(i,j;dy) * Wx(i,j;dx) * x[i+dy, j+dx]

where Wy/Wx are the bilinear tap weights masked to the pixels whose floor
displacement equals (dy, dx). Because the flow field is produced by
upsampling a coarse, tanh-bounded FNet output it is locally smooth, so the
enumerated range per tile is a handful of values; the loop bounds are
data-dependent (lax.fori_loop), so correctness never depends on smoothness —
only speed does.

Border semantics: sample coordinates are clamped to the image box before
flooring, which is exactly grid_sample's 'border' padding; the image is
zero-padded by one tile on each side so every shifted slab read is in
bounds (masks are zero wherever padding could be read).

Numerical parity with ops.warp.backward_warp is covered by tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["backward_warp_pallas"]

# output tile: 32 rows amortises the per-tile coordinate setup and loop
# management (measured 1.18 -> 0.90 ms on a 536x1280x3 warp vs 8 rows;
# 40+ rows regress — the displacement range over a taller tile widens).
# Widening the tile loses too (tw 256/384/512 -> 0.94/1.02/1.09 ms vs
# 0.88 at 128): the wider x-extent inflates the lane-block enumeration
# and each block pass scans mostly-zero masks.
_TH, _TW = 32, 128


def _warp_kernel(fy_ref, fx_ref, img_ref, out_ref, acc_ref, *, c: int,
                 th: int, tw: int, h: int, w: int, hp: int, wp: int,
                 tiles_per_band: int = 0):
    """Per output tile:

    - sample coordinates are built IN-KERNEL from the raw flow tile (iota +
      flow, clipped to the image box == grid_sample border padding): the HR
      sy/sx tensors are never materialised in HBM;
    - the (data-dependent) range of integer VERTICAL displacements is
      enumerated; bilinear y-tap weights become masks on the tile;
    - per vertical displacement, the (<= 2-3) source 128-lane blocks are
      enumerated and per-pixel HORIZONTAL taps resolved with a per-lane
      gather (Mosaic tpu.dynamic_gather via take_along_axis);
    - the image is UNPADDED: slab starts are clamped into the buffer and a
      mod-roll realigns rows, so every read is in-bounds while the tap
      masks zero any wrapped row's contribution.

    ``tiles_per_band`` > 0 is the row-folded multi-stream mode: the image
    ref serves ONE stream's band (hp = band rows, h = its valid rows) and
    the row coordinate is taken RELATIVE to the band, so samples clamp to
    the tile's own stream instead of bleeding into its neighbours.
    """
    if tiles_per_band:
        i0 = (pl.program_id(1) % tiles_per_band) * th
    else:
        i0 = pl.program_id(1) * th
    j0 = pl.program_id(2) * tw

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0).astype(
        jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1).astype(
        jnp.float32)
    # flow tiles arrive in their producer's dtype (bf16 in the mixed-
    # precision path) and are cast in VMEM: a bf16->f32 convert is exact,
    # so this is bit-identical to casting on the host — minus the HBM
    # convert pass XLA would otherwise insert around the custom call
    syc = jnp.clip(i0 + rows + fy_ref[0].astype(jnp.float32), 0.0, h - 1.0)
    sxc = jnp.clip(j0 + cols + fx_ref[0].astype(jnp.float32), 0.0, w - 1.0)
    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    wy = syc - y0
    wx = sxc - x0

    # vertical displacement of the y0 tap relative to the slab origin row
    dyc = y0 - (i0 + rows)
    dy_lo = jnp.min(dyc).astype(jnp.int32)
    dy_hi = jnp.max(dyc).astype(jnp.int32) + 1  # +1 covers the y1 tap

    # 128-lane source blocks of the two horizontal taps
    blk0 = jnp.floor(x0 / 128.0)
    blk1 = jnp.floor((x0 + 1.0) / 128.0)
    b_lo = jnp.min(blk0).astype(jnp.int32)
    b_hi = jnp.max(blk1).astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    slab_rows = min(th + 8, hp)  # small images: the whole height

    # taps accumulate in an f32 VMEM scratch and convert ONCE on the final
    # tile write: the output buffer can be bf16 (half the HBM write + no
    # downstream convert pass) with numerics identical to f32 output
    for ch in range(c):
        acc_ref[ch] = jnp.zeros((th, tw), jnp.float32)

    def y_body(dy, _):
        dyf = dy.astype(jnp.float32)
        w_y = jnp.where(dyc == dyf, 1.0 - wy, 0.0) + jnp.where(
            dyc == dyf - 1.0, wy, 0.0)
        sy_start = i0 + dy
        # clamp the aligned slab start into the buffer; the mod-roll below
        # still maps out-row k to source row sy_start+k whenever that row is
        # in-bounds (wrapped rows only ever carry zero mask weight)
        qy = jnp.clip((sy_start // 8) * 8, 0, hp - slab_rows)
        qy = pl.multiple_of(qy, 8)
        ry = jnp.mod(sy_start - qy, slab_rows)

        def b_body(b, _):
            bf = b.astype(jnp.float32)
            base = jnp.minimum(b * 128, wp - 128)
            base = pl.multiple_of(base, 128)
            idx0 = jnp.clip(x0i - base, 0, 127)
            idx1 = jnp.clip(x0i + 1 - base, 0, 127)
            w_x0 = jnp.where(blk0 == bf, (1.0 - wx), 0.0) * w_y
            w_x1 = jnp.where(blk1 == bf, wx, 0.0) * w_y

            for ch in range(c):
                # cast after load: the image can stay bf16 in VMEM (the
                # dynamic rotate below requires 32-bit data)
                blk = img_ref[0, ch, pl.ds(qy, slab_rows),
                              pl.ds(base, 128)].astype(jnp.float32)
                blk = pltpu.roll(blk, slab_rows - ry, axis=0)
                slab = blk[:th, :]
                g0 = jnp.take_along_axis(slab, idx0, axis=1)
                g1 = jnp.take_along_axis(slab, idx1, axis=1)
                acc_ref[ch] += w_x0 * g0 + w_x1 * g1
            return 0

        return jax.lax.fori_loop(b_lo, b_hi + 1, b_body, 0)

    jax.lax.fori_loop(dy_lo, dy_hi + 1, y_body, 0)

    for ch in range(c):
        out_ref[0, ch] = acc_ref[ch].astype(out_ref.dtype)


def _warp_planes(planes: jnp.ndarray, flow: jnp.ndarray,
                 interpret: bool = False, band: int = 0,
                 band_valid: int = 0) -> jnp.ndarray:
    """Core: channel-major planes (n, c, h, w) + flow (n, h, w, 2) ->
    warped planes (n, c, h, w) in the planes dtype (taps accumulate in an
    f32 VMEM scratch regardless, so bf16 I/O costs no extra rounding).

    No HBM-side coordinate tensors and no halo padding: the only pads are
    the (usually zero) alignments of h to 8 and w to 128.

    ``band`` > 0 enables the row-folded multi-stream mode (serving): the
    rows are ``h // band`` independent stream bands of ``band`` rows
    (``band_valid`` of them valid); samples clamp within each band and
    VMEM holds one band (not the whole folded image) at a time. Requires
    band % 32 == 0 and h % band == 0.
    """
    n, c, h, w = planes.shape

    # no host-side f32 cast: the kernel casts flow tiles in VMEM (exact),
    # so a bf16 flow crosses HBM at half the bytes with no convert pass
    fy = flow[..., 1]
    fx = flow[..., 0]

    # align spatial dims to tile multiples (the padded outputs' coords clamp
    # inside the valid box; their outputs are discarded). Known cost, not
    # correctness: zero-padded flow rows sample their own (out-of-range)
    # location, clamp to row h-1, and widen the bottom tiles' displacement
    # enumeration by up to hp-h rows (wrapped reads carry zero weight).
    # The exact fix is the packed-planes path's absolute-coordinate
    # edge-pad, which needs a kernel-interface change (flow -> coords);
    # at the serving shape (536 -> 544, 1/17 of tile rows) the waste is
    # ~0.2% end-to-end, so the simpler interface is kept.
    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    if band:
        assert band % _TH == 0 and h % band == 0 and hp == h, (
            "folded mode needs 32-aligned bands and band-aligned height")
    if (hp, wp) != (h, w):
        fy = jnp.pad(fy, ((0, 0), (0, hp - h), (0, wp - w)))
        fx = jnp.pad(fx, ((0, 0), (0, hp - h), (0, wp - w)))
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    grid = (n, hp // _TH, wp // _TW)
    if band:
        tiles_per_band = band // _TH
        kern_h, kern_hp = band_valid, band
        img_spec = pl.BlockSpec(
            (1, c, band, wp),
            lambda b, i, j: (b, 0, i // tiles_per_band, 0),
            memory_space=pltpu.VMEM)
    else:
        tiles_per_band = 0
        kern_h, kern_hp = h, hp
        img_spec = pl.BlockSpec((1, c, hp, wp), lambda b, i, j: (b, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, c=c, th=_TH, tw=_TW, h=kern_h,
                          w=w, hp=kern_hp, wp=wp,
                          tiles_per_band=tiles_per_band),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            img_spec,
        ],
        out_specs=pl.BlockSpec((1, c, _TH, _TW),
                               lambda b, i, j: (b, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, hp, wp), planes.dtype),
        scratch_shapes=[pltpu.VMEM((c, _TH, _TW), jnp.float32)],
        interpret=interpret,
    )(fy, fx, planes)

    if (hp, wp) != (h, w):
        out = out[:, :, :h, :w]
    return out


def backward_warp_pallas(x: jnp.ndarray, flow: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.warp.backward_warp (NHWC in/out)."""
    out = _warp_planes(jnp.moveaxis(x, -1, 1), flow, interpret)
    return jnp.moveaxis(out, 1, -1).astype(x.dtype)


def _warp_kernel_phases(sy_ref, sx_ref, img_ref, out_ref, *, s: int,
                        th: int, tw: int, rowpad: int, colpad: int):
    """Fully-packed warp: all s*s output phases of a packed tile share the
    displacement enumeration and the slab loads.

    For source offset Yo = y0 - s*i_abs (bounded by the flow), the source
    packed plane row shift is floor(Yo/s) and the source y-phase Yo mod s —
    both constant per iteration, so slabs are aligned loads + rolls from ONE
    plane, reused by every output phase through per-phase tap masks. The
    grid iterates (batch, channel, tiles): one colour plane set in VMEM at a
    time keeps the footprint ~5 MB.
    """
    n_ph = s * s
    i0 = pl.program_id(2) * th
    j0 = pl.program_id(3) * tw

    rows_s = (s * (i0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0))
              ).astype(jnp.float32)
    cols_s = (s * (j0 + jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1))
              ).astype(jnp.float32)

    # safety net: displacements beyond the supported halo are clamped (the
    # FRNet flow bound keeps real flows well inside; out-of-contract flows
    # degrade to nearest-supported displacement instead of garbage reads)
    bound_y = float(s * (rowpad - 2))
    bound_x = float(s * (colpad - 2))

    yoff, xoff, wy, wx = [], [], [], []
    for ph in range(n_ph):
        syc = jnp.clip(sy_ref[0, ph], rows_s - bound_y, rows_s + bound_y)
        sxc = jnp.clip(sx_ref[0, ph], cols_s - bound_x, cols_s + bound_x)
        y0 = jnp.floor(syc)
        x0 = jnp.floor(sxc)
        wy.append(syc - y0)
        wx.append(sxc - x0)
        yoff.append(y0 - rows_s)  # integer-valued f32, ~ phase + flow
        xoff.append(x0 - cols_s)

    y_lo = jnp.min(jnp.stack([jnp.min(v) for v in yoff])).astype(jnp.int32)
    y_hi = jnp.max(jnp.stack([jnp.max(v) for v in yoff])).astype(jnp.int32)
    x_lo = jnp.min(jnp.stack([jnp.min(v) for v in xoff])).astype(jnp.int32)
    x_hi = jnp.max(jnp.stack([jnp.max(v) for v in xoff])).astype(jnp.int32)

    for k in range(n_ph):
        out_ref[0, 0, k] = jnp.zeros((th, tw), out_ref.dtype)

    def y_body(yo, _):
        yof = yo.astype(jnp.float32)
        spy = jnp.mod(yo, s)
        ysh = jnp.floor_divide(yo, s)
        w_y = [jnp.where(yoff[ph] == yof, 1.0 - wy[ph], 0.0)
               + jnp.where(yoff[ph] == yof - 1.0, wy[ph], 0.0)
               for ph in range(n_ph)]
        # clamp: iterations driven purely by tile-padding coords can push
        # the start negative; their masks are zero for all real pixels
        sy_start = jnp.maximum(i0 + ysh + rowpad, 0)
        qy = pl.multiple_of((sy_start // 8) * 8, 8)
        ry = sy_start - qy

        def x_body(xo, _):
            xof = xo.astype(jnp.float32)
            spx = jnp.mod(xo, s)
            xsh = jnp.floor_divide(xo, s)
            q = spy * s + spx
            col_start = jnp.maximum(j0 + xsh + colpad, 0)
            qx = pl.multiple_of((col_start // 128) * 128, 128)
            rx = col_start - qx
            blk = img_ref[0, q, 0, pl.ds(qy, th + 8),
                          pl.ds(qx, tw + 128)].astype(jnp.float32)
            blk = pltpu.roll(blk, (th + 8) - ry, axis=0)
            blk = pltpu.roll(blk, (tw + 128) - rx, axis=1)
            slab = blk[:th, :tw]
            for ph in range(n_ph):
                w_x = (jnp.where(xoff[ph] == xof, 1.0 - wx[ph], 0.0)
                       + jnp.where(xoff[ph] == xof - 1.0, wx[ph], 0.0))
                out_ref[0, 0, ph] += (w_y[ph] * w_x * slab).astype(
                    out_ref.dtype)
            return 0

        return jax.lax.fori_loop(x_lo, x_hi + 2, x_body, 0)

    jax.lax.fori_loop(y_lo, y_hi + 2, y_body, 0)


def backward_warp_packed_planes(planes: jnp.ndarray, sy: jnp.ndarray,
                                sx: jnp.ndarray, scale: int,
                                interpret: bool = False) -> jnp.ndarray:
    """Fully-packed warp over phase planes.

    Args:
        planes: (n, s*s, c, h, w) — phase plane (py*s+px) holds HR pixels
            (s*i+py, s*j+px); h, w are the LR/packed grid sizes.
        sy/sx:  (n, s*s, h, w) CLAMPED absolute HR sample coordinates for
            each output phase (phase plane q of the output receives HR pixel
            (s*i+py, s*j+px)'s warped value).

    Flow magnitudes must stay below ~s*47 HR pixels (FRNet's tanh-bounded
    flow plus bicubic overshoot satisfies this by construction).

    Returns (n, c, s*s, h, w) warped phase planes, dtype of ``planes``.
    """
    n, n_ph, c, h, w = planes.shape
    s = scale
    assert n_ph == s * s

    hp_t = -(-h // _TH) * _TH
    wp_t = -(-w // _TW) * _TW
    if (hp_t, wp_t) != (h, w):
        # EDGE padding: the padded outputs are discarded, but their
        # coordinates take part in the per-tile displacement enumeration —
        # zero padding would fake huge displacements (and out-of-bounds
        # slab reads) in the edge tiles
        pad = ((0, 0), (0, 0), (0, hp_t - h), (0, wp_t - w))
        sy = jnp.pad(sy, pad, mode="edge")
        sx = jnp.pad(sx, pad, mode="edge")

    # halo: displacement shifts are bounded by |flow|/s + 1 <= 48
    rowpad, colpad = 48, 48
    img = jnp.pad(planes, ((0, 0), (0, 0), (0, 0),
                           (rowpad, rowpad + (hp_t - h) + _TH + 8),
                           (colpad, colpad + (wp_t - w) + _TW + 128)))
    hpad, wpad = img.shape[3], img.shape[4]

    grid = (n, c, hp_t // _TH, wp_t // _TW)
    out = pl.pallas_call(
        functools.partial(_warp_kernel_phases, s=s, th=_TH, tw=_TW,
                          rowpad=rowpad, colpad=colpad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_ph, _TH, _TW),
                         lambda b, ch, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ph, _TH, _TW),
                         lambda b, ch, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_ph, 1, hpad, wpad),
                         lambda b, ch, i, j: (b, 0, ch, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n_ph, _TH, _TW),
                               lambda b, ch, i, j: (b, ch, 0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, n_ph, hp_t, wp_t),
                                       jnp.float32),
        interpret=interpret,
    )(sy, sx, img)

    return out[:, :, :, :h, :w].astype(planes.dtype)


def _warp_kernel_rgb(fy_ref, fx_ref, img_ref, out_ref, *, c: int, th: int,
                     tw: int, h: int, w: int, hp: int, wcp: int):
    """NHWC-native warp on channel-interleaved lanes.

    The image arrives as (h, w*c) — a FREE reshape of NHWC — so lane
    L = c*x + ch. One program computes (th, tw*c) output lanes = tw pixels
    of all c channels. fy/fx arrive pre-interleaved per lane (each pixel's
    flow repeated c times). Vertical displacements are enumerated with
    aligned slab loads + sublane rolls (as in `_warp_kernel`); horizontal
    taps are per-lane gathers at lane index c*x0 + ch (and +c for the
    second tap). No transposes anywhere: in NHWC, out NHWC.
    """
    twc = tw * c
    i0 = pl.program_id(1) * th
    j0 = pl.program_id(2) * tw  # pixel index of the tile's first pixel

    rows = jax.lax.broadcasted_iota(jnp.int32, (th, twc), 0).astype(
        jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (th, twc), 1)
    px_abs = (j0 + lanes // c).astype(jnp.float32)
    ch_lane = lanes - c * (lanes // c)  # L mod c

    syc = jnp.clip(i0 + rows + fy_ref[0], 0.0, h - 1.0)
    sxc = jnp.clip(px_abs + fx_ref[0], 0.0, w - 1.0)
    y0 = jnp.floor(syc)
    x0 = jnp.floor(sxc)
    wy = syc - y0
    wx = sxc - x0

    dyc = y0 - (i0 + rows)
    dy_lo = jnp.min(dyc).astype(jnp.int32)
    dy_hi = jnp.max(dyc).astype(jnp.int32) + 1

    l0 = x0.astype(jnp.int32) * c + ch_lane  # absolute lane of the x0 tap
    l1 = l0 + c

    blk0 = l0 // 128
    blk1 = l1 // 128
    b_lo = jnp.min(blk0)
    b_hi = jnp.max(blk1)

    slab_r = min(th + 8, hp)
    nt = twc // 128

    out_ref[0] = jnp.zeros((th, twc), out_ref.dtype)

    def y_body(dy, _):
        dyf = dy.astype(jnp.float32)
        w_y = jnp.where(dyc == dyf, 1.0 - wy, 0.0) + jnp.where(
            dyc == dyf - 1.0, wy, 0.0)
        sy_start = i0 + dy
        qy = jnp.clip((sy_start // 8) * 8, 0, hp - slab_r)
        qy = pl.multiple_of(qy, 8)
        ry = jnp.mod(sy_start - qy, slab_r)

        def b_body(b, _):
            base = jnp.minimum(b * 128, wcp - 128)
            base = pl.multiple_of(base, 128)
            idx0 = jnp.clip(l0 - base, 0, 127)
            idx1 = jnp.clip(l1 - base, 0, 127)
            w_x0 = jnp.where(blk0 == b, (1.0 - wx), 0.0) * w_y
            w_x1 = jnp.where(blk1 == b, wx, 0.0) * w_y

            blk = img_ref[0, pl.ds(qy, slab_r),
                          pl.ds(base, 128)].astype(jnp.float32)
            blk = pltpu.roll(blk, slab_r - ry, axis=0)
            slab = blk[:th, :]
            # tpu.dynamic_gather sources one 128-lane vreg: gather each
            # output lane-tile separately from the same slab
            g0 = jnp.concatenate(
                [jnp.take_along_axis(slab, idx0[:, 128 * t:128 * (t + 1)],
                                     axis=1) for t in range(nt)], axis=1)
            g1 = jnp.concatenate(
                [jnp.take_along_axis(slab, idx1[:, 128 * t:128 * (t + 1)],
                                     axis=1) for t in range(nt)], axis=1)
            out_ref[0] += (w_x0 * g0 + w_x1 * g1).astype(out_ref.dtype)
            return 0

        return jax.lax.fori_loop(b_lo, b_hi + 1, b_body, 0)

    jax.lax.fori_loop(dy_lo, dy_hi + 1, y_body, 0)


def backward_warp_rgb_flat(xi: jnp.ndarray, flow: jnp.ndarray, c: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Channel-interleaved flat warp: (n, h, w*c) in -> (n, h, w*c) out.

    The flat form IS the NHWC memory layout; keeping tensors flat avoids
    XLA's padded physical layouts for small-channel-minor NHWC shapes.
    """
    n, h, wc = xi.shape
    w = wc // c
    ft = jnp.float32

    fy = flow[..., 1].astype(ft)
    fx = flow[..., 0].astype(ft)

    hp = -(-h // _TH) * _TH
    wp = -(-w // _TW) * _TW
    if (hp, wp) != (h, w):
        fy = jnp.pad(fy, ((0, 0), (0, hp - h), (0, wp - w)))
        fx = jnp.pad(fx, ((0, 0), (0, hp - h), (0, wp - w)))
        xi = jnp.pad(xi.reshape(n, h, w, c),
                     ((0, 0), (0, hp - h), (0, wp - w), (0, 0))).reshape(
                         n, hp, wp * c)

    # per-lane flow: each pixel's value repeated c times (lane-minor)
    fyl = jnp.broadcast_to(fy[..., None], (n, hp, wp, c)).reshape(
        n, hp, wp * c)
    fxl = jnp.broadcast_to(fx[..., None], (n, hp, wp, c)).reshape(
        n, hp, wp * c)
    wcp = wp * c

    grid = (n, hp // _TH, wp // _TW)
    out = pl.pallas_call(
        functools.partial(_warp_kernel_rgb, c=c, th=_TH, tw=_TW, h=h, w=w,
                          hp=hp, wcp=wcp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW * c), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wcp), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TH, _TW * c),
                               lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wcp), jnp.float32),
        interpret=interpret,
    )(fyl, fxl, xi)

    if (hp, wp) != (h, w):
        out = out.reshape(n, hp, wp, c)[:, :h, :w].reshape(n, h, w * c)
    return out.astype(xi.dtype)


def backward_warp_rgb(x: jnp.ndarray, flow: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """NHWC in / NHWC out warp with zero layout changes.

    Drop-in equivalent of ops.warp.backward_warp for small channel counts
    (the image is viewed as channel-interleaved lanes via a free reshape).
    """
    n, h, w, c = x.shape
    out = backward_warp_rgb_flat(x.reshape(n, h, w * c), flow, c,
                                 interpret=interpret)
    return out.reshape(n, h, w, c)


def backward_warp_pallas_packed(hr_packed2: jnp.ndarray, flow: jnp.ndarray,
                                scale: int,
                                interpret: bool = False) -> jnp.ndarray:
    """Packed-carry warp for the streaming recurrence.

    Input: the previous HR frame in the SR tail's packed-2x layout
    (n, H/2, W/2, 4c), channel = (r*2+t)*c + ch. Output: the warped frame
    already in space_to_depth(., scale) layout (n, H/s, W/s, s*s*c) — the
    exact input of SRNet's conv_in. The HR image itself is never
    materialised in NHWC; the only relayouts are plane transposes, which
    profiling showed are ~2x cheaper than depth_to_space + space_to_depth
    round trips at full resolution.
    """
    n, h2, w2, c4 = hr_packed2.shape
    c = c4 // 4
    hh, ww = 2 * h2, 2 * w2

    # packed2 -> channel-major HR planes (n, c, H, W)
    t = hr_packed2.reshape(n, h2, w2, 2, 2, c)
    t = t.transpose(0, 5, 1, 3, 2, 4)  # (n, c, h2, r, w2, t)
    planes = t.reshape(n, c, hh, ww)

    out = _warp_planes(planes, flow, interpret)  # (n, c, H, W) fp32

    # planes -> space_to_depth(., scale) layout (n, H/s, W/s, s*s*c)
    s = scale
    t = out.reshape(n, c, hh // s, s, ww // s, s)
    t = t.transpose(0, 2, 4, 3, 5, 1)  # (n, h, w, dy, dx, c)
    return t.reshape(n, hh // s, ww // s, s * s * c).astype(hr_packed2.dtype)
