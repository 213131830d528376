"""SRNet — reconstruction + upsampling trunk of the frame-recurrent generator.

Behavioural spec from the reference (`tecogan_nets.py:85-147`):
- input conv over concat(lr_curr, space_to_depth(warped hr_prev)) i.e.
  (scale^2 + 1) * C channels -> nf, ReLU;
- ``nb`` residual blocks without BN (conv-ReLU-conv + skip);
- one (2x) or two (4x) transposed-conv 2x upsampling stages
  (k=3, s=2, p=1, op=1) each followed by ReLU;
- output conv + global residual: the bicubic/bilinear-upsampled lr frame.

TPU-native tail: the LAST upsampling stage stays in the PACKED (pre-
interleave sub-pixel) domain — the trailing ReLU, the 3x3 output conv
(re-expressed over packed channels via ``nn.pack_conv3x3_kernel``) and the
global residual (phase-decomposed operator matrices) all run at HALF the
output resolution with full-lane channel counts. Profiling showed the naive
HR tail (ReLU + 3-channel conv at full resolution) costs ~2.7 ms/frame in
relayouts and 3-lane convs; the packed tail is numerically exact and avoids
materialising the HR image until one final depth_to_space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...ops import depth_to_space
from ...ops.resize import apply_separable, resize_matrix


def init_srnet(key, in_nc: int = 3, out_nc: int = 3, nf: int = 64,
               nb: int = 10, scale: int = 4):
    params = {}
    keys = iter(jax.random.split(key, 4 + 2 * nb + 2))
    params["conv_in"] = nn.init_conv(
        next(keys), 3, 3, (scale ** 2 + 1) * in_nc, nf)
    for bi in range(nb):
        params[f"res{bi}_0"] = nn.init_conv(next(keys), 3, 3, nf, nf)
        params[f"res{bi}_1"] = nn.init_conv(next(keys), 3, 3, nf, nf)
    n_up = 2 if scale == 4 else 1
    for ui in range(n_up):
        params[f"up{ui}"] = nn.init_conv_transpose(next(keys), 3, 3, nf, nf)
    params["conv_out"] = nn.init_conv(next(keys), 3, 3, nf, out_nc)
    return params


def _upsample_mode(degradation: str) -> str:
    return "bilinear_half_pixel" if degradation == "BI" else "tecogan_bicubic"


def _residual_packed(lr, scale: int, degradation: str, mh_override=None):
    """Global residual upsample emitted directly in the packed-2x layout.

    Returns (n, s*h/2, s*w/2, 4*c) with channel = (r*2+t)*c + ch, equal to
    space_to_depth(upsample(lr), 2). The vertical pass is one operator-
    matrix matmul; the horizontal pass is arranged with the OUTPUT width in
    the minor dimension (full lanes) and phases split by free reshapes.

    ``mh_override`` replaces the vertical operator matrix (the row-folded
    serving mode passes a per-stream block-diagonal matrix so streams do
    not mix in the vertical pass).
    """
    n, h, w, c = lr.shape
    mode = _upsample_mode(degradation)
    if mh_override is not None:
        mh = jnp.asarray(mh_override, lr.dtype)
    else:
        mh = jnp.asarray(resize_matrix(mode, h, scale=scale), lr.dtype)
    mw = jnp.asarray(resize_matrix(mode, w, scale=scale), lr.dtype)
    sh, sw = scale * h, scale * w

    v = jnp.einsum("Oh,nhwc->nOwc", mh, lr)          # (n, sh, w, c)
    v = v.reshape(n, sh // 2, 2, w, c)               # rows -> (cell, phase)
    hz = jnp.einsum("Pw,nUrwc->nUrcP", mw, v)        # (n, U, 2, c, sw)
    hz = hz.reshape(n, sh // 2, 2, c, sw // 2, 2)
    # -> (n, U, V, r, t, c) -> (n, U, V, 4c)
    out = hz.transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(n, sh // 2, sw // 2, 4 * c)


def _residual_packed4(lr, degradation: str):
    """Global residual upsample emitted directly in the packed-4x layout
    (scale 4 only): (n, h, w, c) -> (n, h, w, 16*c) with channel
    = (r*4+t)*c + ch, equal to space_to_depth(upsample(lr), 4). Same
    operator-matrix structure as ``_residual_packed``; the phase splits
    are free row-major reshapes."""
    n, h, w, c = lr.shape
    mode = _upsample_mode(degradation)
    mh = jnp.asarray(resize_matrix(mode, h, scale=4), lr.dtype)
    mw = jnp.asarray(resize_matrix(mode, w, scale=4), lr.dtype)

    v = jnp.einsum("Oh,nhwc->nOwc", mh, lr)          # (n, 4h, w, c)
    v = v.reshape(n, h, 4, w, c)                     # rows -> (cell, phase)
    hz = jnp.einsum("Pw,nUrwc->nUrcP", mw, v)        # (n, h, 4, c, 4w)
    hz = hz.reshape(n, h, 4, c, w, 4)
    out = hz.transpose(0, 1, 4, 2, 5, 3)             # (n, h, w, r, t, c)
    return out.reshape(n, h, w, 16 * c)


def upsample_residual(lr, scale: int, degradation: str):
    """Reference-layout (HR NHWC) global residual, for the non-packed path."""
    mode = _upsample_mode(degradation)
    mh = resize_matrix(mode, lr.shape[-3], scale=scale)
    mw = resize_matrix(mode, lr.shape[-2], scale=scale)
    return apply_separable(lr, mh, mw)


def fold_conv_in_weights(w_in: jnp.ndarray, in_nc: int, scale: int):
    """Split conv_in's kernel into (lr 3x3 conv, W-folded HR conv).

    ``space_to_depth(hr, s)`` followed by conv_in's 3x3 is EXACTLY a
    (3s, 3)-kernel stride-(s, 1) convolution over the W-folded HR image
    (a free reshape (H, W, c) -> (H, W/s, s*c)): folded-kernel row
    dy = s*tY + py and folded channel c*px + ch address conv_in tap
    (tY, tX) at s2d channel (py*s+px)*c + ch. Zero relayout, zero extra
    FLOPs — the s2d transpose becomes a weight reshuffle done once.

    Returns (w_lr (3,3,c,nf), w_hr (3s,3,s*c,nf)).
    """
    c, s = in_nc, scale
    nf = w_in.shape[-1]
    w_lr = w_in[:, :, :c, :]
    # s2d channel index (py*s+px)*c+ch -> [ty,tx,py,px,ch,nf], then regroup
    w_s2d = w_in[:, :, c:, :].reshape(3, 3, s, s, c, nf)
    w_hr = w_s2d.transpose(0, 2, 1, 3, 4, 5).reshape(3 * s, 3, s * c, nf)
    return w_lr, w_hr


def conv_out_residual_packed(params, outp, lr_curr, scale: int,
                             degradation: str, residual_mh=None):
    """Packed-domain SR-tail finish: conv_out + bias + global residual,
    (n, sh/2, sw/2, 4*nf) -> packed2 (n, sh/2, sw/2, 4*out_nc).

    conv_out runs as the 2x2-tap phase-shifted packed conv
    (``nn.pack_conv3x3_as2x2_kernel``): 2.2x less MXU work than the dense
    3x3 packed kernel, exact numerics. Output channels are padded to 128
    for XLA's full-lane conv fast path (measured 5x faster than the
    natural 12-channel conv), then sliced back.
    """
    w2 = nn.pack_conv3x3_as2x2_kernel(params["conv_out"]["w"])
    c_out = w2.shape[-1]
    pad_c = max(0, 128 - c_out)
    w2p = jnp.pad(w2, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    z = jax.lax.conv_general_dilated(
        outp, w2p.astype(outp.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :c_out]
    out = nn.packed2_phase_unshift(z, c_out // 4)
    out = out + jnp.tile(params["conv_out"]["b"], 4).astype(out.dtype)
    return out + _residual_packed(lr_curr, scale, degradation,
                                  mh_override=residual_mh).astype(out.dtype)


def conv_out_residual_packed4(params, outp, lr_curr, degradation: str):
    """Packed-4 SR-tail finish (scale 4): conv_out + bias + global
    residual, (n, sh/2, sw/2, 4*nf) -> packed4 (n, h, w, 16*out_nc).

    conv_out runs as a stride-2 3x3-tap conv over the packed-2 up1
    emission (``nn.pack_conv3x3_p2p4_kernel``): each output position
    carries 16 phases (48 channels) toward the MXU's 128-lane output
    floor instead of packed-2's 4 (12), cutting the billed M*K by 1.8x —
    the conv_out matmul was the single largest op of the streaming-
    inference trace (0.24 ms/frame at 134x320, PARITY.md round 3).
    Output channels padded to 128 for the full-lane conv fast path.
    """
    w4 = nn.pack_conv3x3_p2p4_kernel(params["conv_out"]["w"])
    c_out = w4.shape[-1]  # 16 * out_nc
    pad_c = max(0, 128 - c_out)
    w4p = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    z = jax.lax.conv_general_dilated(
        outp, w4p.astype(outp.dtype), (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :c_out]
    out = nn.packed4_phase_unshift(z, c_out // 16)
    out = out + jnp.tile(params["conv_out"]["b"], 16).astype(out.dtype)
    return out + _residual_packed4(lr_curr, degradation).astype(out.dtype)


def srnet_apply_hr(params, lr_curr: jnp.ndarray, hr_warp_flat: jnp.ndarray,
                   nb: int, scale: int, degradation: str,
                   return_packed: bool = False) -> jnp.ndarray:
    """SRNet over the UNPACKED warped HR frame, kept FLAT (n, sh, sw*c).

    Equal to ``srnet_apply(params, lr_curr, space_to_depth(hr, s), ...)``
    but with the space_to_depth absorbed into conv_in via
    ``fold_conv_in_weights`` — no packed intermediate ever materialises.
    The HR frame stays in its flat (row, w*c) form throughout the streaming
    recurrence: all needed views (NHWC, W-folded) are free reshapes of it,
    and the flat form avoids XLA's padded physical layouts for
    small-channel-minor NHWC tensors. Returns the flat HR frame.
    """
    n, h, w, c = lr_curr.shape
    s = scale
    w_lr, w_hr = fold_conv_in_weights(params["conv_in"]["w"], c, s)

    hr_folded = hr_warp_flat.reshape(n, s * h, w, s * c)  # FREE reshape
    out = jax.lax.conv_general_dilated(
        hr_folded, w_hr.astype(hr_folded.dtype), (s, 1), ((s, s), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out + jax.lax.conv_general_dilated(
        lr_curr, w_lr.astype(lr_curr.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = nn.relu(out + params["conv_in"]["b"].astype(out.dtype))

    for bi in range(nb):
        res = nn.relu(nn.conv2d(params[f"res{bi}_0"], out, padding=1))
        res = nn.conv2d(params[f"res{bi}_1"], res, padding=1)
        out = out + res
    n_up = 2 if scale == 4 else 1
    for ui in range(n_up - 1):
        out = nn.relu(nn.conv2d_transpose(params[f"up{ui}"], out))

    outp = nn.relu(nn.conv2d_transpose_packed(params[f"up{n_up - 1}"], out))
    outp = conv_out_residual_packed(params, outp, lr_curr, scale,
                                    degradation)
    if return_packed:
        return outp  # packed2 (n, sh/2, sw/2, 4c)

    # NOTE: a Pallas static-shuffle interleave was tried here and REGRESSED:
    # pallas_call forces a standard layout on its operand, which pushed a
    # (much larger) relayout inside the conv_out fusion (0.54 -> 3.0 ms).
    # XLA's own d2s is the cheapest crossing for this 12-channel tensor.
    hr = depth_to_space(outp, 2)
    return hr.reshape(n, s * h, s * w * c)


def srnet_apply_planes(params, lr_curr: jnp.ndarray, warped_planes,
                       nb: int, scale: int, degradation: str,
                       row_masks=None, residual_mh=None,
                       packed4: bool = False) -> jnp.ndarray:
    """SRNet over channel-major warped HR planes (n, c, sh, sw) -> packed2.

    The streaming fast path: the Pallas warp emits planes, and conv_in+s2d
    is evaluated DIRECTLY on them as per-colour W-folded stride-(s,1)
    convolutions (free reshapes of each plane) — the planes->space_to_depth
    transpose that cost ~0.9 ms/frame never materialises. Output stays in
    the packed-2x layout (the conv_out's natural emission), which is both
    the recurrence carry and the quantisation input.

    ``row_masks`` (serving row-folded mode): {'lr': (1, h, 1, 1),
    'up': (1, 2h, 1, 1)} 0/1 masks zeroing the inter-stream guard rows
    after every convolution — guard inputs are zero exactly where a
    standalone stream's zero padding would be, keeping per-stream outputs
    bit-identical to the unfolded path. ``residual_mh`` overrides the
    vertical residual operator (a per-stream block-diagonal matrix in the
    folded mode).
    """
    n, h, w, c = lr_curr.shape
    s = scale
    w_lr, w_hr = fold_conv_in_weights(params["conv_in"]["w"], c, s)
    m_lr = row_masks.get("lr") if row_masks else None
    m_up = row_masks.get("up") if row_masks else None
    mask = lambda x, m: x if m is None else x * m.astype(x.dtype)

    out = jax.lax.conv_general_dilated(
        lr_curr, w_lr.astype(lr_curr.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # ONE s*c-feature folded conv over the channel-concatenated W-folded
    # views instead of c chained s-feature convs: the few-feature folded
    # conv is emitter-bound on TPU (feature-in-sublanes packing), measured
    # 0.236 -> ~0.00 ms/frame at the 4x serving shape (the concat of free
    # reshapes fuses into the conv's operand build, where the per-channel
    # chain paid 3 operand relayout copies + 3 sequential low-K passes).
    # Feature order of the concat is ch*s+px; fold_conv_in_weights emits
    # px*c+ch, so regroup the kernel once (free at trace time).
    xf = jnp.concatenate(
        [warped_planes[:, ch].reshape(n, s * h, w, s)  # free reshape
         for ch in range(c)], axis=-1)
    w_hr_cm = w_hr.reshape(3 * s, 3, s, c, -1).transpose(0, 1, 3, 2, 4)
    w_hr_cm = w_hr_cm.reshape(3 * s, 3, s * c, -1)
    out = out + jax.lax.conv_general_dilated(
        xf, w_hr_cm.astype(xf.dtype), (s, 1), ((s, s), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = mask(nn.relu(out + params["conv_in"]["b"].astype(out.dtype)), m_lr)

    for bi in range(nb):
        res = mask(nn.relu(nn.conv2d(params[f"res{bi}_0"], out, padding=1)),
                   m_lr)
        res = mask(nn.conv2d(params[f"res{bi}_1"], res, padding=1), m_lr)
        out = out + res
    n_up = 2 if scale == 4 else 1
    for ui in range(n_up - 1):
        out = mask(nn.relu(nn.conv2d_transpose(params[f"up{ui}"], out)),
                   m_up)

    outp = mask(
        nn.relu(nn.conv2d_transpose_packed(params[f"up{n_up - 1}"], out)),
        m_up if scale == 4 else m_lr)
    if packed4:
        assert scale == 4 and row_masks is None and residual_mh is None
        return conv_out_residual_packed4(params, outp, lr_curr, degradation)
    return conv_out_residual_packed(params, outp, lr_curr, scale,
                                    degradation, residual_mh=residual_mh)


def _blockdiag2(w):
    """(kh, kw, ci, co) conv kernel -> (kh, kw, 2ci, 2co) block-diagonal:
    two independent streams run as ONE conv with doubled channels. On the
    128-lane MXU a 64-channel conv costs the same as a 128-channel one
    (K<=128 and N<=128 each bill a full pass), so pairing two streams
    halves their trunk conv time with zero numerical change (the
    off-diagonal zero blocks contribute exact zeros)."""
    kh, kw, ci, co = w.shape
    z = jnp.zeros((kh, kw, ci, co), w.dtype)
    return jnp.concatenate([
        jnp.concatenate([w, z], axis=3),
        jnp.concatenate([z, w], axis=3)], axis=2)


def pair_srnet_params(params, in_nc: int, scale: int, nb: int):
    """Derived block-diagonal weights for the stream-paired serving trunk
    (conv_in + residual blocks + the first upsample stage; the packed tail
    is lane-neutral under pairing and runs per-stream)."""
    s = scale
    w_lr, w_hr = fold_conv_in_weights(params["conv_in"]["w"], in_nc, s)
    pp = {
        "w_lr2": _blockdiag2(w_lr),
        "b_in2": jnp.concatenate([params["conv_in"]["b"]] * 2),
    }
    hrs = []
    for q in range(2):
        for ch in range(in_nc):
            wk = w_hr[:, :, ch::in_nc, :]  # (3s, 3, s, nf)
            zz = jnp.zeros_like(wk)
            hrs.append(jnp.concatenate([wk, zz] if q == 0 else [zz, wk],
                                       axis=3))
    # ONE (3s, 3, 2c*s, 2nf) folded kernel (input features in ch2*s+px
    # order, matching the apply's concat of free plane reshapes): the
    # per-channel chained formulation is emitter-bound on TPU — same
    # fusion as srnet_apply_planes' single s*c-feature conv
    pp["w_hr2"] = jnp.concatenate(hrs, axis=2)
    for bi in range(nb):
        for half in (0, 1):
            src = params[f"res{bi}_{half}"]
            pp[f"res{bi}_{half}"] = {
                "w": _blockdiag2(src["w"]),
                "b": jnp.concatenate([src["b"]] * 2),
            }
    if scale == 4:
        pp["up0"] = {"w": _blockdiag2(params["up0"]["w"]),
                     "b": jnp.concatenate([params["up0"]["b"]] * 2)}
    return pp


def srnet_apply_planes_paired(pp, params, lr_curr, warped_planes, nb: int,
                              scale: int, degradation: str) -> jnp.ndarray:
    """Stream-paired variant of ``srnet_apply_planes``: consecutive stream
    pairs share one 2*nf-channel trunk (block-diagonal weights fill the
    MXU lanes a 64-channel conv leaves idle), then split back to
    per-stream batch for the lane-neutral packed tail. Exact per-stream
    numerics modulo fp accumulation over the zero blocks.

    lr_curr (n, h, w, c), warped_planes (n, c, sh, sw); n must be even.
    """
    n, h, w, c = lr_curr.shape
    assert n % 2 == 0, "stream pairing needs an even stream count"
    m, s = n // 2, scale
    nf = params["conv_in"]["w"].shape[-1]

    lr_pair = lr_curr.reshape(m, 2, h, w, c).transpose(0, 2, 3, 1, 4)
    lr_pair = lr_pair.reshape(m, h, w, 2 * c)
    planes_pair = warped_planes.reshape(m, 2 * c, s * h, s * w)

    out = jax.lax.conv_general_dilated(
        lr_pair, pp["w_lr2"].astype(lr_pair.dtype), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xf = jnp.concatenate(
        [planes_pair[:, ch2].reshape(m, s * h, w, s)  # free reshape
         for ch2 in range(2 * c)], axis=-1)
    out = out + jax.lax.conv_general_dilated(
        xf, pp["w_hr2"].astype(xf.dtype), (s, 1),
        ((s, s), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = nn.relu(out + pp["b_in2"].astype(out.dtype))

    for bi in range(nb):
        res = nn.relu(nn.conv2d(pp[f"res{bi}_0"], out, padding=1))
        res = nn.conv2d(pp[f"res{bi}_1"], res, padding=1)
        out = out + res
    if scale == 4:
        out = nn.relu(nn.conv2d_transpose(pp["up0"], out))

    # split the pair channels back to per-stream batch for the tail
    hh, ww_ = out.shape[1], out.shape[2]
    out = out.reshape(m, hh, ww_, 2, nf).transpose(0, 3, 1, 2, 4)
    out = out.reshape(n, hh, ww_, nf)

    n_up = 2 if scale == 4 else 1
    outp = nn.relu(nn.conv2d_transpose_packed(params[f"up{n_up - 1}"], out))
    return conv_out_residual_packed(params, outp, lr_curr, scale,
                                    degradation)


def srnet_apply(params, lr_curr: jnp.ndarray, hr_prev_packed: jnp.ndarray,
                nb: int, scale: int, degradation: str,
                packed_tail: bool = True,
                return_packed: bool = False) -> jnp.ndarray:
    """lr_curr (n,h,w,c) + hr_prev_packed (n,h,w,s*s*c) -> hr (n,sh,sw,c),
    or the packed-2x form (n,sh/2,sw/2,4c) when ``return_packed`` (used by
    the streaming recurrence, which warps straight from the packed layout).
    """
    out = jnp.concatenate([lr_curr, hr_prev_packed], axis=-1)
    out = nn.relu(nn.conv2d(params["conv_in"], out, padding=1))
    for bi in range(nb):
        res = nn.relu(nn.conv2d(params[f"res{bi}_0"], out, padding=1))
        res = nn.conv2d(params[f"res{bi}_1"], res, padding=1)
        out = out + res
    n_up = 2 if scale == 4 else 1
    for ui in range(n_up - 1):
        out = nn.relu(nn.conv2d_transpose(params[f"up{ui}"], out))

    if not packed_tail:
        out = nn.relu(nn.conv2d_transpose(params[f"up{n_up - 1}"], out))
        out = nn.conv2d(params["conv_out"], out, padding=1)
        return out + upsample_residual(lr_curr, scale, degradation)

    # packed tail: ReLU, output conv and residual at half resolution
    outp = nn.relu(nn.conv2d_transpose_packed(params[f"up{n_up - 1}"], out))
    outp = conv_out_residual_packed(params, outp, lr_curr, scale,
                                    degradation)
    if return_packed:
        return outp
    return depth_to_space(outp, 2)
