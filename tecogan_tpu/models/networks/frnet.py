"""FRNet — frame-recurrent generator (FNet + SRNet), scan-based.

TPU-native re-design of the reference generator (`tecogan_nets.py:150-314`,
FRVSR, arXiv:1801.04590):

- Training unroll: optical flow for all (t-1) frame pairs is computed in ONE
  batched FNet call (reference batches the same way, `tecogan_nets.py:183-186`),
  then the HR recurrence runs as a ``lax.scan`` over time with the previous
  HR frame as carry. The first frame (zero previous state) is folded into the
  scan by prepending a zero flow — warping a zero image is a zero image, so
  step 0 degenerates to exactly the reference's zeros-packed first step
  (`tecogan_nets.py:192-198`).
- Streaming inference: frames are processed in fixed-size chunks. Per chunk,
  FNet runs batched over the chunk's (cur, prev) pairs, then an inner scan
  performs the warp + SRNet recurrence. The HR state never leaves the device
  (the reference pays a D2H transfer per frame, `tecogan_nets.py:278`).

Static configuration lives in ``FRNetConfig``; parameters are a pytree
{'fnet': ..., 'srnet': ...}.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ...ops import (backward_warp, backward_warp_diff, depth_to_space,
                    get_upsampling_fn, space_to_depth)
from .fnet import fnet_apply, init_fnet
from .srnet import init_srnet, srnet_apply


@dataclasses.dataclass(frozen=True)
class FRNetConfig:
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 10
    scale: int = 4
    degradation: str = "BD"
    # rematerialise the per-frame SRNet step during the training unroll to
    # keep BPTT memory O(t * activation-of-one-frame)
    remat: bool = True
    # lax.scan unroll factor for the training recurrence (int, True = full
    # unroll, None = auto: full on TPU, scan elsewhere). Unrolling lets XLA
    # fuse the thousands of tiny per-frame weight-grad accumulations (the
    # trace puts ~8 ms/step in sub-5us bias/kernel-grad ops) across frames:
    # measured 69.2 -> 67.2 (unroll 4) -> 65.3 ms/iter (full) on the bf16
    # GAN step at reference geometry, for a one-time ~10 min XLA compile
    # (persistently cached). Off-TPU keeps the scan: CPU test suites
    # recompile far more often than they train.
    train_unroll: int | bool | None = None
    # compute dtype for inference ('float32' | 'bfloat16'). bf16 feeds the
    # MXU at full rate; flow-warp coordinate math stays fp32 regardless
    # (ops/warp.py) and output quantisation happens in fp32.
    compute_dtype: str = "float32"
    # use the Pallas warp kernel in inference paths on TPU
    pallas_warp: bool = True
    # experimental fully-packed recurrence (phase-plane warp). Exact and
    # relayout-free, but the shared-slab enumeration currently loses to the
    # packed2 path (its tiles span a 4x larger HR footprint, inflating the
    # per-tile displacement ranges); kept opt-in for further kernel tuning.
    packed16: bool = False
    # target platform for trace-time kernel dispatch ('tpu' | 'cpu' |
    # None = the ambient jax.default_backend()). Cross-platform serving
    # export sets this: an artifact exported FROM a CPU box FOR TPU must
    # bake the TPU kernels (Pallas warp, folded s2d, full scan unroll),
    # not whatever the exporting host's backend happens to be — and vice
    # versa (Mosaic custom calls cannot compile on a CPU serving host).
    platform: str | None = None

    @property
    def upsample_fn(self):
        return get_upsampling_fn(self.scale, self.degradation)


def init_frnet(key, cfg: FRNetConfig):
    kf, ks = jax.random.split(key)
    return {
        "fnet": init_fnet(kf, cfg.in_nc),
        "srnet": init_srnet(ks, cfg.in_nc, cfg.out_nc, cfg.nf, cfg.nb,
                            cfg.scale),
    }


# --------------------------------------------------------------------------
# shared pieces
# --------------------------------------------------------------------------

def _reflect_pad_flow(flow: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Reflect-pad a (…, h8, w8, 2) flow up to (…, h, w, 2).

    FNet's pool/upsample ladder floors sizes to multiples of 8; the reference
    reflect-pads the flow back to the LR size before upsampling
    (`tecogan_nets.py:239-241`).
    """
    ph = h - flow.shape[-3]
    pw = w - flow.shape[-2]
    if ph == 0 and pw == 0:
        return flow
    pad = [(0, 0)] * (flow.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(flow, pad, mode="reflect")


def _hr_flow(cfg: FRNetConfig, lr_flow: jnp.ndarray, h: int, w: int):
    """LR flow -> HR flow: reflect pad to LR size, upsample, scale velocities."""
    lr_flow = _reflect_pad_flow(lr_flow, h, w)
    return cfg.scale * cfg.upsample_fn(lr_flow)


def _target_platform(cfg: FRNetConfig) -> str:
    """Platform the traced program will RUN on (not necessarily the
    exporting host's backend) — drives all trace-time kernel dispatch."""
    return cfg.platform or jax.default_backend()


def _pallas_ok(cfg: FRNetConfig, c: int, hh: int, ww: int) -> bool:
    """Pallas warp applies on TPU when the (alignment-padded) image fits
    VMEM (the kernel keeps the image in the compute dtype; bf16 halves the
    budget). The kernel needs no halo padding — slab reads clamp."""
    if not cfg.pallas_warp or _target_platform(cfg) != "tpu":
        return False
    itemsize = 2 if cfg.compute_dtype == "bfloat16" else 4
    hp = -(-hh // 8) * 8
    wp = -(-ww // 128) * 128
    return c * hp * wp * itemsize <= 12 * 2 ** 20


def _inference_warp(cfg: FRNetConfig):
    """Warp impl for inference: the Pallas kernel on TPU when the padded
    image fits VMEM (it is ~5x faster than XLA's gather), else the gather.
    Training always uses the gather warp (differentiable)."""
    from ...ops.warp_pallas import backward_warp_pallas

    def warp(x, flow):
        if not _pallas_ok(cfg, x.shape[-1], x.shape[-3], x.shape[-2]):
            return backward_warp(x, flow)
        return backward_warp_pallas(x, flow)

    return warp


def _sr_step(cfg: FRNetConfig, srnet_params, lr_curr, hr_prev, hr_flow,
             warp_fn=backward_warp_diff, fold_s2d=None):
    """One recurrence step: warp previous HR, pack, reconstruct.

    The default warp is the differentiable Pallas custom-VJP path
    (gather-path fallback off-TPU): the training unroll BPTTs through this
    warp every frame, and the XLA gather/scatter adjoints dominated the
    train step before it.

    On TPU (``fold_s2d``, default = backend check) the space_to_depth of
    the warped frame is absorbed into conv_in via weight folding
    (srnet_apply_hr): the s2d transpose and the small-channel-minor NHWC
    layout copies it forces cost ~3 ms/step at the training geometry
    (trace, PARITY.md round 3). Off-TPU keep the concat formulation —
    XLA:CPU handles it fine. Both paths are numerically exact
    re-expressions of the same convolution."""
    hr_warp = warp_fn(hr_prev, hr_flow)
    if fold_s2d is None:
        fold_s2d = _target_platform(cfg) == "tpu"
    if fold_s2d:
        from .srnet import srnet_apply_hr

        n, sh, sw, c = hr_warp.shape
        out = srnet_apply_hr(
            srnet_params, lr_curr, hr_warp.reshape(n, sh, sw * c),
            cfg.nb, cfg.scale, cfg.degradation)
        return out.reshape(n, sh, sw, c)
    return srnet_apply(
        srnet_params, lr_curr, space_to_depth(hr_warp, cfg.scale),
        cfg.nb, cfg.scale, cfg.degradation)


def _phase_flow_coords(cfg: FRNetConfig, lr_flow, h: int, w: int):
    """Per-phase CLAMPED absolute HR sample coordinates, straight from the
    LR flow — the HR flow tensor is never materialised.

    Phase (py, px) of the upsampled flow is rows py::s / cols px::s of the
    separable upsampling operator, i.e. small per-phase matrices.
    Returns sy, sx of shape (m, s*s, h, w).
    """
    from ...ops.resize import resize_matrix

    s = cfg.scale
    mode = ("bilinear_half_pixel" if cfg.degradation == "BI"
            else "tecogan_bicubic")
    lr_flow = _reflect_pad_flow(lr_flow, h, w)
    mh = resize_matrix(mode, h, scale=s)
    mw = resize_matrix(mode, w, scale=s)

    ii = jnp.arange(h, dtype=jnp.float32)[:, None]
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]
    sy, sx = [], []
    f32 = lr_flow.astype(jnp.float32)
    for py in range(s):
        for px in range(s):
            m_y = jnp.asarray(mh[py::s], jnp.float32)
            m_x = jnp.asarray(mw[px::s], jnp.float32)
            f = jnp.einsum("Oh,mhwc->mOwc", m_y, f32)
            f = jnp.einsum("Pw,mOwc->mOPc", m_x, f)
            f = s * f  # velocity scaling (`tecogan_nets.py:189`)
            sy.append(jnp.clip(s * ii + py + f[..., 1], 0.0, s * h - 1.0))
            sx.append(jnp.clip(s * jj + px + f[..., 0], 0.0, s * w - 1.0))
    return jnp.stack(sy, axis=1), jnp.stack(sx, axis=1)


def _packed2_to_planes(p2, s: int):
    """SR-tail packed-2x output (n, sh/2, sw/2, 4c) -> phase planes
    (n, s*s, c, h, w) with plane q = py*s + px."""
    n, h2, w2, c4 = p2.shape
    c = c4 // 4
    if s == 2:
        t = p2.reshape(n, h2, w2, 2, 2, c)
        return t.transpose(0, 3, 4, 5, 1, 2).reshape(n, 4, c, h2, w2)
    assert s == 4
    h, w = h2 // 2, w2 // 2
    # (i, a, j, b, r2, t2, ch): HR pixel (4i + 2a + r2, 4j + 2b + t2)
    t = p2.reshape(n, h, 2, w, 2, 2, 2, c)
    t = t.transpose(0, 2, 5, 4, 6, 7, 1, 3)  # (n, a, r2, b, t2, ch, i, j)
    return t.reshape(n, 16, c, h, w)


def _planes_to_conv_in(planes_out):
    """Warped planes (n, c, s*s, h, w) -> conv_in's NHWC packed layout
    (n, h, w, s*s*c) with channel = q*c + ch."""
    n, c, n_ph, h, w = planes_out.shape
    t = planes_out.transpose(0, 3, 4, 2, 1)  # (n, h, w, q, ch)
    return t.reshape(n, h, w, n_ph * c)


def _sr_step_p16(cfg: FRNetConfig, srnet_params, lr_curr, planes_prev,
                 sy_q, sx_q):
    """Fully-packed recurrence step: warp phase planes -> phase planes, no
    HR-resolution tensor anywhere in the loop."""
    from ...ops.warp_pallas import backward_warp_packed_planes

    warped = backward_warp_packed_planes(planes_prev, sy_q, sx_q, cfg.scale)
    p2 = srnet_apply(
        srnet_params, lr_curr, _planes_to_conv_in(warped), cfg.nb,
        cfg.scale, cfg.degradation, return_packed=True)
    return _packed2_to_planes(p2, cfg.scale), p2


def _p2_to_planes(hr_packed2, c: int):
    """packed2 (n, h2, w2, 4c) -> channel-major HR planes (n, c, 2h2, 2w2).

    Routed through the MXU: six 0/1-selector contractions whose outputs
    are plane-halves after FREE reshapes, then one clean full-lane row
    interleave. XLA's direct transpose of this pattern runs at ~9 GB/s
    (~0.9 ms/frame); the MXU route avoids the pathological relayout."""
    import numpy as np

    n, h2, w2, _ = hr_packed2.shape
    planes = []
    for ch in range(c):
        halves = []
        for r in range(2):
            sel = np.zeros((4 * c, 2), np.float32)
            for t_ in range(2):
                sel[(r * 2 + t_) * c + ch, t_] = 1.0
            half = jax.lax.dot_general(
                hr_packed2, jnp.asarray(sel, hr_packed2.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(hr_packed2.dtype)
            halves.append(half.reshape(n, h2, 2 * w2))  # free reshape
        planes.append(jnp.stack(halves, axis=2).reshape(n, 2 * h2, 2 * w2))
    return jnp.stack(planes, axis=1)


def _p2_to_flat_rgb(p2, c: int):
    """packed2 (n, h2, w2, 4c) -> channel-interleaved flat HR
    (n, 2*h2, 2*w2*c), lane = x*c + ch (the NHWC memory order).

    Same MXU selector trick as ``_p2_to_planes``, but emitting the flat
    rgb lane order directly: per row-phase ONE (4c -> 2c) selector
    contraction whose output lanes interleave (t-phase, channel) — a free
    reshape then yields lane (2J+t)*c+ch — followed by one full-lane row
    interleave."""
    import numpy as np

    n, h2, w2, c4 = p2.shape
    halves = []
    for r in range(2):
        sel = np.zeros((c4, 2 * c), np.float32)
        for t_ in range(2):
            for ch in range(c):
                sel[(r * 2 + t_) * c + ch, t_ * c + ch] = 1.0
        half = jax.lax.dot_general(
            p2, jnp.asarray(sel, p2.dtype), (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(p2.dtype)
        halves.append(half.reshape(n, h2, 2 * w2 * c))
    return jnp.stack(halves, axis=2).reshape(n, 2 * h2, 2 * w2 * c)


def _sr_step_flat(cfg: FRNetConfig, srnet_params, lr_curr, hr_prev_p2,
                  hr_flow):
    """Streaming step on the channel-interleaved FLAT HR frame: p2 carry ->
    flat (MXU selectors) -> rgb-lane Pallas warp -> single W-folded conv_in
    (srnet_apply_hr) -> p2. The flat form is a free reshape of NHWC, so
    the warp, the W-folded view and conv_in share one layout; conv_in runs
    as ONE (3s,3,s*c,nf) conv instead of per-colour pieces.

    MEASURED SLOWER than ``_sr_step_planes`` (4.9 vs 3.2 ms/frame at the
    bench shape): the 12-channel-minor folded conv and the 3-lane
    interleaved warp lose more to layout padding than the single-conv
    formulation saves. Kept (exact, tested) as a documented dead end."""
    from ...ops.warp_pallas import backward_warp_rgb_flat
    from .srnet import srnet_apply_hr

    c = cfg.out_nc
    flat = _p2_to_flat_rgb(hr_prev_p2, c)
    warped = backward_warp_rgb_flat(flat, hr_flow, c)
    return srnet_apply_hr(srnet_params, lr_curr, warped, cfg.nb, cfg.scale,
                          cfg.degradation, return_packed=True)


def _p4_to_planes(hr_packed4, c: int):
    """packed4 (n, h4, w4, 16c) -> channel-major HR planes
    (n, c, 4h4, 4w4). Same MXU 0/1-selector route as ``_p2_to_planes``
    (column phases unfold as free row-major reshapes; row phases
    interleave in one full-lane step)."""
    import numpy as np

    n, h4, w4, _ = hr_packed4.shape
    planes = []
    for ch in range(c):
        quarters = []
        for r in range(4):
            sel = np.zeros((16 * c, 4), np.float32)
            for t_ in range(4):
                sel[(r * 4 + t_) * c + ch, t_] = 1.0
            q = jax.lax.dot_general(
                hr_packed4, jnp.asarray(sel, hr_packed4.dtype),
                (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(hr_packed4.dtype)
            quarters.append(q.reshape(n, h4, 4 * w4))  # free reshape
        planes.append(jnp.stack(quarters, axis=2).reshape(n, 4 * h4,
                                                          4 * w4))
    return jnp.stack(planes, axis=1)


def _sr_step_planes(cfg: FRNetConfig, srnet_params, lr_curr, hr_prev_pk,
                    hr_flow, packed4: bool = False,
                    interpret: bool = False):
    """Streaming fast-path step: packed carry -> planes -> Pallas warp ->
    conv_in-on-planes -> packed. One XLA transpose per frame, nothing
    else. ``packed4`` (scale 4): the carry is packed-4 and conv_out runs
    in the p2->p4 formulation (1.8x less billed MXU work at 12 true
    output channels — PARITY.md round 3)."""
    from ...ops.warp_pallas import _warp_planes
    from .srnet import srnet_apply_planes

    if packed4:
        planes = _p4_to_planes(hr_prev_pk, cfg.out_nc)
    else:
        planes = _p2_to_planes(hr_prev_pk, cfg.out_nc)
    # pass interpret only when set: tests monkeypatch _warp_planes with an
    # interpret=True partial, which an explicit False would override
    kw = {"interpret": True} if interpret else {}
    warped = _warp_planes(planes, hr_flow, **kw).astype(planes.dtype)
    return srnet_apply_planes(srnet_params, lr_curr, warped, cfg.nb,
                              cfg.scale, cfg.degradation, packed4=packed4)


def _sr_step_planes_paired(cfg: FRNetConfig, srnet_params, paired_params,
                           lr_curr, hr_prev_p2, hr_flow,
                           interpret: bool = False):
    """Stream-paired streaming step (serving, n even): the warp stays
    per-stream; consecutive stream pairs share one block-diagonal trunk
    (srnet.pair_srnet_params) that fills the MXU lanes a single 64-channel
    stream leaves idle."""
    from ...ops.warp_pallas import _warp_planes
    from .srnet import srnet_apply_planes_paired

    planes = _p2_to_planes(hr_prev_p2, cfg.out_nc)
    warped = _warp_planes(planes, hr_flow,
                          interpret=interpret).astype(planes.dtype)
    return srnet_apply_planes_paired(paired_params, srnet_params, lr_curr,
                                     warped, cfg.nb, cfg.scale,
                                     cfg.degradation)


def _sr_step_p2(cfg: FRNetConfig, srnet_params, lr_curr, hr_prev_p2,
                hr_flow, use_pallas: bool):
    """Packed-carry recurrence step (streaming inference): the previous HR
    frame stays in the SR tail's packed-2x layout; the Pallas warp reads it
    and emits conv_in's space_to_depth layout directly — the HR NHWC image
    never materialises inside the loop.

    NOTE: in production only the ``use_pallas=False`` gather variant is
    reachable (the dispatch in `infer_sequence_batch` routes the Pallas
    case to `_sr_step_planes`, which measured faster). The
    ``use_pallas=True`` branch (`backward_warp_pallas_packed`) is a
    retained, parity-tested reference formulation — exercised by
    tests/test_fast_path.py, not by the serving path."""
    if use_pallas:
        from ...ops.warp_pallas import backward_warp_pallas_packed

        packed_in = backward_warp_pallas_packed(hr_prev_p2, hr_flow,
                                                cfg.scale)
    else:
        from ...ops import depth_to_space

        hr_prev = depth_to_space(hr_prev_p2, 2)
        packed_in = space_to_depth(backward_warp(hr_prev, hr_flow),
                                   cfg.scale)
    return srnet_apply(
        srnet_params, lr_curr, packed_in, cfg.nb, cfg.scale,
        cfg.degradation, return_packed=True)


# --------------------------------------------------------------------------
# row-folded multi-stream serving
# --------------------------------------------------------------------------

def _fold_geometry(scale: int, h: int):
    """Per-stream row pitch for the folded serving mode: ``g`` guard rows
    (>= 2 so adjacent streams don't share a guard row under 3x3 convs and
    the packed row pairing stays aligned) bumped until the HR band is
    32-row aligned (the banded warp's block requirement)."""
    g = 2
    while (scale * (h + g)) % 32:
        g += 1
    ph = h + g
    return g, ph, scale * ph


def _fold_masks(scale: int, n: int, h: int, ph: int, band: int):
    """0/1 guard-row masks for the folded stream layout (fp32; cast at
    use). Keys: lr (LR rows), up (packed-2x rows), planes (HR rows)."""
    def m(pitch, valid, shape):
        r = jnp.arange(n * pitch)
        return (jnp.mod(r, pitch) < valid).astype(jnp.float32).reshape(shape)

    return {
        "lr": m(ph, h, (1, n * ph, 1, 1)),
        "up": m(band // 2, scale * h // 2, (1, n * band // 2, 1, 1)),
        "planes": m(band, scale * h, (1, 1, n * band, 1)),
    }


def _fold_residual_mh(cfg: FRNetConfig, n: int, h: int, ph: int):
    """Block-diagonal vertical residual operator for the folded layout:
    each stream's (s*h, h) resize matrix sits on the diagonal, padded with
    zero guard rows/columns so streams do not mix."""
    import numpy as np

    from ...ops.resize import resize_matrix

    s = cfg.scale
    mode = ("bilinear_half_pixel" if cfg.degradation == "BI"
            else "tecogan_bicubic")
    mh = np.asarray(resize_matrix(mode, h, scale=s), np.float32)
    big = np.zeros((n * s * ph, n * ph), np.float32)
    for b in range(n):
        big[b * s * ph:b * s * ph + s * h, b * ph:b * ph + h] = mh
    return big


def _sr_step_planes_folded(cfg: FRNetConfig, srnet_params, lr_f, p2_f,
                           flow_f, masks, mh_fold, band: int, valid: int,
                           interpret: bool = False):
    """One folded streaming step: all stream tensors are batch-1 with the
    stream axis folded into rows (guard bands between streams), so XLA
    never sees a batch dimension to relayout — the n>1 batch-in-the-middle
    copies that ate the round-2 serving gain do not exist in this program.
    Exactness: every conv's guard inputs are zero exactly where standalone
    zero padding would be (masks after each conv), the warp clamps within
    each stream's band, and the residual matrix is block-diagonal."""
    from ...ops.warp_pallas import _warp_planes
    from .srnet import srnet_apply_planes

    planes = _p2_to_planes(p2_f, cfg.out_nc)
    warped = _warp_planes(planes, flow_f, interpret=interpret, band=band,
                          band_valid=valid).astype(planes.dtype)
    warped = warped * masks["planes"].astype(warped.dtype)
    return srnet_apply_planes(srnet_params, lr_f, warped, cfg.nb,
                              cfg.scale, cfg.degradation, row_masks=masks,
                              residual_mh=mh_fold)


# --------------------------------------------------------------------------
# training unroll
# --------------------------------------------------------------------------

def forward_sequence(params, lr_data: jnp.ndarray, cfg: FRNetConfig):
    """Run the full training unroll.

    Args:
        params: {'fnet', 'srnet'} pytree.
        lr_data: (n, t, h, w, c) LR clip.

    Returns dict (mirroring the reference contract, `tecogan_nets.py:216-223`):
        hr_data: (n, t, s*h, s*w, c)
        hr_flow: (n, t-1, s*h, s*w, 2)
        lr_prev/lr_curr: (n*(t-1), h, w, c)
        lr_flow: (n*(t-1), h, w, 2)
    """
    n, t, h, w, c = lr_data.shape
    s = cfg.scale

    lr_prev = lr_data[:, :-1].reshape(n * (t - 1), h, w, c)
    lr_curr = lr_data[:, 1:].reshape(n * (t - 1), h, w, c)
    lr_flow = fnet_apply(params["fnet"], lr_curr, lr_prev)

    hr_flow = _hr_flow(cfg, lr_flow, h, w)
    hr_flow = hr_flow.reshape(n, t - 1, s * h, s * w, 2)

    # prepend a zero flow so the scan's step 0 reproduces the zero-state
    # first frame exactly (warp of a zero image is zero)
    flow0 = jnp.zeros((n, 1, s * h, s * w, 2), hr_flow.dtype)
    flows = jnp.concatenate([flow0, hr_flow], axis=1)

    step = functools.partial(_sr_step, cfg, params["srnet"])
    if cfg.remat:
        step = jax.checkpoint(step)

    def body(hr_prev, inp):
        lr_i, flow_i = inp
        hr_i = step(lr_i, hr_prev, flow_i)
        return hr_i, hr_i

    hr0 = jnp.zeros((n, s * h, s * w, cfg.out_nc), lr_data.dtype)
    # scan over time: (t, n, ...) leading axis
    xs = (jnp.moveaxis(lr_data, 1, 0), jnp.moveaxis(flows, 1, 0))
    unroll = cfg.train_unroll
    if unroll is None:
        unroll = True if _target_platform(cfg) == "tpu" else 1
    _, hr_seq = jax.lax.scan(body, hr0, xs, unroll=unroll)
    hr_data = jnp.moveaxis(hr_seq, 0, 1)  # (n, t, H, W, c)

    return {
        "hr_data": hr_data,
        "hr_flow": hr_flow,
        "lr_prev": lr_prev,
        "lr_curr": lr_curr,
        "lr_flow": lr_flow,
    }


# --------------------------------------------------------------------------
# single-frame step (profiling / torch-parity with reference `step`)
# --------------------------------------------------------------------------

def step(params, lr_curr, lr_prev, hr_prev, cfg: FRNetConfig):
    """One streaming step: (n,h,w,c) x2 + (n,sh,sw,c) -> (n,sh,sw,c).

    Mirrors the reference single-frame path (`tecogan_nets.py:227-252`)
    including the flow padding for sizes not divisible by 8.
    """
    h, w = lr_curr.shape[-3], lr_curr.shape[-2]
    lr_flow = fnet_apply(params["fnet"], lr_curr, lr_prev)
    hr_flow = _hr_flow(cfg, lr_flow, h, w)
    return _sr_step(cfg, params["srnet"], lr_curr, hr_prev, hr_flow,
                    warp_fn=_inference_warp(cfg))


# --------------------------------------------------------------------------
# streaming inference
# --------------------------------------------------------------------------

def infer_sequence_batch(params, lr_seqs: jnp.ndarray, cfg: FRNetConfig,
                         chunk: int = 16, fold_streams: bool | None = None,
                         pair_streams: bool | None = None,
                         packed4: bool | None = None,
                         tail_order: str = "u8_d2s",
                         _fold_interpret: bool = False) -> jnp.ndarray:
    """SR a BATCH of LR sequences: (n, t, h, w, c) -> uint8 (n, t, sh, sw, c).

    Chunked double-scan: FNet is batched over all sequences' chunk frame
    pairs (big MXU-friendly batches), the SRNet recurrence scans within the
    chunk carrying the whole batch, and an outer scan carries
    (lr_prev, hr_prev) across chunks. Output frames are quantised to uint8
    on device; the caller does one D2H for everything.

    At the reference serving shape (134x320 4x, bf16) a SINGLE stream
    already deploys the chip's per-frame capability: re-measured batched
    serving at 4 concurrent streams reaches only 0.88x of one stream's
    throughput in aggregate (292.7 vs 332.5 FPS — the packed output tail
    scales linearly with streams and batching adds relayout traffic;
    BENCHMARKS.md). The documented recipe is therefore to serve
    concurrent clips SEQUENTIALLY, not batched; n > 1 here is for
    latency-insensitive bulk offline SR only. Two exact alternative
    layouts were built and measured at or below this mode and are kept
    opt-in: ``fold_streams`` (streams stacked along rows with guard
    bands — batch-1 programs, banded Pallas warp) and ``pair_streams``
    (block-diagonal 2*nf trunk over consecutive stream pairs).
    """
    n, t, h, w, c = lr_seqs.shape
    s = cfg.scale

    if tail_order not in ("u8_d2s", "step_u8", "d2s_quant"):
        # the knob exists to A/B exact tail formulations on hardware — a
        # typo silently measuring the default would be misattributed
        raise ValueError(f"unknown tail_order {tail_order!r}; expected "
                         f"'u8_d2s', 'step_u8' or 'd2s_quant'")

    dt = jnp.dtype(cfg.compute_dtype)
    if dt != lr_seqs.dtype:
        from ... import nn

        params = nn.cast_params(params, dt)
        lr_seqs = lr_seqs.astype(dt)

    # balance chunks to the sequence length: ceil(t / n_chunks) keeps the
    # chunk COUNT the user's `chunk` implies but shrinks the last-chunk
    # edge padding (a 41-frame Vid4 clip at chunk=16 pays 7 padded frames
    # naively, 1 after balancing). Each distinct (t, h, w) already
    # compiles its own program, so this costs no extra compilations.
    n_chunks = -(-t // chunk)
    chunk = -(-t // n_chunks)
    pad = n_chunks * chunk - t
    if pad:
        lr_seqs = jnp.concatenate(
            [lr_seqs, jnp.broadcast_to(lr_seqs[:, -1:],
                                       (n, pad, h, w, c))], axis=1)

    # (n_chunks, chunk, n, h, w, c)
    lr_chunks = jnp.moveaxis(
        lr_seqs.reshape(n, n_chunks, chunk, h, w, c), 0, 2)
    # fully-packed path: bf16 phase planes of one colour fit VMEM easily;
    # requires the kernel (TPU) and the FRNet flow bound (|flow| < 46*s)
    use_p16 = (cfg.packed16
               and _pallas_ok(cfg, cfg.out_nc, s * h, s * w)
               and (h + 112) * (w + 184 + 128) * 16 *
               lr_seqs.dtype.itemsize <= 13 * 2 ** 20)
    use_pallas = _pallas_ok(cfg, cfg.out_nc, s * h, s * w)

    if fold_streams is None:
        # MEASURED SLOWER at the serving shape (238 vs 287 aggregate FPS,
        # 4x134x320 bf16): the suspected n>1 relayouts turned out to be
        # the packed tail's real per-stream work (it scales linearly with
        # streams in BOTH layouts), and the folded mode's per-conv guard
        # masks add ~1 ms/frame of elementwise+copy traffic. Kept opt-in
        # as an exact, tested alternative layout (see PARITY.md round-3
        # serving analysis).
        fold_streams = False
    if fold_streams and not (_fold_interpret
                             or _target_platform(cfg) == "tpu"):
        fold_streams = False  # banded warp needs the kernel (or interpret)
    if tail_order != "u8_d2s" and (use_p16 or fold_streams):
        # these opt-in layouts have their own output epilogues and would
        # silently measure the default — the misattribution the knob's
        # validation exists to prevent
        raise ValueError(
            f"tail_order={tail_order!r} is only implemented for the "
            f"default (planes/p2) path; disable packed16/fold_streams")
    if fold_streams:
        _g_rows, ph, band = _fold_geometry(s, h)
        masks = _fold_masks(s, n, h, ph, band)
        mh_fold = _fold_residual_mh(cfg, n, h, ph)
        w2 = s * w // 2

        def outer_fold(carry, lr_chunk):
            lr_prev0, p2_prev_f = carry
            prevs = jnp.concatenate([lr_prev0[None], lr_chunk[:-1]], axis=0)
            flat = lambda x: x.reshape(chunk * n, h, w, c)
            lr_flow = fnet_apply(params["fnet"], flat(lr_chunk), flat(prevs))
            hr_flow = _hr_flow(cfg, lr_flow, h, w)
            hr_flow = hr_flow.reshape(chunk, n, s * h, s * w, 2)
            hr_flow = jnp.pad(
                hr_flow, ((0, 0), (0, 0), (0, band - s * h), (0, 0), (0, 0))
            ).reshape(chunk, 1, n * band, s * w, 2)
            lr_f = jnp.pad(
                lr_chunk, ((0, 0), (0, 0), (0, ph - h), (0, 0), (0, 0))
            ).reshape(chunk, 1, n * ph, w, c)

            def inner(p2_prev, inp):
                lr_i, flow_i = inp
                p2 = _sr_step_planes_folded(
                    cfg, params["srnet"], lr_i, p2_prev, flow_i, masks,
                    mh_fold, band, s * h, interpret=_fold_interpret)
                return p2, p2

            p2_last, p2_seq = jax.lax.scan(inner, p2_prev_f,
                                           (lr_f, hr_flow))
            out_p2 = jnp.clip(
                jnp.round(p2_seq.astype(jnp.float32) * 255.0), 0, 255
            ).astype(jnp.uint8)
            out_p2 = out_p2.reshape(
                chunk, n, band // 2, w2, 4 * cfg.out_nc)[:, :, :s * h // 2]
            out = depth_to_space(out_p2, 2)  # (chunk, n, sh, sw, c)
            return (lr_chunk[-1], p2_last), out

        carry0 = (
            jnp.zeros((n, h, w, c), lr_seqs.dtype),
            jnp.zeros((1, n * band // 2, w2, 4 * cfg.out_nc),
                      lr_seqs.dtype),
        )
        _, out = jax.lax.scan(outer_fold, carry0, lr_chunks)
        out = jnp.moveaxis(
            out.reshape(n_chunks * chunk, n, s * h, s * w, cfg.out_nc), 1, 0)
        return out[:, :t]

    def outer_p16(carry, lr_chunk):
        lr_prev0, planes_prev0 = carry
        prevs = jnp.concatenate([lr_prev0[None], lr_chunk[:-1]], axis=0)
        flat = lambda x: x.reshape(chunk * n, h, w, c)
        lr_flow = fnet_apply(params["fnet"], flat(lr_chunk), flat(prevs))
        sy, sx = _phase_flow_coords(cfg, lr_flow, h, w)
        sy = sy.reshape(chunk, n, s * s, h, w)
        sx = sx.reshape(chunk, n, s * s, h, w)

        def inner(planes_prev, inp):
            lr_i, sy_i, sx_i = inp
            planes_i, p2_i = _sr_step_p16(cfg, params["srnet"], lr_i,
                                          planes_prev, sy_i, sx_i)
            return planes_i, p2_i

        planes_last, hr_chunk_p2 = jax.lax.scan(
            inner, planes_prev0, (lr_chunk, sy, sx))
        out_p2 = jnp.clip(
            jnp.round(hr_chunk_p2.astype(jnp.float32) * 255.0), 0, 255
        ).astype(jnp.uint8)
        out = depth_to_space(out_p2, 2)
        return (lr_chunk[-1], planes_last), out

    if pair_streams is None:
        # MEASURED NEAR-NEUTRAL on v5e (n=4: 296 vs 288 aggregate FPS;
        # n=2: 254 vs 264): the 64-channel trunk convs do not pay the
        # naive half-idle-lane penalty the cost model predicts, so the
        # block-diagonal pairing recoups almost nothing. Kept opt-in as
        # an exact, tested layout experiment (PARITY.md round 3).
        pair_streams = False
    # the paired trunk's planes warp is the Pallas kernel with whole-image
    # BlockSpecs — gate exactly like packed4 (TPU + VMEM budget, or
    # interpret) instead of crashing at lowering off-TPU / past-VMEM
    if pair_streams and (n % 2 or not (use_pallas or _fold_interpret)):
        pair_streams = False
    paired_params = None
    if pair_streams:
        from .srnet import pair_srnet_params

        paired_params = pair_srnet_params(params["srnet"], cfg.in_nc, s,
                                          cfg.nb)

    # packed-4 carry + p2->p4 conv_out: cuts the conv_out matmul's billed
    # M*K 1.8x (the single largest op of the streaming trace), but
    # MEASURED SLOWER end-to-end (273.6 vs 300.8 FPS, same process, 64fr
    # 134x320 bf16): the 16-slice phase unshift, the 12-selector
    # p4->planes assembly and the p4 residual relayout more bytes than
    # the conv saves. Kept opt-in as an exact, tested formulation
    # (PARITY.md round 3).
    if packed4 is None:
        packed4 = False
    packed4 = (packed4 and s == 4 and not pair_streams and not fold_streams
               and (use_pallas or _fold_interpret))

    def outer(carry, lr_chunk):
        lr_prev0, hr_prev0_pk = carry
        prevs = jnp.concatenate([lr_prev0[None], lr_chunk[:-1]], axis=0)
        flat = lambda x: x.reshape(chunk * n, h, w, c)
        lr_flow = fnet_apply(params["fnet"], flat(lr_chunk), flat(prevs))
        hr_flow = _hr_flow(cfg, lr_flow, h, w)
        hr_flow = hr_flow.reshape(chunk, n, s * h, s * w, 2)

        def inner(hr_prev_pk, inp):
            lr_i, flow_i = inp
            if pair_streams:
                hr_i_pk = _sr_step_planes_paired(
                    cfg, params["srnet"], paired_params, lr_i, hr_prev_pk,
                    flow_i, interpret=_fold_interpret)
            elif packed4 or use_pallas:
                hr_i_pk = _sr_step_planes(cfg, params["srnet"], lr_i,
                                          hr_prev_pk, flow_i,
                                          packed4=packed4,
                                          interpret=_fold_interpret)
            else:
                hr_i_pk = _sr_step_p2(cfg, params["srnet"], lr_i,
                                      hr_prev_pk, flow_i, False)
            if tail_order == "step_u8":
                # quantise in the step epilogue: the scan's stacked output
                # buffer is written once as uint8 (1 B/elem) instead of
                # bf16 + a separate quantise pass
                out_i = jnp.clip(
                    jnp.round(hr_i_pk.astype(jnp.float32) * 255.0), 0, 255
                ).astype(jnp.uint8)
            else:
                out_i = hr_i_pk
            return hr_i_pk, out_i

        hr_pk_last, hr_chunk_pk = jax.lax.scan(inner, hr_prev0_pk,
                                               (lr_chunk, hr_flow))
        blk = 4 if packed4 else 2
        if tail_order == "step_u8":
            out = depth_to_space(hr_chunk_pk, blk)
        elif tail_order == "d2s_quant":
            # interleave in the compute dtype, quantise after: XLA fuses
            # the transpose into the quantise consumer — one pass reading
            # packed bf16, writing interleaved uint8
            out = jnp.clip(
                jnp.round(depth_to_space(hr_chunk_pk, blk)
                          .astype(jnp.float32) * 255.0), 0, 255
            ).astype(jnp.uint8)
        else:  # "u8_d2s" — quantise in the packed layout; interleave uint8
            out_pk = jnp.clip(
                jnp.round(hr_chunk_pk.astype(jnp.float32) * 255.0), 0, 255
            ).astype(jnp.uint8)
            out = depth_to_space(out_pk, blk)
        return (lr_chunk[-1], hr_pk_last), out

    if use_p16:
        carry0 = (
            jnp.zeros((n, h, w, c), lr_seqs.dtype),
            jnp.zeros((n, s * s, cfg.out_nc, h, w), lr_seqs.dtype),
        )
        _, out = jax.lax.scan(outer_p16, carry0, lr_chunks)
    else:
        if packed4:
            carry_shape = (n, h, w, 16 * cfg.out_nc)
        else:
            carry_shape = (n, s * h // 2, s * w // 2, 4 * cfg.out_nc)
        carry0 = (
            jnp.zeros((n, h, w, c), lr_seqs.dtype),
            jnp.zeros(carry_shape, lr_seqs.dtype),
        )
        _, out = jax.lax.scan(outer, carry0, lr_chunks)
    # (n_chunks, chunk, n, H, W, c) -> (n, t, H, W, c)
    out = jnp.moveaxis(out.reshape(n_chunks * chunk, n, s * h, s * w,
                                   cfg.out_nc), 1, 0)
    return out[:, :t]


def infer_sequence(params, lr_seq: jnp.ndarray, cfg: FRNetConfig,
                   chunk: int = 16) -> jnp.ndarray:
    """SR one LR sequence: (t, h, w, c) -> uint8 (t, sh, sw, c)."""
    return infer_sequence_batch(params, lr_seq[None], cfg, chunk)[0]
