"""Minimal functional NN layer library (NHWC, params as pytrees).

Design: networks are pure functions ``apply(params, x)`` over nested-dict
parameter pytrees. This keeps the frame recurrence trivially compatible with
``lax.scan``, makes torch-checkpoint conversion a mechanical mapping, and
lets train steps donate/shard params without framework indirection.

Conventions:
- activations NHWC, conv kernels HWIO, conv-transpose kernels stored in the
  torch-equivalent layout but converted at load time to an HWIO kernel of the
  equivalent fractionally-strided convolution (see ``conv2d_transpose``).
- parameter dtype float32; compute dtype is the caller's choice (pass bf16
  activations and cast params at apply time via ``cast_params``).

Each layer documents the torch layer it is numerically equivalent to, since
the reference networks (`codes/models/networks/tecogan_nets.py`) are built
from those.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "conv2d",
    "conv2d_transpose",
    "dense",
    "batch_norm",
    "max_pool_2x2",
    "leaky_relu",
    "relu",
    "init_conv",
    "init_conv_transpose",
    "init_dense",
    "init_kaiming_normal",
    "init_batch_norm",
    "cast_params",
    "pack_conv3x3_kernel",
    "pack_conv3x3_as2x2_kernel",
    "pack_conv3x3_p2p4_kernel",
    "packed4_phase_unshift",
    "packed2_phase_unshift",
    "conv2d_transpose_packed",
]


# --------------------------------------------------------------------------
# initializers (parity with reference `net_utils.py:9-33` kaiming/xavier)
# --------------------------------------------------------------------------

def _torch_default(key, shape, fan_in):
    """torch's default layer init: kaiming_uniform_(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    The reference defines an explicit kaiming/xavier initializer
    (`net_utils.py:9-33`) but never calls it — its networks train from
    torch defaults, so training-from-scratch parity requires these.
    """
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_conv(key, kh, kw, cin, cout, scale: float = 1.0):
    """Conv params {'w': HWIO, 'b': (cout,)}; torch-default init."""
    kw_, kb = jax.random.split(key)
    fan_in = kh * kw * cin
    return {
        "w": _torch_default(kw_, (kh, kw, cin, cout), fan_in) * scale,
        "b": _torch_default(kb, (cout,), fan_in),
    }


def init_conv_transpose(key, kh, kw, cin, cout, scale: float = 1.0):
    """ConvT params, stored as the equivalent-conv HWIO kernel.

    torch quirk: _calculate_fan_in on the (cin, cout, kh, kw) layout uses
    dim-1, i.e. fan_in = cout*kh*kw; reproduced here.
    """
    kw_, kb = jax.random.split(key)
    fan_in = kh * kw * cout
    return {
        "w": _torch_default(kw_, (kh, kw, cin, cout), fan_in) * scale,
        "b": _torch_default(kb, (cout,), fan_in),
    }


def init_dense(key, din, dout, scale: float = 1.0):
    kw_, kb = jax.random.split(key)
    return {
        "w": _torch_default(kw_, (din, dout), din) * scale,
        "b": _torch_default(kb, (dout,), din),
    }


def init_kaiming_normal(key, kh, kw, cin, cout, scale: float = 0.1):
    """The reference's OPTIONAL initializer (`net_utils.py:9-33`):
    kaiming_normal_(mode='fan_in') scaled, zero bias."""
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {"w": w * (math.sqrt(2.0 / fan_in) * scale),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_batch_norm(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),  # running mean (EMA)
        "var": jnp.ones((c,), jnp.float32),  # running var (EMA)
    }


def cast_params(params, dtype):
    """Cast floating leaves of a param pytree to ``dtype``."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, params)


# --------------------------------------------------------------------------
# layers
# --------------------------------------------------------------------------

def conv2d(p, x, stride: int = 1, padding: int | str = "SAME"):
    """NHWC conv, numerically equal to torch Conv2d(k, stride, padding).

    ``padding`` as an int means symmetric zero padding of that many pixels
    (torch-style); "SAME"/"VALID" are also accepted.
    """
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def conv2d_transpose_packed(p, x):
    """Sub-pixel form of the (3,2,1,op=1) transposed conv WITHOUT the phase
    interleave: returns (n, h, w, 4*cout) with channel = (py*2+px)*cout + co.

    Keeping the result packed lets the consumer (packed conv_out, packed
    residual add) run at the input resolution with full-lane channel counts;
    depth_to_space happens once at the very end of the SR tail.
    """
    w = p["w"]  # flipped HWIO (3, 3, cin, cout)
    assert w.shape[0] == 3 and w.shape[1] == 3
    cin, cout = w.shape[2], w.shape[3]
    zero = jnp.zeros((cin, cout), w.dtype)

    def tap(py, ty, px, tx):
        jy = {(0, 0): 1, (1, 0): 0, (1, 1): 2}.get((py, ty))
        jx = {(0, 0): 1, (1, 0): 0, (1, 1): 2}.get((px, tx))
        if jy is None or jx is None:
            return zero
        return w[jy, jx]

    phases = []
    for py in range(2):
        for px in range(2):
            k = jnp.stack([
                jnp.stack([tap(py, ty, px, tx) for tx in range(2)], 0)
                for ty in range(2)], 0)
            phases.append(k)
    w_sub = jnp.concatenate(phases, axis=-1)  # (2, 2, cin, 4*cout)

    y = jax.lax.conv_general_dilated(
        x,
        w_sub.astype(x.dtype),
        window_strides=(1, 1),
        padding=((0, 1), (0, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "b" in p:
        b = jnp.tile(p["b"], 4)
        y = y + b.astype(x.dtype)
    return y


def _pack_conv3x3_blocks(w_hwio, taps: int, phases: int, disp):
    """Shared block assembly for the three packed-conv reformulations
    below: a (taps, taps, 4*cin, phases^2*cout) kernel whose block at
    [tY, tX, (ry*2+rx)*cin, (py*phases+px)*cout] is w[dy+1, dx+1] with
    (dy, dx) = (disp(tY, ry, py), disp(tX, rx, px)) when both lie in
    [-1, 1], zero otherwise. The variants differ ONLY in (taps, phases,
    displacement formula); one scaffold keeps their dtype/layout handling
    in lockstep. Traceable (gradients flow to w_hwio)."""
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3
    zero = jnp.zeros((cin, cout), w_hwio.dtype)

    def pick(dy, dx):
        if -1 <= dy <= 1 and -1 <= dx <= 1:
            return w_hwio[dy + 1, dx + 1]
        return zero

    rows = []
    for ty in range(taps):
        cols = []
        for tx in range(taps):
            in_blocks = []
            for ry in range(2):
                for rx in range(2):
                    out_blocks = [
                        pick(disp(ty, ry, py), disp(tx, rx, px))
                        for py in range(phases) for px in range(phases)]
                    in_blocks.append(jnp.concatenate(out_blocks, axis=-1))
            cols.append(jnp.concatenate(in_blocks, axis=0))
        rows.append(jnp.stack(cols, 0))
    return jnp.stack(rows, 0)


def pack_conv3x3_kernel(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """Re-express a 3x3 conv over a 2x grid as a conv over the PACKED
    (h, w, 4*cin) representation: returns a (3, 3, 4*cin, 4*cout) kernel.

    Packed channel convention (both in and out): (py*2+px)*c + ch.
    For output phase (py, px) and grid tap (tY, tX), the HR tap is
    dy = 2*tY + ry - py (valid when in [-1, 1]); zero otherwise. Exact
    numerics; built with traceable ops so gradients flow to w_hwio.
    """
    return _pack_conv3x3_blocks(
        w_hwio, taps=3, phases=2, disp=lambda t, r, p: 2 * (t - 1) + r - p)


def pack_conv3x3_as2x2_kernel(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """3x3 conv over a 2x grid as a 2x2-TAP conv over the packed layout,
    with phase-shifted output reads: returns (2, 2, 4*cin, 4*cout).

    ``pack_conv3x3_kernel``'s (3, 3, 4*cin, ...) kernel carries 4x
    structural zeros (each output phase touches only a 2x2-cell window of
    the 3x3), and a dense MXU contraction cannot skip them; at 12 true
    output channels the lane floor makes the contraction cost proportional
    to M * K alone, so shrinking K from 9*4*cin to 4*4*cin is a ~2.2x FLOP
    cut on the SR tail's conv_out. The trick: give every output phase its
    OWN output position so all phases share one 2x2-cell input window —
    phase (py, px)'s value for cell (I, J) is emitted at (I+py-1, J+px-1):

        z = conv(x_p2, W2, padding=((1, 1), (1, 1)))     # (h2+1, w2+1, 4co)
        out[..., I, J, (py*2+px)*co + c] = z[..., I+py, J+px, (py*2+px)*co+c]

    (see ``packed2_phase_unshift``). Tap algebra: output HR row for phase py
    at window position A is p = 2A + 2 - py; window cell (A+tY) phase ry is
    HR row 2(A+tY)+ry, so dy = 2*tY + ry + py - 2, kept when |dy| <= 1.
    Zero cells padded around the packed image supply exactly the HR zero
    padding (their in-range rows ARE the HR pad rows; out-of-range rows get
    zero weight). Exact numerics; traceable (gradients flow to w_hwio).
    """
    return _pack_conv3x3_blocks(
        w_hwio, taps=2, phases=2, disp=lambda t, r, p: 2 * t + r + p - 2)


def packed2_phase_unshift(z: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Reassemble ``pack_conv3x3_as2x2_kernel`` conv output: read phase
    group (py, px) at spatial offset (py, px). (…, h2+1, w2+1, 4*cout) ->
    (…, h2, w2, 4*cout)."""
    h2, w2 = z.shape[-3] - 1, z.shape[-2] - 1
    parts = []
    for py in range(2):
        for px in range(2):
            g = (py * 2 + px) * cout
            parts.append(z[..., py:py + h2, px:px + w2, g:g + cout])
    return jnp.concatenate(parts, axis=-1)


def packed4_phase_unshift(z: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Reassemble ``pack_conv3x3_p2p4_kernel`` conv output: phase (py, px)
    of true packed-4 cell (i, j) was emitted at position
    (i + (py == 3), j + (px == 3)) in group ((py+1)%4, (px+1)%4).
    (…, h4+1, w4+1, 16*cout) -> (…, h4, w4, 16*cout)."""
    h4, w4 = z.shape[-3] - 1, z.shape[-2] - 1
    parts = []
    for py in range(4):
        oy = 1 if py == 3 else 0
        gy = (py + 1) % 4
        for px in range(4):
            ox = 1 if px == 3 else 0
            gx = (px + 1) % 4
            g = (gy * 4 + gx) * cout
            parts.append(z[..., oy:oy + h4, ox:ox + w4, g:g + cout])
    return jnp.concatenate(parts, axis=-1)


def pack_conv3x3_p2p4_kernel(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """3x3 conv over a 2x grid, consumed PACKED-2 and emitted PACKED-4:
    a stride-2 3x3-tap conv over the packed-2 layout, returning
    (3, 3, 4*cin, 16*cout).

    Rationale (SR-tail conv_out, 64 -> 3 channels): with 12 true output
    channels the MXU bills a full 128-lane output pass, so cost is
    proportional to M * K alone. The 2x2 packed-2 kernel
    (``pack_conv3x3_as2x2_kernel``) bills M*K = (HR/4) * (4*4*cin); this
    packed-4 emission bills (HR/16) * (9*4*cin) — 1.8x less — because
    each output position now carries 16 phases (48 channels) toward the
    128-lane floor instead of 4 (12).

    Tap algebra (rows; cols symmetric): output position I emits phase
    py' in {0..3} for HR row p = 4I - 1 + py' (one-row phase shift, see
    ``packed4_phase_unshift``); stride 2 with padding ((1, 2)) makes tap
    tY read packed-2 cell 2I - 1 + tY = HR rows 4I - 2 + 2*tY + ry, so
    dy = 2*tY + ry - py' - 1, kept when |dy| <= 1. The two zero-padded
    cells below the image supply exactly the HR zero-pad row (in-range
    taps of row sh are the conv's padding; rows beyond get zero weight).
    Exact numerics; traceable (gradients flow to w_hwio).
    """
    return _pack_conv3x3_blocks(
        w_hwio, taps=3, phases=4, disp=lambda t, r, p: 2 * t + r - p - 1)


def conv2d_transpose(p, x, stride: int = 2, padding: int = 1,
                     output_padding: int = 1):
    """NHWC transposed conv == torch ConvTranspose2d(3, 2, 1, output_padding=1)
    with the kernel stored pre-converted to the equivalent fractionally-
    strided conv's HWIO layout (spatially flipped at load time).

    TPU-native lowering: sub-pixel decomposition (see conv2d_transpose_packed)
    followed by the phase interleave. Exact torch numerics (tested).
    """
    assert stride == 2 and padding == 1 and output_padding == 1
    cout = p["w"].shape[3]
    y = conv2d_transpose_packed(p, x)
    n, h, ww_, _ = y.shape
    y = y.reshape(n, h, ww_, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * ww_, cout)
    return y


def dense(p, x):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def batch_norm(p, x, train: bool, eps: float = 1e-5, momentum: float = 0.1):
    """BatchNorm2d over NHWC with torch semantics.

    In training mode, statistics are computed over (N, H, W) of the *global*
    batch: under a batch-sharded jit this mean is a cross-replica reduction,
    i.e. SyncBatchNorm (`base_model.py:133`) for free. Returns (y, new_p)
    where new_p carries torch-style running stats (unbiased var EMA).
    """
    if train:
        axes = (0, 1, 2)
        # statistics always accumulate in fp32 (bf16 means drift)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        var = jnp.mean(jnp.square(xf - mean), axes)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        # torch running-stat EMAs: mean uses batch mean, var the unbiased var
        new_p = dict(p)
        new_p["mean"] = (1 - momentum) * p["mean"] + momentum * mean.astype(
            jnp.float32
        )
        new_p["var"] = (1 - momentum) * p["var"] + momentum * unbiased.astype(
            jnp.float32
        )
    else:
        xf = x.astype(jnp.float32)
        mean, var = p["mean"].astype(jnp.float32), p["var"].astype(jnp.float32)
        new_p = p
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv * p["scale"].astype(jnp.float32) + p[
        "bias"].astype(jnp.float32)
    return y.astype(x.dtype), new_p


def max_pool_2x2(x):
    """MaxPool2d(2, 2) with floor semantics (drops odd trailing row/col)."""
    h, w = x.shape[-3], x.shape[-2]
    if h % 2 or w % 2:
        x = x[..., : h // 2 * 2, : w // 2 * 2, :]
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


def relu(x):
    return jnp.maximum(x, 0)
