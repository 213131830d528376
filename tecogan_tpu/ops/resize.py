"""Separable resampling ops as 1-D operator matrices (MXU-friendly).

Every spatial resampling operation the framework needs is linear and
separable, so instead of translating the reference's conv-kernel tricks
(`codes/utils/net_utils.py:85-156`, `codes/utils/data_utils.py:30-53`) we
build an explicit ``(out_size, in_size)`` interpolation matrix per axis once
(host-side, cached) and apply it with two einsums. On TPU each einsum is a
large batched matmul that maps straight onto the MXU, and XLA fuses the pair.

Supported modes:

- ``bilinear_half_pixel``  — matches ``torch.nn.functional.interpolate(
  mode='bilinear', align_corners=False)`` (used by FNet's decoder and the BI
  upsampling path; reference `net_utils.py:85-89`, `tecogan_nets.py:74-79`).
- ``tecogan_bicubic``      — matches the reference's custom separable 4-tap
  cubic upsampler with a=-0.75 and replicate padding (`net_utils.py:101-156`),
  itself a port of TecoGAN-TensorFlow's bicubic.
- ``gauss_down``           — Gaussian blur + stride-s downsample ("BD"
  degradation, `data_utils.py:30-53`), optionally with reflect padding.
- ``matlab_bicubic``       — Matlab ``imresize(..., 'bicubic')`` with
  antialiasing (the "BI" degradation, `scripts/generate_lr_bi.m`).

All matrices are float32 numpy arrays; application code may cast them to the
compute dtype.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = [
    "resize_matrix",
    "apply_separable",
    "upsample_bilinear",
    "upsample_tecogan_bicubic",
    "get_upsampling_fn",
    "matlab_imresize_matrix",
]


# --------------------------------------------------------------------------
# matrix builders (host-side numpy, cached)
# --------------------------------------------------------------------------

def _bilinear_half_pixel_matrix(in_size: int, scale: int) -> np.ndarray:
    """(scale*in, in) matrix for half-pixel bilinear upsampling.

    Output position o samples input coordinate (o + 0.5)/scale - 0.5 with
    indices clamped to the valid range (replicate border), which is exactly
    torch's align_corners=False behaviour.
    """
    out_size = in_size * scale
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        src = (o + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        w1 = src - i0
        m[o, np.clip(i0, 0, in_size - 1)] += 1.0 - w1
        m[o, np.clip(i0 + 1, 0, in_size - 1)] += w1
    return m.astype(np.float32)


def _bilinear_fractional_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix for half-pixel bilinear resize at an arbitrary
    (possibly fractional) ratio — torch ``nn.Upsample(scale_factor=out/in,
    mode='bilinear', align_corners=False)`` semantics (source coordinate
    (o + 0.5)/scale - 0.5, indices clamped). Used by LPIPS spatial maps
    (`networks_basic.py:20-24`), whose stage maps upsample by
    non-integer factors."""
    scale = float(out_size) / in_size
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        src = (o + 0.5) / scale - 0.5
        i0 = int(np.floor(src))
        w1 = src - i0
        m[o, np.clip(i0, 0, in_size - 1)] += 1.0 - w1
        m[o, np.clip(i0 + 1, 0, in_size - 1)] += w1
    return m.astype(np.float32)


def _cubic_weights_tecogan(s: float, a: float = -0.75) -> np.ndarray:
    """4-tap cubic weights at fractional offset s for taps [-1, 0, 1, 2].

    Uses the Keys cubic-convolution polynomial coefficients with parameter
    ``a`` in the same tap order as the reference's kernel table
    (`net_utils.py:117-127`).
    """
    coeffs = np.array(
        [
            [0.0, a, -2.0 * a, a],
            [1.0, 0.0, -(a + 3.0), a + 2.0],
            [0.0, -a, 2.0 * a + 3.0, -(a + 2.0)],
            [0.0, 0.0, a, -a],
        ],
        dtype=np.float64,
    )
    powers = np.array([1.0, s, s * s, s * s * s], dtype=np.float64)
    return coeffs @ powers  # (4,) — taps [-1, 0, 1, 2]


def _tecogan_bicubic_matrix(in_size: int, scale: int) -> np.ndarray:
    """(scale*in, in) matrix reproducing the reference BicubicUpsampler.

    Output o = scale*i + d samples taps (i-1, i, i+1, i+2) with cubic
    weights at s = d/scale; borders use replicate padding (1 left / 2 right
    in the reference's explicit pad, equivalent to index clamping).
    """
    out_size = in_size * scale
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for d in range(scale):
        w = _cubic_weights_tecogan(d / scale)
        for i in range(in_size):
            o = scale * i + d
            for t, tap in enumerate((-1, 0, 1, 2)):
                m[o, np.clip(i + tap, 0, in_size - 1)] += w[t]
    return m.astype(np.float32)


def _gauss_1d(ksize: int, sigma: float) -> np.ndarray:
    """Symmetric Gaussian window, identical to scipy.signal.gaussian."""
    n = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    return np.exp(-(n ** 2) / (2.0 * sigma ** 2))


def _gauss_down_matrix(
    in_size: int, scale: int, sigma: float, pad: bool
) -> np.ndarray:
    """(out, in) matrix for Gaussian blur + stride-``scale`` downsampling.

    Matches ``downsample_bd`` (`data_utils.py:30-53`): a 2-D Gaussian kernel
    of size 1+2*int(3*sigma), normalised over the full 2-D kernel, applied
    with stride ``scale``. The 2-D kernel is an outer product of this 1-D
    window normalised by its own sum, so two 1-D passes are exact.

    With ``pad=True`` the input is reflect-padded like the inference path
    (`base_model.py:96-119`); reflected taps are folded into the matrix.
    """
    ksize = 1 + 2 * int(sigma * 3.0)
    g = _gauss_1d(ksize, sigma)
    g = g / g.sum()

    if pad:
        pad_total = ksize - 1
        pad_lo = pad_total // 2
        out_size = (in_size + pad_total - ksize) // scale + 1
    else:
        pad_lo = 0
        out_size = (in_size - ksize) // scale + 1

    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        for t in range(ksize):
            idx = o * scale + t - pad_lo
            if idx < 0:
                idx = -idx  # torch 'reflect': edge pixel not repeated
            elif idx >= in_size:
                idx = 2 * in_size - idx - 2
            m[o, idx] += g[t]
    return m.astype(np.float32)


def _matlab_cubic(x: np.ndarray) -> np.ndarray:
    """Matlab's bicubic kernel (Keys, a=-0.5)."""
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    w = np.where(
        ax <= 1,
        1.5 * ax3 - 2.5 * ax2 + 1.0,
        np.where(ax <= 2, -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0, 0.0),
    )
    return w


def matlab_imresize_matrix(
    in_size: int, out_size: int, antialias: bool = True,
    scale: float | None = None,
) -> np.ndarray:
    """(out, in) matrix reproducing Matlab imresize's bicubic resampling.

    Follows Matlab's `contributions` algorithm: half-pixel coordinate
    mapping, kernel widened by 1/scale when downscaling with antialiasing,
    boundary handling by folding out-of-range taps onto the edge pixels.
    Used for the BI degradation pipeline (`scripts/generate_lr_bi.m:29-40`).

    ``scale``: the caller-requested scale factor. Matlab's scale-given
    convention (imresize(I, scale)) maps coordinates with the GIVEN scale
    while the output size is ceil(in*scale) — when in_size is not a
    multiple of 1/scale the two differ, and deriving scale as out/in
    shifts the mapping and kernel width near the borders. Defaults to
    out_size/in_size (the OutputSize calling convention, where Matlab
    derives the scale the same way).
    """
    if scale is None:
        scale = out_size / in_size
    if antialias and scale < 1.0:
        kernel_width = 4.0 / scale

        def kernel(x):
            return scale * _matlab_cubic(scale * x)

    else:
        kernel_width = 4.0
        kernel = _matlab_cubic

    # output coordinates in input space (1-indexed math kept in 0-indexed form)
    x = np.arange(out_size, dtype=np.float64)
    u = (x + 0.5) / scale - 0.5
    left = np.floor(u - kernel_width / 2.0).astype(np.int64)
    p = int(np.ceil(kernel_width)) + 2
    taps = left[:, None] + np.arange(p)[None, :]
    weights = kernel(u[:, None] - taps)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # Matlab's boundary handling mirrors indices symmetrically
    # (aux = [1:m, m:-1:1]; 0-indexed: -1 -> 0, -2 -> 1, m -> m-1, ...).
    # Edge-clamping instead is WRONG for antialiased downscales: the
    # widened kernel reaches ~(2/scale - 1) px past the border with a few
    # percent combined weight, which clamping piles onto the edge pixel.
    j = np.mod(taps, 2 * in_size)
    idx = np.where(j < in_size, j, 2 * in_size - 1 - j)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        np.add.at(m[o], idx[o], weights[o])
    return m.astype(np.float32)


@functools.lru_cache(maxsize=256)
def resize_matrix(mode: str, in_size: int, **kw) -> np.ndarray:
    """Cached dispatch for the 1-D operator matrices above."""
    if mode == "bilinear_half_pixel":
        return _bilinear_half_pixel_matrix(in_size, kw["scale"])
    if mode == "bilinear_fractional":
        return _bilinear_fractional_matrix(in_size, kw["out_size"])
    if mode == "tecogan_bicubic":
        return _tecogan_bicubic_matrix(in_size, kw["scale"])
    if mode == "gauss_down":
        return _gauss_down_matrix(in_size, kw["scale"], kw["sigma"], kw["pad"])
    if mode == "matlab_bicubic":
        return matlab_imresize_matrix(
            in_size, kw["out_size"], kw.get("antialias", True)
        )
    raise ValueError(f"Unrecognized resize mode: {mode}")


# --------------------------------------------------------------------------
# application
# --------------------------------------------------------------------------

def apply_separable(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply per-axis operator matrices to NHWC (or ...HWC) data.

    Computes ``out[..., O, P, c] = sum_{h,w} mh[O,h] * mw[P,w] * x[..., h, w, c]``
    as two batched matmuls (MXU work, fused by XLA).
    """
    dt = x.dtype
    mh = jnp.asarray(mh, dtype=dt)
    mw = jnp.asarray(mw, dtype=dt)
    x = jnp.einsum("Oh,...hwc->...Owc", mh, x)
    x = jnp.einsum("Pw,...Owc->...OPc", mw, x)
    return x


def upsample_bilinear(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """x (..., h, w, c) -> (..., s*h, s*w, c), torch align_corners=False."""
    h, w = x.shape[-3], x.shape[-2]
    mh = resize_matrix("bilinear_half_pixel", h, scale=scale)
    mw = resize_matrix("bilinear_half_pixel", w, scale=scale)
    return apply_separable(x, mh, mw)


def upsample_tecogan_bicubic(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """x (..., h, w, c) -> (..., s*h, s*w, c), reference BicubicUpsampler."""
    h, w = x.shape[-3], x.shape[-2]
    mh = resize_matrix("tecogan_bicubic", h, scale=scale)
    mw = resize_matrix("tecogan_bicubic", w, scale=scale)
    return apply_separable(x, mh, mw)


def get_upsampling_fn(scale: int, degradation: str):
    """Degradation-dependent upsampler (reference `net_utils.py:85-97`)."""
    if degradation == "BI":
        return functools.partial(upsample_bilinear, scale=scale)
    if degradation == "BD":
        return functools.partial(upsample_tecogan_bicubic, scale=scale)
    raise ValueError(f"Unrecognized degradation type: {degradation}")
