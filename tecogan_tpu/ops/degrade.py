"""Degradation operators (BD Gaussian-blur downsampling, BI bicubic).

TPU-native equivalents of the reference's on-the-fly LR generation
(`codes/utils/data_utils.py:11-53`, `codes/models/base_model.py:42-122`).
The blur + stride conv is separable, so it is expressed as two operator-
matrix matmuls (see ops/resize.py) and runs inside the jitted train step —
no host round trip, unlike the reference's CPU path at inference.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .resize import apply_separable, resize_matrix, matlab_imresize_matrix

__all__ = ["downsample_bd", "bd_border_size", "imresize_matlab"]


def bd_border_size(sigma: float) -> int:
    """GT border consumed by the unpadded BD conv (`base_model.py:61`)."""
    return int(sigma * 3.0)


def downsample_bd(
    x: jnp.ndarray, scale: int, sigma: float = 1.5, pad_data: bool = False
) -> jnp.ndarray:
    """Gaussian blur + stride-``scale`` downsample of (..., h, w, c) data.

    ``pad_data=False`` reproduces the training path (valid conv; callers crop
    the GT border accordingly, `base_model.py:55-85`); ``pad_data=True``
    reproduces the inference path with reflect padding (`base_model.py:96-119`).
    """
    h, w = x.shape[-3], x.shape[-2]
    mh = resize_matrix("gauss_down", h, scale=scale, sigma=sigma, pad=pad_data)
    mw = resize_matrix("gauss_down", w, scale=scale, sigma=sigma, pad=pad_data)
    return apply_separable(x, mh, mw)


@functools.lru_cache(maxsize=64)
def _imresize_mats(in_h: int, in_w: int, out_h: int, out_w: int,
                   antialias: bool, scale: float | None):
    return (
        matlab_imresize_matrix(in_h, out_h, antialias, scale=scale),
        matlab_imresize_matrix(in_w, out_w, antialias, scale=scale),
    )


def imresize_matlab(
    x, scale: float | None = None, out_shape=None, antialias: bool = True
):
    """Matlab-compatible bicubic imresize of (..., h, w, c) data.

    Replaces `scripts/generate_lr_bi.m` so the BI degradation pipeline needs
    no Matlab. Works on jnp or np arrays (returns the matching kind).

    Matlab semantics for both calling conventions: a given ``scale`` is
    used directly in the coordinate mapping (output size = ceil(in*scale));
    a given ``out_shape`` derives the per-axis scale as out/in.
    """
    h, w = x.shape[-3], x.shape[-2]
    if out_shape is None:
        out_shape = (int(np.ceil(h * scale)), int(np.ceil(w * scale)))
    else:
        scale = None
    mh, mw = _imresize_mats(h, w, out_shape[0], out_shape[1], antialias,
                            scale)
    if isinstance(x, np.ndarray):
        y = np.einsum("Oh,...hwc->...Owc", mh.astype(np.float64), x)
        return np.einsum("Pw,...Owc->...OPc", mw.astype(np.float64), y)
    return apply_separable(x, mh, mw)
