"""Space<->depth shuffles for NHWC data.

Replaces the reference's NCHW ``space_to_depth`` (`net_utils.py:36-47`) with
the NHWC-native equivalent. The channel ordering of the packed output is
chosen to match the reference exactly once transposed to NHWC, i.e. packed
channel index = (dy * scale + dx) * c + ch — the (dy, dx) block offsets are
the leading factor, exactly as the reference permutes (0, 3, 5, 1, 2, 4).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["space_to_depth", "depth_to_space"]


def space_to_depth(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(..., h, w, c) -> (..., h/s, w/s, s*s*c), block offsets leading."""
    *lead, h, w, c = x.shape
    oh, ow = h // scale, w // scale
    x = x.reshape(*lead, oh, scale, ow, scale, c)
    # (..., oh, dy, ow, dx, c) -> (..., oh, ow, dy, dx, c)
    x = jnp.moveaxis(x, (-4, -2), (-3, -2))
    return x.reshape(*lead, oh, ow, scale * scale * c)


def depth_to_space(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    *lead, h, w, c2 = x.shape
    c = c2 // (scale * scale)
    x = x.reshape(*lead, h, w, scale, scale, c)
    # (..., h, w, dy, dx, c) -> (..., h, dy, w, dx, c)
    x = jnp.moveaxis(x, (-3, -2), (-4, -2))
    return x.reshape(*lead, h * scale, w * scale, c)
