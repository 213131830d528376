"""Loss criteria (functional equivalents of `codes/models/optim/losses.py`).

``define_criterion`` maps the YAML criterion blocks to closures
``loss(x, y)`` / ``gan_loss(logits, is_real)``; everything is jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "charbonnier",
    "cosine_similarity_loss",
    "vanilla_gan_loss",
    "lsgan_loss",
    "define_criterion",
]


def _reduce(x, reduction: str):
    if reduction == "mean":
        return jnp.mean(x)
    if reduction == "sum":
        return jnp.sum(x)
    raise NotImplementedError(reduction)


def charbonnier(x, y, eps: float = 1e-6, reduction: str = "mean"):
    """Robust L1: sqrt(diff^2 + eps) (`losses.py:31-50`; note eps inside
    the sqrt, un-squared, matching the reference). Accumulates in fp32."""
    d = x.astype(jnp.float32) - y.astype(jnp.float32)
    return _reduce(jnp.sqrt(d * d + eps), reduction)


def cosine_similarity_loss(x, y, eps: float = 1e-8):
    """1 - mean cosine similarity along the channel axis (NHWC: axis -1).

    The reference computes torch cosine_similarity over dim=1 of NCHW
    (`losses.py:53-62`), i.e. the channel axis.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    dot = jnp.sum(x * y, axis=-1)
    nx = jnp.maximum(jnp.linalg.norm(x, axis=-1), eps)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=-1), eps)
    return 1.0 - jnp.mean(dot / (nx * ny))


def _bce_with_logits(logits, target):
    # numerically stable BCEWithLogits (fp32)
    logits = logits.astype(jnp.float32)
    target = target.astype(jnp.float32)
    return (jnp.maximum(logits, 0.0) - logits * target
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def vanilla_gan_loss(logits, is_real: bool, reduction: str = "mean"):
    target = jnp.full_like(logits, float(bool(is_real)))
    return _reduce(_bce_with_logits(logits, target), reduction)


def lsgan_loss(logits, is_real: bool, reduction: str = "mean"):
    logits = logits.astype(jnp.float32)
    target = jnp.full_like(logits, float(bool(is_real)))
    return _reduce(jnp.square(logits - target), reduction)


def define_criterion(crit_opt):
    """YAML criterion block -> callable (None passes through)."""
    if crit_opt is None:
        return None
    ctype = crit_opt["type"]
    red = crit_opt.get("reduction", "mean")
    f32 = lambda v: v.astype(jnp.float32)
    if ctype == "MSE":
        return lambda x, y: _reduce(jnp.square(f32(x) - f32(y)), red)
    if ctype == "L1":
        return lambda x, y: _reduce(jnp.abs(f32(x) - f32(y)), red)
    if ctype == "CB":
        return lambda x, y: charbonnier(x, y, reduction=red)
    if ctype == "CosineSimilarity":
        return cosine_similarity_loss
    if ctype == "GAN":
        return lambda logits, is_real: vanilla_gan_loss(logits, is_real, red)
    if ctype == "LSGAN":
        return lambda logits, is_real: lsgan_loss(logits, is_real, red)
    raise ValueError(f"Unrecognized criterion: {ctype}")
