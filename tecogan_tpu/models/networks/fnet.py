"""FNet — coarse-to-fine optical-flow estimator (TPU-native).

Behavioural spec from the reference (`tecogan_nets.py:16-82`): a 3-level
conv encoder (each level: two 3x3 convs + LeakyReLU(0.2), then 2x2 max-pool)
followed by 3 decoder levels (two 3x3 convs + LeakyReLU, then 2x bilinear
upsample with half-pixel alignment) and a flow head whose output is
``tanh(.) * 24`` (max velocity 24 px). Input is concat(x_cur, x_prev) along
channels. All activations NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn
from ...ops import upsample_bilinear

_ENC = [(32, 32), (64, 64), (128, 128)]
_DEC = [(256, 256), (128, 128), (64, 64)]
_MAX_VELOCITY = 24.0


def init_fnet(key, in_nc: int = 3):
    """Initialise FNet params. Layer names mirror the conv order so that
    checkpoint conversion is a flat positional mapping."""
    params = {}
    cin = 2 * in_nc
    keys = iter(jax.random.split(key, 64))
    for li, (c1, c2) in enumerate(_ENC):
        params[f"enc{li}_0"] = nn.init_conv(next(keys), 3, 3, cin, c1)
        params[f"enc{li}_1"] = nn.init_conv(next(keys), 3, 3, c1, c2)
        cin = c2
    for li, (c1, c2) in enumerate(_DEC):
        params[f"dec{li}_0"] = nn.init_conv(next(keys), 3, 3, cin, c1)
        params[f"dec{li}_1"] = nn.init_conv(next(keys), 3, 3, c1, c2)
        cin = c2
    params["flow_0"] = nn.init_conv(next(keys), 3, 3, cin, 32)
    params["flow_1"] = nn.init_conv(next(keys), 3, 3, 32, 2)
    return params


def fnet_apply(params, x_cur: jnp.ndarray, x_prev: jnp.ndarray) -> jnp.ndarray:
    """Estimate flow from x_cur to x_prev. Inputs (n, h, w, c) -> (n, h', w', 2)
    where h' = (h // 8) * 8 (max-pool floors odd sizes, like the reference)."""
    out = jnp.concatenate([x_cur, x_prev], axis=-1)
    for li in range(3):
        out = nn.leaky_relu(nn.conv2d(params[f"enc{li}_0"], out, padding=1))
        out = nn.leaky_relu(nn.conv2d(params[f"enc{li}_1"], out, padding=1))
        out = nn.max_pool_2x2(out)
    for li in range(3):
        out = nn.leaky_relu(nn.conv2d(params[f"dec{li}_0"], out, padding=1))
        out = nn.leaky_relu(nn.conv2d(params[f"dec{li}_1"], out, padding=1))
        out = upsample_bilinear(out, 2)
    out = nn.leaky_relu(nn.conv2d(params["flow_0"], out, padding=1))
    out = nn.conv2d(params["flow_1"], out, padding=1)
    return jnp.tanh(out) * _MAX_VELOCITY
