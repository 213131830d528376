"""SRNet — reconstruction + upsampling trunk of the frame-recurrent generator.

Behavioural spec from the reference (`tecogan_nets.py:85-147`):
- input conv over concat(lr_curr, space_to_depth(warped hr_prev)) i.e.
  (scale^2 + 1) * C channels -> nf, ReLU;
- ``nb`` residual blocks without BN (conv-ReLU-conv + skip);
- one (2x) or two (4x) transposed-conv 2x upsampling stages
  (k=3, s=2, p=1, op=1) each followed by ReLU;
- output conv + global residual: the bicubic/bilinear-upsampled lr frame.

NHWC throughout; the upsample_fn is injected (degradation-dependent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import nn


def init_srnet(key, in_nc: int = 3, out_nc: int = 3, nf: int = 64,
               nb: int = 10, scale: int = 4):
    params = {"_meta": {}}
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
    params.pop("_meta")
    return params


def srnet_apply(params, lr_curr: jnp.ndarray, hr_prev_packed: jnp.ndarray,
                upsample_fn, nb: int, scale: int) -> jnp.ndarray:
    """lr_curr (n,h,w,c) + hr_prev_packed (n,h,w,s*s*c) -> hr (n,sh,sw,c)."""
    out = jnp.concatenate([lr_curr, hr_prev_packed], axis=-1)
    out = nn.relu(nn.conv2d(params["conv_in"], out, padding=1))
    for bi in range(nb):
        res = nn.relu(nn.conv2d(params[f"res{bi}_0"], out, padding=1))
        res = nn.conv2d(params[f"res{bi}_1"], res, padding=1)
        out = out + res
    n_up = 2 if scale == 4 else 1
    for ui in range(n_up):
        out = nn.relu(nn.conv2d_transpose(params[f"up{ui}"], out))
    out = nn.conv2d(params["conv_out"], out, padding=1)
    return out + upsample_fn(lr_curr)
