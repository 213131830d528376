"""STNet input-assembly parity vs a torch oracle: bw/idle/fw flow merge,
27-channel triplet packing ("rrrgggbbb"), and the warped-border crop."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tecogan_tpu.models.networks import STNetConfig
from tecogan_tpu.models.networks.discriminators import (
    build_flow_merge,
    build_stnet_input,
)

from torch_oracles import torch_warp


def _torch_assembly(data, bi, hr_flow, crop_ratio, use_pp):
    """Reference semantics (`tecogan_nets.py:384-463`) in torch, NCHW."""
    n, t_all, c, hh, ww = data.shape
    t = t_all // 3 * 3
    n_clip = n * (t // 3)
    s_size = hh
    c_size = int(s_size * crop_ratio)
    n_pad = (s_size - c_size) // 2

    flow_bw = hr_flow[:, 0:t:3]
    flow_idle = torch.zeros_like(flow_bw)
    assert use_pp
    flow_fw = hr_flow.flip(1)[:, 1:t:3]
    merge = torch.stack([flow_bw, flow_idle, flow_fw], dim=2)
    merge = merge.reshape(n_clip * 3, 2, hh, ww)

    def pack(x):
        x = x[:, :t].reshape(n_clip, 3, c, hh, ww)
        return x.permute(0, 2, 1, 3, 4).reshape(n_clip, c * 3, hh, ww)

    cond = pack(bi)
    orig = pack(data)
    warped = torch_warp(data[:, :t].reshape(n * t, c, hh, ww), merge)
    warped = pack(warped.view(n, t, c, hh, ww))
    warped = F.pad(
        warped[..., n_pad:n_pad + c_size, n_pad:n_pad + c_size],
        (n_pad,) * 4, mode="constant")
    return torch.cat([orig, warped, cond], dim=1), merge


def test_stnet_input_assembly_matches_torch(rng):
    n, t, c, size = 2, 7, 3, 32  # t = 2*4-1 (ping-pong of tempo_extent 4)
    cfg = STNetConfig(spatial_size=size, degradation="BD", scale=4)

    data = rng.random((n, t, size, size, c)).astype(np.float32)
    bi = rng.random((n, t, size, size, c)).astype(np.float32)
    hr_flow = (rng.random((n, t - 1, size, size, 2)).astype(np.float32)
               - 0.5) * 10

    merge = build_flow_merge(jnp.asarray(hr_flow), None, None, cfg,
                             use_pp=True)
    got = build_stnet_input(jnp.asarray(data), jnp.asarray(bi), merge,
                            0.75, cfg)

    want, want_merge = _torch_assembly(
        torch.from_numpy(np.moveaxis(data, -1, 2)),
        torch.from_numpy(np.moveaxis(bi, -1, 2)),
        torch.from_numpy(np.moveaxis(hr_flow, -1, 2)), 0.75, True)

    np.testing.assert_allclose(
        np.asarray(merge), np.moveaxis(want_merge.numpy(), 1, -1),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1),
        rtol=1e-4, atol=1e-5)
