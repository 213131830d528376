"""STNet input-assembly parity vs a torch oracle: bw/idle/fw flow merge,
27-channel triplet packing ("rrrgggbbb"), and the warped-border crop."""

import numpy as np
import torch

import jax.numpy as jnp

from tecogan_tpu.models.networks import STNetConfig
from tecogan_tpu.models.networks.discriminators import (
    build_flow_merge,
    build_stnet_input,
)

# the trickiest oracle (flow merge, rrrgggbbb packing, border crop) lives
# ONCE in torch_oracles so this test and the full GAN-step parity tests
# can never drift apart
from torch_oracles import torch_stnet_assembly as _torch_assembly  # noqa: E402,E501


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
