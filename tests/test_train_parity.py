"""End-to-end FRVSR training-step parity vs torch.

Same converted weights, same batch, same losses (CB pixel + CB warp), same
Adam hyperparameters -> the updated parameters must match. This exercises
the whole differentiation path (scan-unrolled recurrence, warp gradients,
operator-matrix upsamplers) against torch autograd.
"""

import functools

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tecogan_tpu.models import convert
from tecogan_tpu.models.networks import FRNetConfig
from tecogan_tpu.models.schedules import make_adam
from tecogan_tpu.models.steps import (
    TrainConfig, frvsr_init_state, frvsr_train_step)

from torch_oracles import TorchFRNet, torch_warp


def _charbonnier(x, y):
    return torch.sqrt((x - y) ** 2 + 1e-6).mean()


def test_frvsr_step_matches_torch(rng):
    torch.manual_seed(0)  # deterministic oracle weights
    nb, nf, scale = 2, 16, 4
    cfg_g = FRNetConfig(nf=nf, nb=nb, scale=scale, degradation="BD",
                        remat=False)
    tcfg = TrainConfig(
        scale=scale, degradation="BI", sigma=1.5, tempo_extent=3,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit={"type": "CB", "weight": 1, "reduction": "mean"})

    tnet = TorchFRNet(3, 3, nf, nb, scale, "BD")
    params = convert.convert_frnet(
        {k: v.numpy() for k, v in tnet.state_dict().items()}, nb, scale)

    lr_np = rng.random((2, 3, 8, 8, 3)).astype(np.float32)
    gt_np = rng.random((2, 3, 32, 32, 3)).astype(np.float32)

    # --- JAX step
    lr_t = 1e-3
    tx_g, _ = make_adam({"lr": lr_t, "betas": [0.9, 0.999]})
    state = frvsr_init_state(jax.tree.map(jnp.asarray, params), tx_g)
    step = jax.jit(functools.partial(
        frvsr_train_step, cfg_g=cfg_g, tcfg=tcfg, tx_g=tx_g))
    state, logs = step(state, {"gt": jnp.asarray(gt_np),
                               "lr": jnp.asarray(lr_np)})

    # --- torch step
    opt = torch.optim.Adam(tnet.parameters(), lr=lr_t, betas=(0.9, 0.999))
    lr_tor = torch.from_numpy(np.moveaxis(lr_np, -1, 2))
    gt_tor = torch.from_numpy(np.moveaxis(gt_np, -1, 2))
    hr, hr_flow, lr_flow, prev, cur = tnet.forward_sequence(lr_tor)
    loss = _charbonnier(hr, gt_tor)
    loss_warp = _charbonnier(torch_warp(prev, lr_flow), cur)
    total = loss + loss_warp
    opt.zero_grad()
    total.backward()
    opt.step()

    np.testing.assert_allclose(
        float(logs["l_pix_G"]), float(loss), rtol=1e-4)
    np.testing.assert_allclose(
        float(logs["l_warp_G"]), float(loss_warp), rtol=1e-4)

    # compare updated weights after one Adam step
    want = convert.convert_frnet(
        {k: v.detach().numpy() for k, v in tnet.state_dict().items()},
        nb, scale)
    got = jax.device_get(state["g"])
    flat_want = jax.tree.leaves(want)
    flat_got = jax.tree.leaves(got)
    assert len(flat_want) == len(flat_got)
    for a, b in zip(flat_got, flat_want):
        # Adam normalises gradients, so updates are ~lr in magnitude;
        # tolerance covers fp32 accumulation-order differences
        np.testing.assert_allclose(a, b, atol=2e-4)
