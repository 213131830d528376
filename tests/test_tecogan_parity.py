"""Full TecoGAN GAN-step parity vs a torch replication: same weights, same
batch -> same losses, same D verdict, same updated G and D parameters.

This is the most intricate wiring in the framework (ping-pong doubling,
flow-merge reuse, detach boundaries, D-then-G ordering against the UPDATED
discriminator, adaptive vote); any deviation shows up as a weight mismatch
after one Adam step.
"""

import functools

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tecogan_tpu.models import convert
from tecogan_tpu.models.networks import FRNetConfig, STNetConfig
from tecogan_tpu.models.schedules import make_adam
from tecogan_tpu.models.steps import (
    TrainConfig, tecogan_init_state, tecogan_train_step)

from torch_oracles import (
    TorchDTrunk, TorchFRNet, torch_stnet_assembly, torch_warp)


def _cb(x, y):
    return torch.sqrt((x - y) ** 2 + 1e-6).mean()


def _bce(logits, real):
    return torch.nn.functional.binary_cross_entropy_with_logits(
        logits, torch.full_like(logits, float(real)))


def test_tecogan_gan_step_matches_torch(rng):
    torch.manual_seed(0)  # deterministic oracle weights
    nb, nf, scale, size = 1, 8, 4, 32
    te = 3  # tempo_extent -> 5 frames after ping-pong, one 3-frame clip
    lr_rate = 1e-3
    cfg_g = FRNetConfig(nf=nf, nb=nb, scale=scale, degradation="BD",
                        remat=False)
    cfg_d = STNetConfig(spatial_size=size, degradation="BD", scale=scale)
    tcfg = TrainConfig(
        scale=scale, degradation="BI", sigma=1.5, tempo_extent=te,
        pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        warping_crit={"type": "CB", "weight": 1, "reduction": "mean"},
        pingpong_crit={"type": "CB", "weight": 0.5, "reduction": "mean"},
        feature_matching_crit={"type": "L1", "weight": 1,
                               "reduction": "mean"},
        gan_crit={"type": "GAN", "weight": 0.01, "reduction": "mean"},
        update_policy="always", crop_border_ratio=0.75)

    tg = TorchFRNet(3, 3, nf, nb, scale, "BD")
    td = TorchDTrunk(27, size)
    params_g = convert.convert_frnet(
        {k: v.numpy() for k, v in tg.state_dict().items()}, nb, scale)
    params_d = convert.convert_stnet(
        {k: v.numpy() for k, v in td.state_dict().items()}, size)

    lr_np = rng.random((1, te, 8, 8, 3)).astype(np.float32)
    gt_np = rng.random((1, te, size, size, 3)).astype(np.float32)

    # ---------------- JAX step
    tx_g, _ = make_adam({"lr": lr_rate})
    tx_d, _ = make_adam({"lr": lr_rate})
    state = tecogan_init_state(
        jax.tree.map(jnp.asarray, params_g),
        jax.tree.map(jnp.asarray, params_d), tx_g, tx_d)
    step = jax.jit(functools.partial(
        tecogan_train_step, cfg_g=cfg_g, cfg_d=cfg_d, tcfg=tcfg,
        tx_g=tx_g, tx_d=tx_d))
    state, logs = step(state, {"gt": jnp.asarray(gt_np),
                               "lr": jnp.asarray(lr_np)})

    # ---------------- torch replication (reference semantics)
    opt_g = torch.optim.Adam(tg.parameters(), lr=lr_rate)
    opt_d = torch.optim.Adam(td.parameters(), lr=lr_rate)
    td.train()

    lr_t = torch.from_numpy(np.moveaxis(lr_np, -1, 2))
    gt_t = torch.from_numpy(np.moveaxis(gt_np, -1, 2))
    n, t, c, lh, lw = lr_t.shape
    bi_t = tg.up(lr_t.view(n * t, c, lh, lw)).view(n, t, c, size, size)

    dbl = lambda x: torch.cat([x, x.flip(1)[:, 1:]], dim=1)
    lr_t, gt_t, bi_t = dbl(lr_t), dbl(gt_t), dbl(bi_t)

    hr, hr_flow, lr_flow, prev, cur = tg.forward_sequence(lr_t)

    x_real, merge = torch_stnet_assembly(gt_t, bi_t, hr_flow, 0.75, True)
    real_logits, real_feats = td(x_real)
    x_fake, _ = torch_stnet_assembly(hr.detach(), bi_t, hr_flow, 0.75, True)
    fake_logits, _ = td(x_fake)

    dist = (torch.log(torch.sigmoid(real_logits) + 1e-8).mean()
            - torch.log(torch.sigmoid(fake_logits) + 1e-8).mean())

    loss_d = _bce(real_logits, True) + _bce(fake_logits, False)
    opt_d.zero_grad()
    loss_d.backward()
    opt_d.step()

    # G phase against the UPDATED D
    for p in td.parameters():
        p.requires_grad_(False)
    loss_g = _cb(hr, gt_t)
    l_pix = loss_g.detach().clone()
    l_warp = _cb(torch_warp(prev, lr_flow), cur)
    loss_g = loss_g + l_warp
    hr_fw = hr[:, :te - 1]
    hr_bw = hr[:, te:].flip(1)
    l_pp = 0.5 * _cb(hr_fw, hr_bw)
    loss_g = loss_g + l_pp
    x_fake_g, _ = torch_stnet_assembly(hr, bi_t, hr_flow, 0.75, True)
    fake_g_logits, fake_g_feats = td(x_fake_g)
    layer_norm = [12.0, 14.0, 24.0, 100.0]
    l_fm = sum(
        torch.nn.functional.l1_loss(ff, rf.detach()) / ln
        for ff, rf, ln in zip(fake_g_feats, real_feats, layer_norm))
    loss_g = loss_g + l_fm
    l_gan = 0.01 * _bce(fake_g_logits, True)
    loss_g = loss_g + l_gan
    opt_g.zero_grad()
    loss_g.backward()
    opt_g.step()

    # ---------------- compare
    np.testing.assert_allclose(float(logs["distance"]),
                               float(dist.detach()),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(logs["l_gan_D"]), float(loss_d.detach()),
                               rtol=1e-4)
    np.testing.assert_allclose(float(logs["l_pix_G"]), float(l_pix.detach()),
                               rtol=1e-4)
    np.testing.assert_allclose(float(logs["l_pp_G"]), float(l_pp.detach()),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(float(logs["l_fm_G"]), float(l_fm.detach()),
                               rtol=1e-3)
    np.testing.assert_allclose(float(logs["l_gan_G"]), 0.01 * float(
        _bce(fake_g_logits, True).detach()), rtol=1e-3)

    def assert_params_close(got, want, lr):
        """Adam normalises gradients, so a parameter whose gradient is at
        the eps floor can flip its +-lr update under fp32 noise. The robust
        invariants: every deviation is bounded by ~2*lr (a flipped update,
        never a systematic error), flips are rare, and the typical element
        matches tightly."""
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert d.max() <= 2.1 * lr, d.max()
            assert (d > 5e-4).mean() < 2e-3
            assert np.median(d) < 5e-5

    want_g = convert.convert_frnet(
        {k: v.detach().numpy() for k, v in tg.state_dict().items()},
        nb, scale)
    assert_params_close(jax.device_get(state["g"]), want_g, lr_rate)

    want_d = convert.convert_stnet(
        {k: v.detach().numpy() for k, v in td.state_dict().items()}, size)
    assert_params_close(jax.device_get(state["d"]), want_d, lr_rate)
