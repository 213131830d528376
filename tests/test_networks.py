"""Network-level parity: JAX networks + checkpoint converter vs torch
oracles with identical (random) weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tecogan_tpu.models import convert
from tecogan_tpu.models.networks import (
    FRNetConfig,
    STNetConfig,
    fnet_apply,
    forward_sequence,
    infer_sequence,
    srnet_apply,
    step,
    vgg19_features,
)
from tecogan_tpu.models.networks.discriminators import _trunk_apply


from torch_oracles import (
    TorchDTrunk,
    TorchFNet,
    TorchFRNet,
    TorchSRNet,
    torch_s2d,
    torch_upsample_fn,
)


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def sd_numpy(module):
    return {k: v.numpy() for k, v in module.state_dict().items()}


@torch.no_grad()
def test_fnet_parity(rng):
    tnet = TorchFNet(3).eval()
    params = convert._convert_fnet(sd_numpy(tnet))
    x1 = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    x2 = rng.standard_normal((2, 16, 24, 3)).astype(np.float32)
    got = np.asarray(fnet_apply(params, jnp.asarray(x1), jnp.asarray(x2)))
    want = tnet(torch.from_numpy(to_nchw(x1)),
                torch.from_numpy(to_nchw(x2))).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-4, atol=1e-5)


@torch.no_grad()
@pytest.mark.parametrize("scale,degradation", [(4, "BD"), (2, "BI")])
def test_srnet_parity(rng, scale, degradation):
    nb = 3
    tnet = TorchSRNet(3, 3, 32, nb, scale).eval()
    params = convert._convert_srnet(sd_numpy(tnet), nb, scale)
    lr = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    packed = rng.standard_normal((2, 8, 8, scale * scale * 3)).astype(
        np.float32)
    got = np.asarray(srnet_apply(params, jnp.asarray(lr), jnp.asarray(packed),
                                 nb, scale, degradation))
    want = tnet(torch.from_numpy(to_nchw(lr)),
                torch.from_numpy(to_nchw(packed)),
                torch_upsample_fn(scale, degradation)).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-3, atol=1e-4)


@torch.no_grad()
@pytest.mark.parametrize("scale,degradation", [(4, "BD"), (4, "BI"),
                                               (2, "BD")])
def test_frnet_forward_sequence_parity(rng, scale, degradation):
    cfg = FRNetConfig(nf=16, nb=2, scale=scale, degradation=degradation,
                      remat=False)
    tnet = TorchFRNet(3, 3, cfg.nf, cfg.nb, cfg.scale, degradation).eval()
    params = convert.convert_frnet(sd_numpy(tnet), cfg.nb, cfg.scale)
    lr = rng.standard_normal((1, 4, 16, 16, 3)).astype(np.float32) * 0.2 + 0.4

    out = forward_sequence(params, jnp.asarray(lr), cfg)
    want_hr, want_flow, want_lrflow, _, _ = tnet.forward_sequence(
        torch.from_numpy(np.moveaxis(lr, -1, 2)))

    np.testing.assert_allclose(
        np.asarray(out["hr_flow"]),
        np.moveaxis(want_flow.numpy(), 2, -1), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["hr_data"]),
        np.moveaxis(want_hr.numpy(), 2, -1), rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["lr_flow"]), to_nhwc(want_lrflow.numpy()),
        rtol=1e-3, atol=1e-4)


@torch.no_grad()
def test_frnet_step_parity_nondiv8(rng):
    """step() must reproduce the flow padding for sizes not divisible by 8."""
    cfg = FRNetConfig(nf=16, nb=2, scale=4, degradation="BD", remat=False)
    tnet = TorchFRNet(3, 3, cfg.nf, cfg.nb, cfg.scale, "BD").eval()
    params = convert.convert_frnet(sd_numpy(tnet), cfg.nb, cfg.scale)
    h, w = 14, 22  # not multiples of 8
    lr_c = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    lr_p = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    hr_p = rng.standard_normal((1, 4 * h, 4 * w, 3)).astype(np.float32)
    got = np.asarray(step(params, jnp.asarray(lr_c), jnp.asarray(lr_p),
                          jnp.asarray(hr_p), cfg))
    want = tnet.step(torch.from_numpy(to_nchw(lr_c)),
                     torch.from_numpy(to_nchw(lr_p)),
                     torch.from_numpy(to_nchw(hr_p))).numpy()
    np.testing.assert_allclose(got, to_nhwc(want), rtol=1e-3, atol=2e-4)


def test_infer_sequence_chunking_consistent(rng):
    """Chunked streaming must be invariant to the chunk size."""
    import jax

    cfg = FRNetConfig(nf=16, nb=2, scale=4, degradation="BD", remat=False)
    from tecogan_tpu.models.networks import init_frnet

    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = rng.random((7, 16, 16, 3)).astype(np.float32)
    a = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg, chunk=3))
    b = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg, chunk=7))
    assert a.shape == (7, 64, 64, 3) and a.dtype == np.uint8
    # different chunk sizes change FNet batch shapes, so results may differ
    # in the last float ulp -> at most off-by-one after uint8 quantisation
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.01


@torch.no_grad()
def test_discriminator_trunk_parity(rng):
    size = 64
    tnet = TorchDTrunk(27, size).eval()
    params = convert._convert_trunk(sd_numpy(tnet), size)
    x = rng.standard_normal((2, size, size, 27)).astype(np.float32)
    logits, feats, _ = _trunk_apply(params, jnp.asarray(x), train=False)
    want_logits, want_feats = tnet(torch.from_numpy(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(logits), want_logits.numpy(),
                               rtol=1e-3, atol=1e-4)
    for f, wf in zip(feats, want_feats):
        np.testing.assert_allclose(np.asarray(f), to_nhwc(wf.numpy()),
                                   rtol=1e-3, atol=1e-4)


@torch.no_grad()
def test_discriminator_trunk_parity_train_mode(rng):
    """Training mode uses batch statistics (the SyncBN-equivalent path)."""
    size = 32
    tnet = TorchDTrunk(6, size).train()
    params = convert._convert_trunk(sd_numpy(tnet), size)
    x = rng.standard_normal((4, size, size, 6)).astype(np.float32)
    logits, _, new_params = _trunk_apply(params, jnp.asarray(x), train=True)
    want_logits, _ = tnet(torch.from_numpy(to_nchw(x)))
    np.testing.assert_allclose(np.asarray(logits), want_logits.numpy(),
                               rtol=1e-3, atol=1e-4)
    # running stats updated like torch
    np.testing.assert_allclose(
        np.asarray(new_params["block0"]["bn"]["mean"]),
        tnet.discriminator_block.block1[1].running_mean.numpy(),
        rtol=1e-4, atol=1e-5)


@torch.no_grad()
def test_vgg19_parity_random_weights(rng):
    tv = pytest.importorskip("torchvision")
    tnet = tv.models.vgg19(weights=None).features.eval()
    sd = {f"features.{k}": v.numpy() for k, v in tnet.state_dict().items()}
    params = convert.convert_vgg19(sd)
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    taps = vgg19_features(params, jnp.asarray(x))
    xt = torch.from_numpy(to_nchw(x))
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    h = (xt - mean) / std
    want = []
    for i, layer in enumerate(tnet):
        h = layer(h)
        if i in (8, 17, 26, 35):
            want.append(h.numpy())
    assert len(taps) == len(want) == 4
    for g, w in zip(taps, want):
        np.testing.assert_allclose(np.asarray(g), to_nhwc(w), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("scale", [4, 2])
def test_infer_sequence_odd_sizes(rng, scale):
    """Streaming inference at LR sizes not divisible by 8 (flow padding +
    packed-carry shapes must all line up)."""
    import jax

    cfg = FRNetConfig(nf=8, nb=1, scale=scale, degradation="BD", remat=False)
    from tecogan_tpu.models.networks import init_frnet

    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = rng.random((5, 14, 22, 3)).astype(np.float32)
    out = np.asarray(infer_sequence(params, jnp.asarray(lr), cfg, chunk=3))
    assert out.shape == (5, scale * 14, scale * 22, 3)
    assert out.dtype == np.uint8
