"""LPIPS port: AlexNet trunk parity vs torch functional ops, lin-head
loading, and metric sanity (zero self-distance, positivity)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tecogan_tpu.metrics import lpips as lpips_mod


from torch_oracles import rand_alexnet_sd as _rand_alexnet_sd


def _torch_alexnet_features(sd, x):
    """torch-functional oracle for the tapped AlexNet trunk."""
    taps = []
    h = x
    convs = [(0, 4, 2, True), (3, 1, 2, True), (6, 1, 1, False),
             (8, 1, 1, False), (10, 1, 1, True)]
    for i, stride, pad, pool in convs:
        h = F.conv2d(h, torch.from_numpy(sd[f"features.{i}.weight"]),
                     torch.from_numpy(sd[f"features.{i}.bias"]),
                     stride=stride, padding=pad)
        h = F.relu(h)
        taps.append(h.numpy())
        if pool:
            h = F.max_pool2d(h, 3, 2)
    return taps


@torch.no_grad()
def test_alexnet_trunk_parity(rng):
    sd = _rand_alexnet_sd(rng)
    params = lpips_mod.convert_alexnet(sd)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    got = lpips_mod.alexnet_features(params, jnp.asarray(x))
    want = _torch_alexnet_features(sd, torch.from_numpy(
        np.moveaxis(x, -1, 1)))
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.moveaxis(w, 1, -1),
                                   rtol=1e-3, atol=1e-4)


def test_lpips_metric_properties(tmp_path, rng):
    # synthesize weight files in the expected formats
    bb_path = str(tmp_path / "alexnet.pth")
    lin_path = str(tmp_path / "alex.pth")
    sd = {k: torch.from_numpy(v) for k, v in _rand_alexnet_sd(rng).items()}
    torch.save(sd, bb_path)
    lin = {f"lin{i}.model.1.weight":
           torch.rand(1, ch, 1, 1) * 0.1
           for i, ch in enumerate([64, 192, 384, 256, 256])}
    torch.save(lin, lin_path)

    metric = lpips_mod.LPIPS(backbone_path=bb_path, lin_path=lin_path)
    a = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    b = (rng.random((32, 32, 3)) * 255).astype(np.uint8)

    assert float(metric(a, a)[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(metric(a, b)[0]) > 0

    # batched input
    d = metric(np.stack([a, a]), np.stack([a, b]))
    assert d.shape == (2,)
    assert d[0] == pytest.approx(0.0, abs=1e-6) and d[1] > 0


def test_lpips_raises_without_weights(tmp_path, monkeypatch):
    monkeypatch.setattr(lpips_mod, "find_lpips_weights",
                        lambda *a, **k: (None, None))
    with pytest.raises(FileNotFoundError):
        lpips_mod.LPIPS()


def _torch_vgg16_features(sd, x):
    """torch-functional oracle for the LPIPS vgg16 trunk: 13 pad-1 convs
    in blocks of (2,2,3,3,3), 2x2 maxpool between blocks, tap after the
    last ReLU of each block (`pretrained_networks.py` vgg16 slices)."""
    taps = []
    h = x
    idx = 0
    for bi, n_convs in enumerate([2, 2, 3, 3, 3]):
        if bi:
            h = F.max_pool2d(h, 2, 2)
            idx += 1
        for _ in range(n_convs):
            h = F.relu(F.conv2d(
                h, torch.from_numpy(sd[f"features.{idx}.weight"]),
                torch.from_numpy(sd[f"features.{idx}.bias"]), padding=1))
            idx += 2
        taps.append(h.numpy())
    return taps


def _torch_fire(sd, i, x):
    s = F.relu(F.conv2d(
        x, torch.from_numpy(sd[f"features.{i}.squeeze.weight"]),
        torch.from_numpy(sd[f"features.{i}.squeeze.bias"])))
    e1 = F.relu(F.conv2d(
        s, torch.from_numpy(sd[f"features.{i}.expand1x1.weight"]),
        torch.from_numpy(sd[f"features.{i}.expand1x1.bias"])))
    e3 = F.relu(F.conv2d(
        s, torch.from_numpy(sd[f"features.{i}.expand3x3.weight"]),
        torch.from_numpy(sd[f"features.{i}.expand3x3.bias"]), padding=1))
    return torch.cat([e1, e3], dim=1)


def _torch_squeezenet_features(sd, x):
    """torch-functional oracle for the LPIPS squeeze trunk
    (`pretrained_networks.py` squeezenet, torchvision squeezenet1_1:
    ceil_mode pools)."""
    taps = []
    h = F.relu(F.conv2d(x, torch.from_numpy(sd["features.0.weight"]),
                        torch.from_numpy(sd["features.0.bias"]), stride=2))
    taps.append(h.numpy())
    h = F.max_pool2d(h, 3, 2, ceil_mode=True)
    h = _torch_fire(sd, 4, _torch_fire(sd, 3, h))
    taps.append(h.numpy())
    h = F.max_pool2d(h, 3, 2, ceil_mode=True)
    h = _torch_fire(sd, 7, _torch_fire(sd, 6, h))
    taps.append(h.numpy())
    h = F.max_pool2d(h, 3, 2, ceil_mode=True)
    for i in (9, 10, 11, 12):
        h = _torch_fire(sd, i, h)
        taps.append(h.numpy())
    return taps


@torch.no_grad()
def test_vgg16_trunk_parity(rng):
    from torch_oracles import rand_vgg16_sd

    sd = rand_vgg16_sd(rng)
    params = lpips_mod.convert_vgg16(sd)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    got = lpips_mod.vgg16_features(params, jnp.asarray(x))
    want = _torch_vgg16_features(sd, torch.from_numpy(np.moveaxis(x, -1, 1)))
    assert len(got) == len(want) == 5
    assert [g.shape[-1] for g in got] == [64, 128, 256, 512, 512]
    for g, w in zip(got, want):
        w = np.moveaxis(w, 1, -1)
        # random 0.05-scale weights amplify activations ~10x per block, so
        # absolute fp32 accumulation noise grows with the tap magnitude;
        # scale atol accordingly (measured CPU maxabs is ~2e-6 x scale)
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-3,
                                   atol=1e-5 * max(1.0, np.abs(w).max()))


@torch.no_grad()
@pytest.mark.parametrize("size", [(64, 64), (63, 49)])
def test_squeezenet_trunk_parity(rng, size):
    """Odd sizes exercise the ceil_mode maxpool emulation (torchvision
    squeezenet1_1 pools are ceil_mode=True; a floor-mode port silently
    drops the last row/col at odd intermediate sizes)."""
    from torch_oracles import rand_squeezenet_sd

    sd = rand_squeezenet_sd(rng)
    params = lpips_mod.convert_squeezenet(sd)
    h, w = size
    x = rng.random((1, h, w, 3)).astype(np.float32)
    got = lpips_mod.squeezenet_features(params, jnp.asarray(x))
    want = _torch_squeezenet_features(
        sd, torch.from_numpy(np.moveaxis(x, -1, 1)))
    assert len(got) == len(want) == 7
    assert [g.shape[-1] for g in got] == [64, 128, 256, 384, 384, 512, 512]
    for g, w_ in zip(got, want):
        w_ = np.moveaxis(w_, 1, -1)
        np.testing.assert_allclose(np.asarray(g), w_, rtol=1e-3,
                                   atol=1e-5 * max(1.0, np.abs(w_).max()))


@pytest.mark.parametrize("net,maker,conv,chans", [
    ("vgg", "rand_vgg16_sd", "convert_vgg16", [64, 128, 256, 512, 512]),
    ("vgg16", "rand_vgg16_sd", "convert_vgg16", [64, 128, 256, 512, 512]),
    ("squeeze", "rand_squeezenet_sd", "convert_squeezenet",
     [64, 128, 256, 384, 384, 512, 512]),
])
def test_lpips_all_backbones_construct_and_score(tmp_path, rng, net, maker,
                                                 conv, chans):
    """LPIPS(net='vgg'|'vgg16'|'squeeze') end to end with synthesized
    torchvision-format backbones + v0.1-format lin heads (VERDICT r3
    next-step #5)."""
    import torch_oracles

    stem = {"vgg": "vgg16", "vgg16": "vgg16",
            "squeeze": "squeezenet1_1"}[net]
    bb_path = str(tmp_path / f"{stem}.pth")
    lin_path = str(tmp_path / "lin.pth")
    sd = {k: torch.from_numpy(v)
          for k, v in getattr(torch_oracles, maker)(rng).items()}
    torch.save(sd, bb_path)
    lin = {f"lin{i}.model.1.weight": torch.rand(1, ch, 1, 1) * 0.1
           for i, ch in enumerate(chans)}
    torch.save(lin, lin_path)

    metric = lpips_mod.LPIPS(net=net, backbone_path=bb_path,
                             lin_path=lin_path)
    a = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    b = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
    assert float(metric(a, a)[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(metric(a, b)[0]) > 0


def test_lpips_wrong_lin_heads_for_backbone_rejected(tmp_path, rng):
    """alex-shaped lin heads against net='vgg' must fail loudly, not
    produce garbage distances."""
    from torch_oracles import rand_vgg16_sd

    bb_path = str(tmp_path / "vgg16.pth")
    lin_path = str(tmp_path / "alex.pth")
    sd = {k: torch.from_numpy(v) for k, v in rand_vgg16_sd(rng).items()}
    torch.save(sd, bb_path)
    lin = {f"lin{i}.model.1.weight": torch.rand(1, ch, 1, 1)
           for i, ch in enumerate([64, 192, 384, 256, 256])}
    torch.save(lin, lin_path)
    with pytest.raises(ValueError, match="wrong checkpoint"):
        lpips_mod.LPIPS(net="vgg", backbone_path=bb_path, lin_path=lin_path)


def test_lpips_unknown_backbone_rejected():
    with pytest.raises(ValueError, match="unknown LPIPS backbone"):
        lpips_mod.LPIPS(net="resnet")


def test_reference_vendored_lin_heads_discoverable():
    """The reference tree vendors all three v0.1 lin-head checkpoints;
    find_lpips_weights must locate the right one per net."""
    import os.path as osp

    for net, stem in (("alex", "alex"), ("vgg", "vgg"),
                      ("squeeze", "squeeze")):
        _, lin = lpips_mod.find_lpips_weights(net=net)
        if lin is None:
            pytest.skip("reference vendored weights not present")
        assert osp.basename(lin) == f"{stem}.pth"


@torch.no_grad()
def test_lpips_spatial_mode_matches_torch_oracle(tmp_path, rng):
    """spatial=True: per-pixel LPIPS maps — each stage's 1x1-head map
    bilinearly upsampled (align_corners=False) to the input size and
    summed (`networks_basic.py:75-78` + `upsample` at `:20-24`), checked
    against a torch-functional oracle at random weights."""
    bb_path = str(tmp_path / "alexnet.pth")
    lin_path = str(tmp_path / "alex.pth")
    sd_np = _rand_alexnet_sd(rng)
    torch.save({k: torch.from_numpy(v) for k, v in sd_np.items()}, bb_path)
    g = torch.Generator().manual_seed(3)
    lin = {f"lin{i}.model.1.weight": torch.rand(1, ch, 1, 1, generator=g) * 0.1
           for i, ch in enumerate([64, 192, 384, 256, 256])}
    torch.save(lin, lin_path)

    metric = lpips_mod.LPIPS(backbone_path=bb_path, lin_path=lin_path,
                             spatial=True)
    h, w = 64, 96  # stage maps 15x23/7x11/3x5 -> fractional upsampling
    a = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    b = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    got = metric(a, b)
    assert got.shape == (1, h, w)

    # torch oracle
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]
    to_t = lambda im: torch.from_numpy(
        np.moveaxis(im.astype(np.float32), -1, 0)[None] * (2. / 255.) - 1.)
    fx = _torch_alexnet_features(sd_np, (to_t(a) - shift) / scale)
    fy = _torch_alexnet_features(sd_np, (to_t(b) - shift) / scale)
    want = torch.zeros(1, 1, h, w)
    for i, (tx, ty) in enumerate(zip(fx, fy)):
        tx, ty = torch.from_numpy(tx), torch.from_numpy(ty)
        nx = tx / torch.sqrt((tx * tx).sum(1, keepdim=True) + 1e-10)
        ny = ty / torch.sqrt((ty * ty).sum(1, keepdim=True) + 1e-10)
        val = F.conv2d((nx - ny) ** 2, lin[f"lin{i}.model.1.weight"])
        sf = (float(h) / val.shape[2], float(w) / val.shape[3])
        want = want + torch.nn.Upsample(
            scale_factor=sf, mode="bilinear", align_corners=False)(val)
    np.testing.assert_allclose(got[0], want[0, 0].numpy(),
                               rtol=2e-4, atol=2e-5)

    # map pixels average to the same scale as the non-spatial distance
    flat = lpips_mod.LPIPS(backbone_path=bb_path, lin_path=lin_path)
    assert float(np.abs(got.mean() - flat(a, b)[0])) < 0.2 * float(
        flat(a, b)[0]) + 1e-4
