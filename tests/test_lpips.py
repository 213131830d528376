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
