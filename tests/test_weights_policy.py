"""Pretrained-weights policy: random-VGG training must be a hard error
unless explicitly allowed, and the LPIPS pipeline must run end-to-end with
the REAL v0.1 linear heads (the reference vendors them at
`codes/metrics/LPIPS/models/weights/v0.1/alex.pth`; only the ImageNet
AlexNet backbone is absent in this offline environment)."""

import os.path as osp

import numpy as np
import pytest
import torch

from tecogan_tpu.models.vsrgan_model import VSRGANModel

_REF_LIN = "/root/reference/codes/metrics/LPIPS/models/weights/v0.1/alex.pth"


def test_vgg_missing_weights_hard_fails(tmp_path):
    opt = {"train": {"feature_crit": {
        "type": "CosineSimilarity", "weight": 0.2,
        "weights_path": str(tmp_path / "nope.npz")}}}
    with pytest.raises(FileNotFoundError, match="convert_vgg19"):
        VSRGANModel._load_vgg(None, opt, seed=0)


def test_vgg_random_weights_escape_hatch(tmp_path):
    opt = {"train": {"feature_crit": {
        "type": "CosineSimilarity", "weight": 0.2,
        "weights_path": str(tmp_path / "nope.npz"),
        "allow_random_weights": True}}}
    params = VSRGANModel._load_vgg(None, opt, seed=0)
    assert isinstance(params, dict) and len(params) > 0


from torch_oracles import rand_alexnet_sd


def _rand_alexnet_sd(rng):
    return {k: torch.from_numpy(v) for k, v in rand_alexnet_sd(rng).items()}


@pytest.mark.skipif(not osp.exists(_REF_LIN),
                    reason="reference LPIPS lin heads not present")
def test_lpips_real_lin_heads_end_to_end(tmp_path, rng):
    """Full LPIPS pipeline with the official v0.1 lin heads (real weights)
    over a synthetic backbone: proves the checkpoint format, the converter
    and the jitted distance end-to-end modulo the ImageNet backbone."""
    from tecogan_tpu.metrics import lpips as lpips_mod

    bb_path = str(tmp_path / "alexnet.pth")
    torch.save(_rand_alexnet_sd(rng), bb_path)

    metric = lpips_mod.LPIPS(backbone_path=bb_path, lin_path=_REF_LIN)
    # the real head channel widths must match the AlexNet taps
    assert [h.shape[2] for h in metric.lin] == [64, 192, 384, 256, 256]
    assert all(h.shape[:2] == (1, 1) and h.shape[3] == 1 for h in metric.lin)
    # v0.1 heads are non-negative 1x1 convs over squared differences
    assert all(float(np.asarray(h).min()) >= 0.0 for h in metric.lin)

    a = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    b = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    assert float(metric(a, a)[0]) == pytest.approx(0.0, abs=1e-6)
    assert float(metric(a, b)[0]) > 0


@pytest.mark.skipif(not osp.exists(_REF_LIN),
                    reason="reference LPIPS lin heads not present")
def test_find_lpips_weights_locates_reference_lin_heads():
    from tecogan_tpu.metrics.lpips import find_lpips_weights

    _, lin = find_lpips_weights()
    # the skipif guarantees the reference heads exist — the locator must
    # return exactly them ('any existing file' would pass for a stale or
    # wrong pick)
    assert lin is not None and osp.samefile(lin, _REF_LIN), lin
