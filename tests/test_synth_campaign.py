"""Unit coverage for the synthetic campaign tooling
(scripts/run_synth_campaign.py): clip synthesis properties and the
generated config's compatibility with the real config/data layers."""

import importlib.util
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def campaign():
    spec = importlib.util.spec_from_file_location(
        "run_synth_campaign", osp.join(REPO, "scripts",
                                       "run_synth_campaign.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["run_synth_campaign"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_synth_clip_shape_dtype_motion(campaign):
    rng = np.random.default_rng(0)
    clip = campaign.synth_clip(rng, t=6, h=64, w=80)
    assert clip.shape == (6, 64, 80, 3) and clip.dtype == np.uint8
    # frames actually move: consecutive frames differ substantially but
    # are correlated (smooth textures, bounded velocity)
    d01 = np.abs(clip[1].astype(np.int32) - clip[0].astype(np.int32)).mean()
    d05 = np.abs(clip[5].astype(np.int32) - clip[0].astype(np.int32)).mean()
    assert d01 > 0.5, "no temporal change"
    assert d05 > d01, "motion should accumulate over frames"
    # determinism: same seed -> same clip
    clip2 = campaign.synth_clip(np.random.default_rng(0), t=6, h=64, w=80)
    np.testing.assert_array_equal(clip, clip2)


def test_campaign_config_feeds_real_loader(campaign, tmp_path):
    """The generated train opt drives the REAL dataset/loader factory."""
    wd = str(tmp_path)
    campaign.stage_data(wd, n_train=2, t_train=6, hw_train=(72, 72),
                        n_test=1, t_test=6, hw_test=(64, 64))
    model = {"name": "FRVSR",
             "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                           "nf": 8, "nb": 2}}
    train = {"generator": {"lr": 1e-4,
                           "lr_schedule": {"type": "FixedLR"},
                           "betas": [0.9, 0.999]}}
    opt = campaign._base_opt(wd, model, train, total_iter=2, test_freq=2,
                             ckpt_freq=2, crop=32, tempo=3)

    from tecogan_tpu.data import create_dataloader

    loader = create_dataloader(opt, "train", "train", n_devices=1)
    batch = next(iter(loader))
    # BD crop enlargement: 32 + 2*int(3*1.5) = 40
    assert batch["gt"].shape == (4, 3, 40, 40, 3)
    assert batch["gt"].dtype == np.uint8


def test_campaign_bi_config_feeds_real_loader(campaign, tmp_path):
    """The BI leg writes paired GT+LR records whose generated opt drives
    the REAL paired dataset/loader factory with scale-locked shapes."""
    wd = str(tmp_path)
    campaign.stage_data(wd, n_train=2, t_train=6, hw_train=(72, 72),
                        n_test=1, t_test=6, hw_test=(64, 64),
                        degradation="BI")
    assert osp.exists(osp.join(wd, "data", "LR.rec", "index.json"))
    assert osp.exists(osp.join(wd, "data", "test_LR", "held00",
                               "0000.png"))
    model = {"name": "FRVSR",
             "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                           "nf": 8, "nb": 2}}
    train = {"generator": {"lr": 1e-4,
                           "lr_schedule": {"type": "FixedLR"},
                           "betas": [0.9, 0.999]}}
    opt = campaign._base_opt(wd, model, train, total_iter=2, test_freq=2,
                             ckpt_freq=2, crop=32, tempo=3,
                             degradation="BI")

    from tecogan_tpu.data import create_dataloader

    loader = create_dataloader(opt, "train", "train", n_devices=1)
    batch = next(iter(loader))
    # paired: no BD crop enlargement; LR locked to gt_crop/scale
    assert batch["gt"].shape == (4, 3, 32, 32, 3)
    assert batch["lr"].shape == (4, 3, 8, 8, 3)
    assert batch["gt"].dtype == np.uint8


def test_official_metrics_summary_parsing(campaign):
    """Exercise the SCRIPT'S parser (campaign.METRIC_LINE_RE), not a local
    copy: a harness format / regex edit must break this test."""
    pat = campaign.METRIC_LINE_RE
    m = pat.match("PSNR, total frame 104, total avg 27.0613, "
                  "folder avg 27.0598")
    assert m and m.group(1) == "PSNR" and int(m.group(2)) == 104
    assert float(m.group(3)) == 27.0613 and float(m.group(4)) == 27.0598
    # 'nan' summaries parse; malformed separators must NOT match (the old
    # '[+-e]' class was a character range that swallowed ,/:;<A-Z)
    m2 = pat.match("tOF, total frame 100, total avg nan, folder avg nan")
    assert m2 and m2.group(3) == "nan"
    assert pat.match(
        "PSNR, total frame 104, total avg 27:06;13, folder avg 1") is None


def test_twin_artifacts_consistent():
    """bf16-vs-fp32 training twin (round-4 verdict next-step #2): the
    committed artifacts must agree with the documented claim — SSIM/tOF
    at parity, the (honest-negative) PSNR delta recorded faithfully, and
    both validation curves monotone over the schedule. Ran on hardware
    via `scripts/run_synth_campaign.py --precision {mixed,fp32}`;
    reference analogue: pure-fp32 training throughout
    (`/root/reference/codes/models/base_model.py`)."""
    import json
    import os.path as osp

    root = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "docs", "campaign")
    curves = {}
    for p in ("bf16", "fp32"):
        d = json.load(open(osp.join(root, f"twin_{p}_validation.json")))
        iters = sorted(int(k[len("G_iter"):]) for k in d)
        assert iters == list(range(500, 4001, 500))
        curves[p] = [
            {m: float(v) for m, v in d[f"G_iter{i}"].items()}
            for i in iters
        ]
        # curves improve over the schedule: strict front-to-back gains,
        # and no late-stage collapse (each half-schedule point beats the
        # first)
        psnr = [pt["PSNR"] for pt in curves[p]]
        tof = [pt["tOF"] for pt in curves[p]]
        assert psnr[-1] > psnr[0] + 2.0, psnr
        assert all(v > psnr[0] for v in psnr[4:]), psnr
        assert tof[-1] < tof[0] * 0.6, tof

    summary = json.load(open(osp.join(root, "twin_summary.json")))
    h_b, h_f = curves["bf16"][-1], curves["fp32"][-1]
    for m in ("PSNR", "SSIM", "tOF"):
        assert summary["bf16"][m] == h_b[m]
        assert summary["fp32"][m] == h_f[m]
        assert summary["delta_bf16_minus_fp32"][m] == round(
            h_b[m] - h_f[m], 6)
    # the committed quality bounds: SSIM/tOF parity, PSNR honest negative
    assert abs(h_b["SSIM"] - h_f["SSIM"]) < 1e-3
    assert abs(h_b["tOF"] - h_f["tOF"]) / h_f["tOF"] < 0.01
    assert 0.0 < h_f["PSNR"] - h_b["PSNR"] < 0.6  # documented −0.44 dB
