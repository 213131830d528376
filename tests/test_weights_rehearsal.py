"""Full-pipeline pretrained-weights dress rehearsal.

The real pretrained artefacts (ImageNet VGG19/AlexNet, published FRNet
`G_iter*.pth` generators) cannot be downloaded in this environment, so the
moment they appear the whole chain must work first try. This test
synthesises torch checkpoints in the EXACT reference formats, converts
them via the documented CLIs, drops them into the documented search paths,
then runs the REAL test mode (`tecogan_tpu/main.py`) and the official
metric harness (`official_metrics/evaluate.py`) and asserts a
`metrics.csv` with all five columns (PSNR/SSIM/LPIPS/tOF/tLP100) finite.

Reference surfaces: `codes/official_metrics/evaluate.py:26-45`,
`codes/official_metrics/metrics.py:114-204`, `codes/main.py:132-207`.
"""

import os
import os.path as osp
import shutil
import subprocess
import sys

import cv2
import numpy as np
import pandas as pd
import pytest
import torch
import yaml

from torch_oracles import TorchFRNet, rand_alexnet_sd, rand_vgg19_sd

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
_CONVERT = osp.join(_REPO, "scripts", "convert_checkpoint.py")
_REF_LIN = "/root/reference/codes/metrics/LPIPS/models/weights/v0.1/alex.pth"


def _run_cli(args):
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, timeout=300,
                       env={**os.environ, "JAX_PLATFORM_NAME": "cpu"})
    assert r.returncode == 0, f"{args}\nstdout:{r.stdout}\nstderr:{r.stderr}"
    return r


@pytest.mark.skipif(not osp.exists(_REF_LIN),
                    reason="reference LPIPS lin heads not present")
def test_pth_to_five_column_csv_dress_rehearsal(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)

    # --- 1. synthesize torch checkpoints in reference formats -------------
    ckpt_dir = tmp_path / "torch_ckpt"
    ckpt_dir.mkdir()
    net = TorchFRNet(nf=8, nb=2, scale=4)
    torch.save(net.state_dict(), str(ckpt_dir / "G_iter2.pth"))
    torch.save({k: torch.from_numpy(v)
                for k, v in rand_vgg19_sd(rng).items()},
               str(ckpt_dir / "vgg19.pth"))

    # AlexNet backbone + the REAL v0.1 lin heads into the documented
    # LPIPS search path (relative to cwd; see find_lpips_weights)
    lp_dir = tmp_path / "pretrained_models" / "lpips"
    lp_dir.mkdir(parents=True)
    torch.save({k: torch.from_numpy(v)
                for k, v in rand_alexnet_sd(rng).items()},
               str(lp_dir / "alexnet.pth"))
    shutil.copy(_REF_LIN, str(lp_dir / "alex.pth"))

    # --- 2. convert via the documented CLIs -------------------------------
    _run_cli([_CONVERT, "--src", str(ckpt_dir / "G_iter2.pth"),
              "--dst", str(tmp_path / "G_iter2.npz"),
              "--kind", "frnet", "--nb", "2", "--scale", "4"])
    _run_cli([_CONVERT, "--src", str(ckpt_dir / "vgg19.pth"),
              "--dst", str(tmp_path / "pretrained_models" / "vgg19.npz"),
              "--kind", "vgg19"])

    # converted VGG19 loads through the training-side search path
    from tecogan_tpu.models.vsrgan_model import VSRGANModel

    vgg_params = VSRGANModel._load_vgg(None, {"train": {"feature_crit": {
        "type": "CosineSimilarity", "weight": 0.2,
        "weights_path": str(tmp_path / "pretrained_models" / "vgg19.npz"),
    }}}, seed=0)
    assert "conv0" in vgg_params and vgg_params["conv0"]["w"].shape == (
        3, 3, 3, 64)

    # --- 3. GT data + real test mode (on-the-fly BD LR) -------------------
    gt_root = tmp_path / "data" / "Vid4" / "GT"
    seq_dir = gt_root / "calendar"
    seq_dir.mkdir(parents=True)
    base = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    for i in range(8):
        cv2.imwrite(str(seq_dir / f"{i:04d}.png"),
                    np.roll(base, i * 2, axis=1)[..., ::-1])

    exp_dir = tmp_path / "exp"
    exp_dir.mkdir()
    opt = {
        "scale": 4, "manual_seed": 0, "verbose": False,
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "test1": {"name": "Vid4", "gt_seq_dir": str(gt_root)},
        },
        "model": {"name": "FRVSR",
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": 8, "nb": 2,
                                "load_path": str(tmp_path / "G_iter2.npz")}},
        "test": {"save_res": True, "res_dir": None, "save_json": True,
                 "json_dir": None, "padding_mode": "reflect",
                 "num_pad_front": 2},
        # internal validation stack with LPIPS enabled: the backbone +
        # lin heads dropped above must be found via the search path
        "metric": {"PSNR": {"colorspace": "y"}, "SSIM": {},
                   "LPIPS": {"model": "net-lin", "net": "alex"},
                   "tOF": {"colorspace": "y"}},
    }
    with open(exp_dir / "test.yml", "w") as f:
        yaml.safe_dump(opt, f)

    from tecogan_tpu.main import main

    main(["--exp_dir", str(exp_dir), "--mode", "test",
          "--opt", str(exp_dir / "test.yml"), "--gpu_ids", "0"])

    res_seq = exp_dir / "test" / "results" / "Vid4" / "G_iter2" / "calendar"
    assert len(os.listdir(res_seq)) == 8

    # the internal JSON must carry a finite LPIPS value (weights found)
    import json

    with open(exp_dir / "test" / "metrics" / "Vid4_avg.json") as f:
        j = json.load(f)
    assert set(j["G_iter2"]) == {"PSNR", "SSIM", "LPIPS", "tOF"}
    assert np.isfinite(float(j["G_iter2"]["LPIPS"]))

    # --- 4. official evaluate entry against the reference dir layout ------
    off_dir = tmp_path / "results" / "Vid4" / "FRVSR_BD_iter2"
    off_dir.mkdir(parents=True)
    shutil.copytree(str(res_seq), str(off_dir / "calendar"))

    from tecogan_tpu.official_metrics.evaluate import main as eval_main

    eval_main(["-m", "FRVSR_BD_iter2"])

    csv_path = off_dir / "metric_log" / "metrics.csv"
    assert csv_path.exists()
    text = csv_path.read_text()
    for col in ("PSNR", "SSIM", "LPIPS", "tOF", "tLP100"):
        assert f"FrameAvg_{col}" in text, f"missing column {col}"
    # parse the FrameAvg block (last appended CSV section) and check finite
    lines = text.strip().splitlines()
    hdr_i = max(i for i, l in enumerate(lines) if "FrameAvg_PSNR" in l)
    hdr = lines[hdr_i].split(",")[1:]
    vals = [float(v) for v in lines[hdr_i + 1].split(",")[1:]]
    frame_avg = dict(zip(hdr, vals))
    for col in ("PSNR", "SSIM", "LPIPS", "tOF", "tLP100"):
        assert np.isfinite(frame_avg[f"FrameAvg_{col}"]), frame_avg
    # 8 frames, cutfr=2 -> 4 scored frames; tOF/tLP100 need a previous
    # frame -> 3 samples each; sanity-bound the values
    assert 0.0 < frame_avg["FrameAvg_LPIPS"]
    assert 0.0 <= frame_avg["FrameAvg_tLP100"]
    assert frame_avg["FrameAvg_PSNR"] > 5.0


@pytest.mark.skipif(not osp.exists(_REF_LIN),
                    reason="reference LPIPS lin heads not present")
def test_run_parity_one_command(tmp_path, rng, monkeypatch):
    """The documented one-command parity runbook (docs/PARITY_RUNBOOK.md,
    scripts/run_parity.py): synthesized reference-format checkpoint +
    GT tree in, measured-vs-published comparison table out. The day real
    weights/data are reachable this exact command executes the BASELINE.md
    north-star claim."""
    monkeypatch.chdir(tmp_path)

    net = TorchFRNet(nf=8, nb=2, scale=4)
    torch.save(net.state_dict(), str(tmp_path / "G_iter2.pth"))

    # LPIPS weights into the documented search path -> all five columns
    lp_dir = tmp_path / "pretrained_models" / "lpips"
    lp_dir.mkdir(parents=True)
    torch.save({k: torch.from_numpy(v)
                for k, v in rand_alexnet_sd(rng).items()},
               str(lp_dir / "alexnet.pth"))
    shutil.copy(_REF_LIN, str(lp_dir / "alex.pth"))

    gt_root = tmp_path / "data" / "Vid4" / "GT"
    for seq in ("calendar", "city"):
        seq_dir = gt_root / seq
        seq_dir.mkdir(parents=True)
        base = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
        for i in range(8):
            cv2.imwrite(str(seq_dir / f"{i:04d}.png"),
                        np.roll(base, i * 2, axis=1)[..., ::-1])

    sys.path.insert(0, osp.join(_REPO, "scripts"))
    try:
        import run_parity
    finally:
        sys.path.pop(0)

    run_parity.main(["--ckpt", str(tmp_path / "G_iter2.pth"),
                     "--gt_root", str(gt_root),
                     "--degradation", "BD", "--scale", "4",
                     "--model", "FRVSR", "--nf", "8", "--nb", "2",
                     "--workdir", str(tmp_path / "parity_run")])

    csv_path = (tmp_path / "parity_run" / "results" / "Vid4" /
                "FRVSR_BD_G_iter2" / "metric_log" / "metrics.csv")
    assert csv_path.exists()
    frame_avg = run_parity.parse_frame_avg(str(csv_path))
    for col in ("PSNR", "SSIM", "LPIPS", "tOF", "tLP100"):
        assert np.isfinite(frame_avg[col]), frame_avg
