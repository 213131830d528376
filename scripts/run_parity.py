"""One-command published-checkpoint parity run (the BASELINE.md north star).

The day the reference's pretrained checkpoints and the Vid4/ToS3 data are
reachable, this script executes the whole parity claim verbatim:

  python scripts/run_parity.py \
      --ckpt pretrained_models/TecoGAN_BD_iter500000.pth \
      --gt_root data/Vid4/GT --degradation BD --scale 4 --model TecoGAN

It (1) builds a test config around the checkpoint (reference `.pth` loads
directly; `.npz` natives too), (2) runs the real test mode
(`tecogan_tpu/main.py`, reference surface `codes/main.py:132-207`),
(3) lays the SR frames out in the reference's `results/<DS>/<MODEL>/`
layout, (4) runs the official metric harness
(`codes/official_metrics/evaluate.py` contract: cutfr=2, crop-to-32,
Y-PSNR/SSIM, tOF, LPIPS, tLP100), and (5) prints the measured numbers
next to the reference's published benchmark row (BASELINE.md, transcribed
from `resources/benchmark.png`) with per-metric deltas.

LPIPS/tLP100 need ImageNet backbone weights + the v0.1 lin heads under
pretrained_models/lpips/ (see docs/PARITY_RUNBOOK.md); without them those
two columns are skipped with a warning, the rest still run.

Smoke-tested end to end with synthesized checkpoints and data by
tests/test_weights_rehearsal.py::test_run_parity_one_command.
"""

import argparse
import os
import os.path as osp
import shutil
import sys

import yaml

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# BASELINE.md "This repo" rows (reference's own models, benchmark.png):
# (dataset, model, degradation) -> {metric: value}
REFERENCE_ROWS = {
    ("Vid4", "FRVSR", "BD"): {"PSNR": 27.06, "LPIPS": 0.245, "tOF": 0.202,
                              "tLP100": 1.094},
    ("Vid4", "TecoGAN", "BD"): {"PSNR": 26.01, "LPIPS": 0.152, "tOF": 0.194,
                                "tLP100": 0.515},
    ("ToS3", "FRVSR", "BD"): {"PSNR": 33.78, "LPIPS": 0.136, "tOF": 0.140,
                              "tLP100": 0.496},
    ("ToS3", "TecoGAN", "BD"): {"PSNR": 33.26, "LPIPS": 0.090, "tOF": 0.136,
                                "tLP100": 0.205},
    ("Vid4", "FRVSR", "BI"): {"PSNR": 26.31, "LPIPS": 0.291, "tOF": 0.186,
                              "tLP100": 1.430},
    ("Vid4", "TecoGAN", "BI"): {"PSNR": 24.93, "LPIPS": 0.184, "tOF": 0.201,
                                "tLP100": 0.573},
    ("ToS3", "FRVSR", "BI"): {"PSNR": 33.46, "LPIPS": 0.180, "tOF": 0.146,
                              "tLP100": 0.780},
    ("ToS3", "TecoGAN", "BI"): {"PSNR": 31.79, "LPIPS": 0.122, "tOF": 0.151,
                                "tLP100": 0.640},
}


def build_test_opt(args):
    ds_key = "test1"
    dataset = {
        "degradation": ({"type": "BD", "sigma": 1.5} if args.degradation
                        == "BD" else {"type": "BI"}),
        ds_key: {"name": args.dataset, "gt_seq_dir": args.gt_root,
                 "lr_seq_dir": args.lr_root},
    }
    return {
        "scale": args.scale, "manual_seed": 0, "verbose": False,
        "dataset": dataset,
        "model": {"name": "FRVSR",  # generator-only graph for testing
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": args.nf, "nb": args.nb,
                                "load_path": args.ckpt}},
        "test": {"save_res": True, "res_dir": None, "save_json": True,
                 "json_dir": None, "padding_mode": "reflect",
                 "num_pad_front": 2},
        "metric": {"PSNR": {"colorspace": "y"}},
    }


def parse_frame_avg(csv_path):
    """Last FrameAvg_* block of the official metrics.csv -> {metric: val}."""
    lines = open(csv_path).read().strip().splitlines()
    hdr_i = max(i for i, l in enumerate(lines) if "FrameAvg_PSNR" in l)
    hdr = [h.replace("FrameAvg_", "") for h in lines[hdr_i].split(",")[1:]]
    vals = [float(v) for v in lines[hdr_i + 1].split(",")[1:]]
    return dict(zip(hdr, vals))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="generator checkpoint (.pth reference format or "
                        ".npz native)")
    p.add_argument("--gt_root", required=True,
                   help="GT root with one subdir per sequence, e.g. "
                        "data/Vid4/GT")
    p.add_argument("--lr_root", default=None,
                   help="pre-degraded LR root (required for BI; BD "
                        "degrades on the fly when omitted)")
    p.add_argument("--degradation", choices=["BD", "BI"], default="BD")
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--model", choices=["FRVSR", "TecoGAN"], default="TecoGAN",
                   help="which published baseline row to compare against "
                        "(the test graph is the generator either way)")
    p.add_argument("--dataset", default=None,
                   help="Vid4|ToS3|... (default: inferred from gt_root)")
    p.add_argument("--nf", type=int, default=64)
    p.add_argument("--nb", type=int, default=10)
    p.add_argument("--workdir", default="parity_run",
                   help="scratch dir for the exp/results/metric tree")
    args = p.parse_args(argv)

    if args.degradation == "BI" and not args.lr_root:
        raise SystemExit("--degradation BI needs --lr_root (generate with "
                         "scripts/generate_lr_bi.py)")
    if args.dataset is None:
        parent = osp.basename(osp.dirname(osp.abspath(args.gt_root)))
        args.dataset = parent or "Vid4"

    ckpt_tag = osp.splitext(osp.basename(args.ckpt))[0]
    model_tag = f"{args.model}_{args.degradation}_{ckpt_tag}"

    # 1-2. config + real test mode
    exp_dir = osp.join(args.workdir, "exp")
    os.makedirs(exp_dir, exist_ok=True)
    yml = osp.join(exp_dir, "test.yml")
    with open(yml, "w") as f:
        yaml.safe_dump(build_test_opt(args), f)

    from tecogan_tpu.main import main as teco_main

    teco_main(["--exp_dir", exp_dir, "--mode", "test", "--opt", yml,
               "--gpu_ids", "0"])

    # 3. reference results/ layout
    res_root = osp.join(exp_dir, "test", "results", args.dataset, ckpt_tag)
    if not osp.isdir(res_root):
        raise SystemExit(f"test mode produced no results under {res_root}")
    off_dir = osp.join(args.workdir, "results", args.dataset, model_tag)
    if osp.isdir(off_dir):
        shutil.rmtree(off_dir)
    os.makedirs(off_dir)
    # symlink each sequence dir instead of copying hundreds of full-res
    # PNGs byte-for-byte (off_dir itself stays real: metric_log lands here)
    for seq in sorted(os.listdir(res_root)):
        src = osp.join(res_root, seq)
        if osp.isdir(src):
            os.symlink(osp.abspath(src), osp.join(off_dir, seq))

    # 4. official metric harness (same layout contract as the reference:
    # results/<DS>/<MODEL>/ + data/<DS>/GT under one cwd)
    gt_link = osp.join(args.workdir, "data", args.dataset, "GT")
    os.makedirs(osp.dirname(gt_link), exist_ok=True)
    # recreate unconditionally: a leftover link from a previous run would
    # silently score against a STALE gt_root (and a dangling one fails
    # osp.exists yet still breaks os.symlink)
    if osp.islink(gt_link) or osp.exists(gt_link):
        if osp.isdir(gt_link) and not osp.islink(gt_link):
            raise SystemExit(
                f"{gt_link} is a real directory (expected a symlink managed "
                "by this script) — refusing to replace it")
        os.remove(gt_link)
    os.symlink(osp.abspath(args.gt_root), gt_link)

    from tecogan_tpu.official_metrics.metrics import evaluate_folders

    seqs = sorted(d for d in os.listdir(off_dir)
                  if osp.isdir(osp.join(off_dir, d)))
    evaluate_folders([osp.join(off_dir, s) for s in seqs],
                     [osp.join(gt_link, s) for s in seqs],
                     osp.join(off_dir, "metric_log"))

    # 5. side-by-side vs the published row
    got = parse_frame_avg(osp.join(off_dir, "metric_log", "metrics.csv"))
    # every published row is 4x (BASELINE.md: "All rows are 4x SR"); a 2x
    # run must not be scored against the 4x numbers
    ref = (REFERENCE_ROWS.get((args.dataset, args.model, args.degradation))
           if args.scale == 4 else None)
    print(f"\n=== {model_tag} on {args.dataset} ({len(seqs)} sequences) ===")
    if ref is None:
        print(f"(no published reference row for this dataset/model/"
              f"degradation at {args.scale}x — measured values only)")
    width = max(len(k) for k in got)
    for k, v in got.items():
        line = f"  {k:<{width}}  measured {v:8.4f}"
        if ref and k in ref:
            delta = 100.0 * (v - ref[k]) / ref[k]
            line += f"   reference {ref[k]:8.4f}   delta {delta:+6.2f}%"
        print(line)
    if ref and "tOF" in got:
        ok = abs(got["tOF"] - ref["tOF"]) <= 0.01 * ref["tOF"]
        print(f"  north-star tOF within 1%: {'YES' if ok else 'NO'}")
    print(f"  full CSV: {osp.join(off_dir, 'metric_log', 'metrics.csv')}")


if __name__ == "__main__":
    main()
