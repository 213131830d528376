"""Benchmark evaluation entry (reference contract:
`codes/official_metrics/evaluate.py`): maps a model name to the Vid4/ToS3
result/GT directory lists and runs the metric harness.

Usage: python -m tecogan_tpu.official_metrics.evaluate -m TecoGAN_BD_iter500000
"""

from __future__ import annotations

import argparse
import os.path as osp

from .metrics import evaluate_folders

VID4_SEQS = ["calendar", "city", "foliage", "walk"]
TOS3_SEQS = ["bridge", "face", "room"]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", "-m", type=str, required=True)
    args = p.parse_args(argv)

    keys = args.model.split("_")
    if len(keys) < 2 or keys[0] not in ("TecoGAN", "FRVSR") \
            or keys[1] not in ("BD", "BI"):
        raise SystemExit(
            f"model must be named (TecoGAN|FRVSR)_(BD|BI)_*, got "
            f"{args.model!r}")

    evaluated = 0
    for ds, seqs in (("Vid4", VID4_SEQS), ("ToS3", TOS3_SEQS)):
        gt_dir = f"data/{ds}/GT"
        sr_dir = f"results/{ds}/{args.model}"
        if not osp.exists(sr_dir):
            continue
        evaluate_folders(
            [osp.join(sr_dir, s) for s in seqs],
            [osp.join(gt_dir, s) for s in seqs],
            osp.join(sr_dir, "metric_log"),
        )
        evaluated += 1
    if not evaluated:
        # exiting 0 with no output on a typo'd model name reads as a
        # passing evaluation
        raise SystemExit(
            f"no results found under results/Vid4/{args.model} or "
            f"results/ToS3/{args.model} — check the model name and cwd")


if __name__ == "__main__":
    main()
