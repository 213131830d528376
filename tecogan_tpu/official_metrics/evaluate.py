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
    assert keys[0] in ("TecoGAN", "FRVSR"), "model must be TecoGAN_* or FRVSR_*"
    assert keys[1] in ("BD", "BI"), "degradation must be BD or BI"

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


if __name__ == "__main__":
    main()
