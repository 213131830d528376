"""Offline BI (Matlab-compatible antialiased bicubic) LR generation.

Replaces the reference's Matlab script (`scripts/generate_lr_bi.m`) with the
pure-Python/JAX Matlab-imresize implementation in ops/degrade.py. Like the
original, GT frames are modcropped to a multiple of the scale first, and an
optional re-upsampled "BIx{s}" set is written for visual comparison.

Usage:
  python scripts/generate_lr_bi.py --gt_dir data/Vid4/GT \
      --lr_dir data/Vid4/Bicubic4xLR --scale 4 [--up_dir data/Vid4/BI4x]
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--lr_dir", required=True)
    p.add_argument("--up_dir", default=None)
    p.add_argument("--scale", type=int, default=4)
    args = p.parse_args()

    from tecogan_tpu.data.datasets import _read_seq
    from tecogan_tpu.ops import float32_to_uint8, imresize_matlab, save_sequence

    s = args.scale
    for seq in sorted(os.listdir(args.gt_dir)):
        seq_dir = osp.join(args.gt_dir, seq)
        if not osp.isdir(seq_dir):
            continue
        gt = _read_seq(seq_dir, as_float=True)
        h, w = gt.shape[1] // s * s, gt.shape[2] // s * s
        gt = gt[:, :h, :w]  # modcrop
        lr = imresize_matlab(gt, scale=1.0 / s)
        # same lister as _read_seq so names and frames stay aligned
        from tecogan_tpu.utils.paths import retrieve_files

        frm_idx = [osp.basename(p) for p in retrieve_files(seq_dir)]
        save_sequence(osp.join(args.lr_dir, seq), float32_to_uint8(lr),
                      frm_idx, to_bgr=True)
        if args.up_dir:
            up = imresize_matlab(np.clip(lr, 0, 1), scale=float(s))
            save_sequence(osp.join(args.up_dir, seq), float32_to_uint8(up),
                          frm_idx, to_bgr=True)
        print(f"{seq}: {gt.shape} -> {lr.shape}")


if __name__ == "__main__":
    main()
