"""Offline BD (Gaussian blur + stride downsample) LR generation.

Replaces `scripts/resize_bd.py` of the reference: uses the SAME separable
operator-matrix degradation as the jitted training step (ops/degrade.py), so
offline LR data is bit-identical to the on-the-fly path — the reference ships
two subtly different implementations and warns about it (`resize_bd.py:13-19`).

Usage:
  python scripts/resize_bd.py --gt_dir data/Vid4/GT \
      --lr_dir data/Vid4/Gaussian4xLR --scale 4 --sigma 1.5
"""

import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--lr_dir", required=True)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--sigma", type=float, default=1.5)
    args = p.parse_args()

    import jax.numpy as jnp

    from tecogan_tpu.data.datasets import _read_seq
    from tecogan_tpu.ops import downsample_bd, float32_to_uint8, save_sequence

    for seq in sorted(os.listdir(args.gt_dir)):
        seq_dir = osp.join(args.gt_dir, seq)
        if not osp.isdir(seq_dir):
            continue
        gt = _read_seq(seq_dir, as_float=True)  # (t, h, w, c) float32
        lr = np.asarray(downsample_bd(
            jnp.asarray(gt), args.scale, sigma=args.sigma, pad_data=True))
        # frame names from the SAME lister that _read_seq used (recursive,
        # case-insensitive, png+jpg) — a bare .png listdir would desync
        # names from frames for .jpg/.PNG sources
        from tecogan_tpu.utils.paths import retrieve_files

        frm_idx = [osp.basename(p) for p in retrieve_files(seq_dir)]
        save_sequence(osp.join(args.lr_dir, seq), float32_to_uint8(lr),
                      frm_idx, to_bgr=True)
        print(f"{seq}: {gt.shape} -> {lr.shape}")


if __name__ == "__main__":
    main()
