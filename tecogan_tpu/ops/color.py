"""Colour-space and dtype conversions (host-side numpy, metric-grade).

Behavioural equivalents of `codes/utils/data_utils.py:56-111`. These run on
the host (they feed the metric stack and PNG IO), so they use float64 for
bit-exact parity with the reference metric protocol.
"""

from __future__ import annotations

import os
import os.path as osp

import cv2
import numpy as np

__all__ = ["rgb_to_ycbcr", "float32_to_uint8", "save_sequence"]

# ITU-R BT.601 "studio swing" matrix as used by DUF-VSR / BasicSR
# (`data_utils.py:65-71`): columns produce Y, Cb, Cr from RGB in [0, 255].
_YCBCR_T = np.array(
    [
        [0.256788235294118, -0.148223529411765, 0.439215686274510],
        [0.504129411764706, -0.290992156862745, -0.367788235294118],
        [0.097905882352941, 0.439215686274510, -0.071427450980392],
    ],
    dtype=np.float64,
)
_YCBCR_O = np.array([16.0, 128.0, 128.0], dtype=np.float64)


def rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """uint8 RGB (..., 3) -> uint8 YCbCr (..., 3)."""
    res = img.astype(np.float64) @ _YCBCR_T + _YCBCR_O
    return res.clip(0, 255).round().astype(np.uint8)


def float32_to_uint8(x: np.ndarray) -> np.ndarray:
    """float array in [0, 1] -> uint8 in [0, 255] (round-clip)."""
    return np.uint8(np.clip(np.round(x * 255.0), 0, 255))


def save_sequence(seq_dir, seq_data, frm_idx_lst=None, to_bgr=False):
    """Write a (t, h, w, c) uint8 sequence as PNG frames under ``seq_dir``."""
    if to_bgr:
        seq_data = seq_data[..., ::-1]
    if frm_idx_lst is None:
        frm_idx_lst = ["{:04d}.png".format(i) for i in range(len(seq_data))]
    os.makedirs(seq_dir, exist_ok=True)
    for i in range(len(seq_data)):
        cv2.imwrite(osp.join(seq_dir, frm_idx_lst[i]), seq_data[i])
