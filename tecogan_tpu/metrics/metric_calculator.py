"""Training/validation metric calculator (PSNR / SSIM / LPIPS / tOF).

Behavioural counterpart of `codes/metrics/metric_calculator.py`:
per-frame metrics -> per-sequence means -> dataset average, JSON persistence
keyed by model index. Protocols match the reference exactly:

- PSNR on RGB or Y (DUF/BasicSR YCbCr transform), float64, 20*log10(255/RMSE)
- tOF: mean end-point error between Farneback flows (OpenCV, host-side) of
  consecutive GT vs SR frames, computed on grayscale
- LPIPS: net-lin/alex v0.1 (gated on weight availability)
- SSIM on Y (extension; the official harness computes it too)

Single-controller JAX runs all sequences in one process, so the reference's
`dist.reduce` gather (`metric_calculator.py:99-102`) is unnecessary; when
sequences are round-robined across processes in multi-host mode the caller
merges dicts instead.
"""

from __future__ import annotations

import json
import os.path as osp
import re

import cv2
import numpy as np

from ..ops import rgb_to_ycbcr
from ..utils.logging_utils import log_info
from .ssim import ssim

__all__ = ["MetricCalculator", "create_metric_calculator"]

_FARNEBACK = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                  poly_n=5, poly_sigma=1.2, flags=0)


def create_metric_calculator(opt):
    if "metric" in opt and opt["metric"] is not None:
        return MetricCalculator(opt)
    return None


_KNOWN_METRICS = ("PSNR", "SSIM", "LPIPS", "tOF")


class MetricCalculator:
    def __init__(self, opt):
        # a key with an empty YAML body ("metric:\n  PSNR:") parses to
        # None — normalise to {} so the .get(...) defaults below apply
        # instead of an AttributeError on NoneType
        self.metric_opt = {k: (v or {}) for k, v in opt["metric"].items()}
        unknown = [m for m in self.metric_opt if m not in _KNOWN_METRICS]
        if unknown:
            # a typo'd/unsupported key would otherwise collect no frames
            # and silently turn the dataset average into NaN (tLP100 is
            # an official_metrics-only column)
            raise ValueError(
                f"unsupported metric(s) {unknown}; supported here: "
                f"{list(_KNOWN_METRICS)}")
        self.psnr_colorspace = self.metric_opt.get(
            "PSNR", {}).get("colorspace", "y")
        self.lpips = None
        if "LPIPS" in self.metric_opt:
            from .lpips import LPIPS

            try:
                self.lpips = LPIPS(
                    net=self.metric_opt["LPIPS"].get("net", "alex"),
                    spatial=self.metric_opt["LPIPS"].get("spatial", False))
            except (FileNotFoundError, ImportError) as e:
                # weights unavailable (offline env) or torch absent for a
                # .pth load: skip LPIPS, keep the rest of the metric stack
                # functional
                log_info(f"WARNING: LPIPS disabled — {e}")
                self.metric_opt = {k: v for k, v in self.metric_opt.items()
                                   if k != "LPIPS"}
        self.reset()

    def reset(self):
        self.metric_dict = {}
        self.avg_metric_dict = {}

    # ------------------------------------------------------------- sequences
    def compute_sequence_metrics(self, seq_idx, true_seq, pred_seq):
        """true/pred: (t, h, w, c) uint8 RGB."""
        per_frame = {m: [] for m in self.metric_opt}
        prev = None
        for i in range(true_seq.shape[0]):
            t_img, p_img = true_seq[i], pred_seq[i]
            # crop the larger to the smaller if sizes differ
            mh = min(t_img.shape[0], p_img.shape[0])
            mw = min(t_img.shape[1], p_img.shape[1])
            t_img, p_img = t_img[:mh, :mw], p_img[:mh, :mw]
            cur_gray = None  # per-frame gray cache for tOF
            cur_y = None  # per-frame Y cache shared by PSNR(y) and SSIM

            def luma_pair():
                nonlocal cur_y
                if cur_y is None:
                    cur_y = (
                        rgb_to_ycbcr(t_img)[..., 0].astype(np.float64),
                        rgb_to_ycbcr(p_img)[..., 0].astype(np.float64))
                return cur_y

            for mtype in self.metric_opt:
                if mtype == "PSNR":
                    pair = ((t_img, p_img)
                            if self.psnr_colorspace == "rgb"
                            else luma_pair())
                    per_frame["PSNR"].append(self._psnr(*pair))
                elif mtype == "SSIM":
                    per_frame["SSIM"].append(self._ssim(*luma_pair()))
                elif mtype == "LPIPS":
                    v = self.lpips(t_img, p_img)[0]
                    # the reference logs element [0,0,0,0] unconditionally
                    # (`metric_calculator.py:219`) — the scalar when
                    # spatial=false, the TOP-LEFT map pixel when spatial
                    # (its quirk, mirrored for parity); full maps are
                    # available via LPIPS(spatial=True) directly
                    per_frame["LPIPS"].append(
                        float(v if v.ndim == 0 else v[0, 0]))
                elif mtype == "tOF" and prev is not None:
                    if cur_gray is None:
                        cur_gray = (
                            cv2.cvtColor(t_img, cv2.COLOR_RGB2GRAY),
                            cv2.cvtColor(p_img, cv2.COLOR_RGB2GRAY))
                    per_frame["tOF"].append(
                        self._tof(prev[0], cur_gray[0],
                                  prev[1], cur_gray[1]))
            if "tOF" in self.metric_opt:
                if cur_gray is None:
                    cur_gray = (cv2.cvtColor(t_img, cv2.COLOR_RGB2GRAY),
                                cv2.cvtColor(p_img, cv2.COLOR_RGB2GRAY))
                prev = cur_gray
        self.metric_dict[seq_idx] = per_frame

    @staticmethod
    def _psnr(a, b):
        rmse = np.sqrt(np.mean(
            (a.astype(np.float64) - b.astype(np.float64)) ** 2))
        return np.inf if rmse == 0 else 20 * np.log10(255.0 / rmse)

    @staticmethod
    def _ssim(a, b):
        return ssim(a, b, data_range=255.0)

    @staticmethod
    def _tof(t_prev_g, t_cur_g, p_prev_g, p_cur_g):
        """EPE between GT and SR Farneback flows; args are GRAYSCALE frames
        (the caller caches each frame's gray conversion so every frame is
        converted once, not twice)."""
        true_of = cv2.calcOpticalFlowFarneback(t_prev_g, t_cur_g, None,
                                               **_FARNEBACK)
        pred_of = cv2.calcOpticalFlowFarneback(p_prev_g, p_cur_g, None,
                                               **_FARNEBACK)
        d = true_of - pred_of
        return float(np.mean(np.sqrt(np.sum(d * d, axis=-1))))

    # --------------------------------------------------------------- results
    def gather(self, seq_idx_lst):
        for seq_idx in seq_idx_lst:
            if seq_idx not in self.metric_dict:
                continue
            self.avg_metric_dict[seq_idx] = {
                m: float(np.mean(v)) if v else float("nan")
                for m, v in self.metric_dict[seq_idx].items()
            }

    def merge(self, other_avg_dicts):
        """Merge avg dicts gathered by other processes (multi-host)."""
        for d in other_avg_dicts:
            self.avg_metric_dict.update(d)

    def average(self):
        """Dataset average per metric. Sequences whose series was empty
        (tOF needs >=2 frames) carry NaN from gather(); they are excluded
        from the average instead of poisoning it — matching how the
        official harness sums only non-empty series."""
        out = {}
        for m in self.metric_opt:
            vals = [seq[m] for seq in self.avg_metric_dict.values()
                    if not np.isnan(seq[m])]
            out[m] = float(np.mean(vals)) if vals else float("nan")
        return out

    def display(self):
        for seq_idx, md in self.avg_metric_dict.items():
            log_info(f"Sequence: {seq_idx}")
            for m, v in md.items():
                log_info(f"\t{m}: {v:.6f}")
        log_info("Average")
        for m, v in self.average().items():
            log_info(f"\t{m}: {v:.6f}")

    def save(self, model_idx, save_path, override=False):
        import os

        os.makedirs(osp.dirname(save_path) or ".", exist_ok=True)
        json_dict = {}
        if osp.exists(save_path):
            with open(save_path) as f:
                json_dict = json.load(f)
        entry = json_dict.setdefault(model_idx, {})
        for m, v in self.average().items():
            if m in entry and not override:
                continue
            entry[m] = f"{v:.6f}"
        # numeric sort for *_iter<N> keys; arbitrary checkpoint names
        # (e.g. 'G', 'TecoGAN_4x', 'v2_best') sort lexically after them —
        # concatenating ALL digits would order 'v2_G_iter100' as 2100
        def sort_key(kv):
            m = re.search(r"iter(\d+)", kv[0])
            return (0, int(m.group(1)), kv[0]) if m else (1, 0, kv[0])

        json_dict = dict(sorted(json_dict.items(), key=sort_key))
        with open(save_path, "w") as f:
            json.dump(json_dict, f, sort_keys=False, indent=4)
