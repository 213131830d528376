"""Publication-grade metric harness (TecoGAN protocol).

A from-scratch implementation of the evaluation protocol of the reference's
`codes/official_metrics/metrics.py` (itself derived from TecoGAN-TF):

- first/last ``cutfr=2`` frames of each sequence are skipped;
- images are centre-cropped to 32-multiples with >=16px margin ("crop_8x8");
- PSNR & SSIM on the Y channel of the DUF-style YCbCr transform (float,
  not re-quantised); SSIM uses data_range = Y_pred.max() - Y_pred.min();
- tOF = mean end-point error between Farneback flows of consecutive GT vs
  SR frames (grayscale, flows cropped);
- LPIPS (net-lin/alex v0.1) and tLP100 = 100*|LPIPS(gt_prev,gt) -
  LPIPS(sr_prev,sr)| — skipped with a warning if weights are unavailable;
- CSV output: per-folder frame series, then Avg / FolderAvg / FrameAvg rows.

CLI: python -m tecogan_tpu.official_metrics.metrics
         --output DIR --results d1,d2 --targets t1,t2
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import cv2
import numpy as np
import pandas as pd

from ..metrics.ssim import ssim as ssim_fn

_CUTFR = 2
# shared with the training-time metric stack so the two tOF columns can
# never silently desynchronise on flow parameters
from ..metrics.metric_calculator import _FARNEBACK  # noqa: E402

# DUF-style RGB->YCbCr (float output, no rounding)
_T = np.array([
    [0.256788235294118, 0.504129411764706, 0.097905882352941],
    [-0.148223529411765, -0.290992156862745, 0.439215686274510],
    [0.439215686274510, -0.367788235294118, -0.071427450980392],
], dtype=np.float64)
_O = np.array([16.0, 128.0, 128.0])


def _luma(img_uint8_rgb):
    f = img_uint8_rgb.astype(np.float64)
    return f @ _T.T[:, 0] + _O[0]


def list_png(dirpath):
    files = [f for f in os.listdir(dirpath)
             if f.endswith(".png") and not f.startswith("IB")]
    files.sort()
    files.sort(key=lambda f: int("".join(filter(str.isdigit, f)) or -1))
    return [osp.join(dirpath, f) for f in files]


def crop_32(img):
    """Centre crop to 32-multiples, keeping >=16px margin per side."""
    oh, ow = img.shape[0], img.shape[1]
    h = (oh // 32) * 32
    w = (ow // 32) * 32
    while h > oh - 16:
        h -= 32
    while w > ow - 16:
        w -= 32
    if h <= 0 or w <= 0:
        # any dim < 48 px leaves no 32-multiple inside the margins; an
        # empty crop would emit NaN metrics with only a numpy warning
        raise ValueError(
            f"image {oh}x{ow} too small for the official protocol "
            f"(crop to 32-multiples with 16 px margins needs >=48 px "
            f"per side)")
    y, x = (oh - h) // 2, (ow - w) // 2
    return img[y:y + h, x:x + w], y, x


def _psnr_luma(yt, yo):
    d = yt - yo
    rmse = np.sqrt(np.mean(d * d))
    return float("inf") if rmse == 0 else 20 * np.log10(255.0 / rmse)


def psnr_y(tar, out):
    return _psnr_luma(_luma(tar), _luma(out))


def ssim_y(tar, out):
    yt, yo = _luma(tar), _luma(out)
    return ssim_fn(yt, yo, data_range=yo.max() - yo.min())


def _pair_frames(outs, tars, rdir, tdir):
    """Pair result/target frame paths. Equal-length lists pair by sorted
    order (names may legitimately differ between pipelines); unequal
    lengths pair by matching basenames — index-zipping a common prefix
    would silently compare WRONG frame pairs whenever the missing frames
    are not a trailing suffix (e.g. a result dir lacking frame 0000)."""
    if len(outs) == len(tars):
        return outs, tars
    o_names = {osp.basename(p): p for p in outs}
    t_names = {osp.basename(p): p for p in tars}
    common = [n for n in sorted(o_names) if n in t_names]
    # preserve the numeric list_png ordering for the common names
    common.sort(key=lambda f: int("".join(filter(str.isdigit, f)) or -1))
    if not common:
        raise SystemExit(
            f"{rdir} has {len(outs)} frames but {tdir} has {len(tars)} and "
            f"no basenames match — refusing to guess an alignment")
    dropped = (sorted(set(o_names) - set(common))
               + sorted(set(t_names) - set(common)))
    print(f"WARNING: {rdir} has {len(outs)} frames but {tdir} has "
          f"{len(tars)}; scoring the {len(common)} basename-matched pairs "
          f"(unmatched: {', '.join(dropped[:5])}"
          f"{', ...' if len(dropped) > 5 else ''})")
    return [o_names[n] for n in common], [t_names[n] for n in common]


def _try_lpips():
    try:
        from ..metrics.lpips import LPIPS

        return LPIPS()
    except (FileNotFoundError, ImportError) as e:
        # ImportError: weights present but torch (used only to decode the
        # .pth files) is absent — degrade to the torch-free metrics, same
        # as metric_calculator does
        print(f"WARNING: LPIPS/tLP100 disabled — {e}")
        return None


def _expand_seq_dirs(result_dirs, target_dirs):
    """Accept either per-sequence PNG dirs (the reference contract,
    `evaluate.py:26-45`) or PARENT dirs of sequence subdirs: when EITHER
    side of a pair has no PNGs directly, matching subdirectory names are
    expanded pairwise — passing parents used to silently evaluate
    0 frames. Pairs that end up frameless on either side are dropped with
    a warning instead of silently producing NaN rows."""
    r_out, t_out = [], []
    for rdir, tdir in zip(result_dirs, target_dirs):
        if not osp.isdir(rdir) or not osp.isdir(tdir):
            print(f"WARNING: skipping non-existent dir pair: {rdir} vs "
                  f"{tdir}")
            continue
        if list_png(rdir) and list_png(tdir):
            r_out.append(rdir)
            t_out.append(tdir)
            continue
        # per-sequence results against a parent target dir: match the
        # result dir's own name inside the target parent
        t_by_name = osp.join(tdir, osp.basename(osp.normpath(rdir)))
        if list_png(rdir) and osp.isdir(t_by_name) and list_png(t_by_name):
            r_out.append(rdir)
            t_out.append(t_by_name)
            continue
        subs = sorted(d for d in os.listdir(rdir)
                      if osp.isdir(osp.join(rdir, d)))
        matched = [d for d in subs if osp.isdir(osp.join(tdir, d))]
        expanded = [(osp.join(rdir, d), osp.join(tdir, d)) for d in matched
                    if list_png(osp.join(rdir, d))
                    and list_png(osp.join(tdir, d))]
        if not expanded:
            print(f"WARNING: no scorable PNG sequences in {rdir} vs {tdir} "
                  "(need PNGs directly in both dirs, or matching sequence "
                  "subdirs containing them)")
            continue
        for r, t in expanded:
            r_out.append(r)
            t_out.append(t)
    return r_out, t_out


def _read_rgb(path):
    img = cv2.imread(path)
    if img is None:
        raise IOError(f"unreadable or corrupt image: {path}")
    return img[:, :, ::-1]


def evaluate_folders(result_dirs, target_dirs, output_dir):
    os.makedirs(output_dir, exist_ok=True)
    if len(result_dirs) != len(target_dirs):
        # zip would silently drop the surplus dirs and report a
        # "complete" evaluation over a subset
        raise SystemExit(
            f"--results has {len(result_dirs)} dirs but --targets has "
            f"{len(target_dirs)}; the lists pair positionally")
    result_dirs, target_dirs = _expand_seq_dirs(result_dirs, target_dirs)
    if not result_dirs:
        # appending Avg rows of 0.0 to a (possibly stale) metrics.csv
        # would read as a successful zero-score evaluation
        raise SystemExit(
            "no scorable sequence pairs — nothing was evaluated")
    lpips = _try_lpips()
    keys = ["PSNR", "SSIM", "tOF"] + (["LPIPS", "tLP100"] if lpips else [])

    sum_d = {k: 0.0 for k in keys}
    len_d = {k: 0 for k in keys}
    folder_d = {k: 0.0 for k in keys}
    folder_n = {k: 0 for k in keys}
    avg_rows = {k: [] for k in keys}

    log_path = osp.join(output_dir, "metricsfile.txt")
    csv_path = osp.join(output_dir, "metrics.csv")
    log = open(log_path, "a")

    for fi, (rdir, tdir) in enumerate(zip(result_dirs, target_dirs)):
        outs, tars = _pair_frames(list_png(rdir), list_png(tdir), rdir, tdir)
        n = len(outs)
        series = {k: [] for k in keys}
        pre = {}

        for i in range(_CUTFR, n - _CUTFR):
            out = _read_rgb(outs[i])
            tar = _read_rgb(tars[i])
            mh = min(out.shape[0], tar.shape[0])
            mw = min(out.shape[1], tar.shape[1])
            out, tar = out[:mh, :mw], tar[:mh, :mw]

            out_g = cv2.cvtColor(out, cv2.COLOR_RGB2GRAY)
            tar_g = cv2.cvtColor(tar, cv2.COLOR_RGB2GRAY)
            if i > _CUTFR:
                t_of = cv2.calcOpticalFlowFarneback(
                    pre["tar_g"], tar_g, None, **_FARNEBACK)
                o_of = cv2.calcOpticalFlowFarneback(
                    pre["out_g"], out_g, None, **_FARNEBACK)
                t_of, _, _ = crop_32(t_of)
                o_of, _, _ = crop_32(o_of)
                d = t_of - o_of
                series["tOF"].append(
                    float(np.mean(np.sqrt(np.sum(d * d, -1)))))
            pre["tar_g"], pre["out_g"] = tar_g, out_g

            tar_c, _, _ = crop_32(tar)
            out_c, _, _ = crop_32(out)
            yt, yo = _luma(tar_c), _luma(out_c)  # shared by PSNR + SSIM
            series["PSNR"].append(_psnr_luma(yt, yo))
            series["SSIM"].append(ssim_fn(yt, yo,
                                          data_range=yo.max() - yo.min()))

            if lpips:
                d01 = float(lpips(tar_c, out_c)[0])
                series["LPIPS"].append(d01)
                if i > _CUTFR:
                    d0t = float(lpips(pre["tar_c"], tar_c)[0])
                    d1t = float(lpips(pre["out_c"], out_c)[0])
                    series["tLP100"].append(abs(d0t - d1t) * 100.0)
                pre["tar_c"], pre["out_c"] = tar_c, out_c

        pd_dict = {}
        for k in keys:
            arr = np.float32(series[k])
            pd_dict[f"{k}_{fi:02d}"] = pd.Series(arr)
            mean = float(arr.mean()) if len(arr) else float("nan")
            avg_rows[k].append(mean)
            if len(arr):  # empty series (too-short sequence) must not
                sum_d[k] += float(arr.sum())  # poison the NaN-free sums
                len_d[k] += len(arr)
                folder_d[k] += mean
                folder_n[k] += 1
        pd.DataFrame(pd_dict).to_csv(csv_path, mode="w" if fi == 0 else "a")
        log.write(f"folder {fi}: {rdir}\n")

    if all(len_d[k] == 0 for k in keys):
        # every sequence was too short for the cutfr=2 protocol — a
        # summary (and CSV rows) of 0.0 would read as a real zero-score
        # evaluation, the same failure class the no-pairs guard refuses
        raise SystemExit(
            "no frames were scorable (every sequence has <= "
            f"{2 * _CUTFR} frames; the protocol skips cutfr={_CUTFR} "
            "at each end) — nothing was evaluated")

    summary = {}
    for k in keys:
        frame_avg = sum_d[k] / max(len_d[k], 1)
        folder_avg = folder_d[k] / max(folder_n[k], 1)
        summary[k] = (len_d[k], frame_avg, folder_avg)
        msg = (f"{k}, total frame {len_d[k]}, total avg {frame_avg:02.4f}, "
               f"folder avg {folder_avg:02.4f}")
        print(msg)
        log.write(msg + "\n")

    pd.DataFrame({f"Avg_{k}": pd.Series(np.float32(avg_rows[k]))
                  for k in keys}).to_csv(csv_path, mode="a")
    pd.DataFrame({f"FolderAvg_{k}": pd.Series([summary[k][2]])
                  for k in keys}).to_csv(csv_path, mode="a")
    pd.DataFrame({f"FrameAvg_{k}": pd.Series([summary[k][1]])
                  for k in keys}).to_csv(csv_path, mode="a")
    log.close()
    print("Finished.")
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output", required=True)
    p.add_argument("--results", required=True)
    p.add_argument("--targets", required=True)
    args = p.parse_args(argv)
    evaluate_folders(args.results.split(","), args.targets.split(","),
                     args.output)


if __name__ == "__main__":
    main()
