"""Training monitor: parse train.log loss lines + validation JSONs, plot
convergence curves (counterpart of the reference's
`scripts/monitor_training.py`; the log-line format it parses is preserved
by tecogan_tpu.utils.logging_utils.format_train_msg).

Usage:
  python scripts/monitor_training.py -m TecoGAN -d BD \
      -e TecoGAN_VimeoTecoGAN_4xSR_2GPU [--testset Vid4]
"""

import argparse
import json
import os.path as osp
import re

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_LINE = re.compile(
    r"\[epoch:\s*(\d+)\s*\|\s*iter:\s*(\d+)(?:\s*\|\s*[^]]*)?\]\s*(.*)")
_KV = re.compile(r"([\w]+):\s*([-+0-9.eE]+)")


def parse_log(path):
    series = {}
    with open(path) as f:
        for line in f:
            m = _LINE.search(line)
            if not m:
                continue
            it = int(m.group(2))
            for k, v in _KV.findall(m.group(3)):
                series.setdefault(k, []).append((it, float(v)))
    return series


def parse_metrics_json(path):
    with open(path) as f:
        j = json.load(f)
    out = {}
    for model_idx, metrics in j.items():
        it = int(model_idx.replace("G_iter", ""))
        for m, v in metrics.items():
            out.setdefault(m, []).append((it, float(v)))
    for m in out:
        out[m].sort()
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", "-m", required=True)
    p.add_argument("--degradation", "-d", required=True)
    p.add_argument("--exp", "-e", required=True)
    p.add_argument("--testset", default="Vid4")
    args = p.parse_args()

    exp_dir = osp.join(f"experiments_{args.degradation}", args.model,
                       args.exp)
    log_path = osp.join(exp_dir, "train", "train.log")
    json_path = osp.join(exp_dir, "test", "metrics",
                         f"{args.testset}_avg.json")

    panels = []
    if osp.exists(log_path):
        panels.append(("losses", parse_log(log_path)))
    if osp.exists(json_path):
        panels.append(("metrics", parse_metrics_json(json_path)))
    if not panels:
        raise SystemExit(f"nothing to plot under {exp_dir}")

    n = sum(len(s) for _, s in panels)
    cols = 3
    rows = -(-n // cols)
    fig, axes = plt.subplots(rows, cols, figsize=(5 * cols, 3.2 * rows),
                             squeeze=False)
    i = 0
    for _, series in panels:
        for name, pts in series.items():
            ax = axes[i // cols][i % cols]
            xs, ys = zip(*pts)
            ax.plot(xs, ys)
            ax.set_title(name)
            ax.set_xlabel("iteration")
            ax.grid(alpha=0.3)
            i += 1
    for j in range(i, rows * cols):
        axes[j // cols][j % cols].axis("off")
    out = osp.join(exp_dir, "monitor.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
