"""Aggregate a captured xplane trace into coarse component buckets.

Companion to `trace_report.py` (which prints the per-op table): this sums
SELF time (envelope minus enclosed children) over all ops, grouped by
component-identifying patterns in the HLO text, so a step's time budget can
be read at a glance. Buckets are tuned for the TecoGAN GAN step at the
reference geometry (batch 4 x 10 frames x 128^2 GT, ping-pong 19 frames):
the 76/40/152-image batches are the VGG19 perceptual-loss batches, 24/48
are the discriminator triplet batches, and the checkpoint/remat/jvp
custom-calls are the warp-VJP + rematerialisation envelopes.

Usage: python scripts/trace_agg.py /tmp/tecogan_trace_*  [n_runs]
"""

import glob
import os.path as osp
import re
import sys

BUCKETS = [
    ("vgg19 fwd+bwd", r"\[76,|\[40,|\[152,|select-and-scatter"),
    ("warp-vjp + remat envelopes",
     r"checkpoint|rematted|closed_call|jvp|_unknown_"),
    ("discriminator", r"\[24,|\[48,128,128"),
    ("seq-stacked (outside scan)", r"\[4,19,|\[19,4|\[4,9,|\[4,10,"),
    ("copies", r"^%(copy|bitcast|copy-done|copy-start)"),
]


def self_times(trace_dir):
    """[(full_hlo_text, self_ps)] over every XLA op event in the trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(osp.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    rows = []
    for plane in xspace.planes:
        if "/device:TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(line.events,
                         key=lambda e: (e.offset_ps, -e.duration_ps))
            stack = []  # [end_ps, [child_total_ps], name, duration_ps]
            for ev in evs:
                start, dur = ev.offset_ps, ev.duration_ps
                while stack and start >= stack[-1][0]:
                    fin = stack.pop()
                    rows.append((fin[2], fin[3] - fin[1][0]))
                if stack:
                    stack[-1][1][0] += dur
                stack.append([start + dur, [0],
                              md[ev.metadata_id].name, dur])
            while stack:
                fin = stack.pop()
                rows.append((fin[2], fin[3] - fin[1][0]))
    return rows


def main():
    trace_dir = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    rows = self_times(trace_dir)
    agg, example = {}, {}
    for name, ps in rows:
        for label, pat in BUCKETS:
            if re.search(pat, name):
                break
        else:
            label = "rest"
        agg[label] = agg.get(label, 0) + ps
        if ps > example.get(label, (0, ""))[0]:
            example[label] = (ps, name[:110])
    total = sum(agg.values())
    for label, ps in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{ps / n_runs / 1e9:8.2f} ms/run {100 * ps / total:5.1f}%  "
              f"{label}")
        print(f"           e.g. {example[label][1]}")
    print(f"{total / n_runs / 1e9:8.2f} ms/run TOTAL")


if __name__ == "__main__":
    main()
