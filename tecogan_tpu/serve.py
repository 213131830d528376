"""Serving host: PNG sequences in -> SR PNG sequences out, driven purely
by an AOT artifact (+ its npz sidecar), no model code retraced.

    python -m tecogan_tpu.serve model.tecosrv <in_dir> <out_dir> \
        [--ckpt G_iterN.npz] [--pad_front 5] [--padding_mode reflect]

``in_dir`` is either one sequence (a directory of PNG frames) or a
directory of sequence sub-directories, mirroring the folder-dataset
layout the test mode consumes. Frames must match the artifact's LR
geometry (h, w); sequences shorter than the artifact's fixed ``t`` are
tail-padded on device input and trimmed on output (the recurrence is
causal, so earlier frames are bit-identical to an exact-length export).

Weights come from the artifact itself when it was exported with embedded
params (the default of ``scripts/export_serving.py``), or from ``--ckpt``
(same pytree structure — the traced program pins it).

``--pad_front`` reproduces the test mode's recurrent warm-up
(reflect/replicate pre-roll, `/root/reference/codes/models/base_model.py:230-251`
semantics); padded frames are trimmed from the output.

The reference's only deployment story is re-running its test entrypoint,
rebuilding the full torch graph per process
(`/root/reference/codes/main.py:132-207`); this host needs only this
module + the artifact file.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _list_frames(d):
    return sorted(f for f in os.listdir(d)
                  if f.lower().endswith(IMG_EXTS))


def discover_sequences(in_dir: str):
    """-> list of (name, dir, [frame filenames]). One-sequence dirs keep
    their basename as the sequence name."""
    if not osp.isdir(in_dir):
        raise FileNotFoundError(f"input directory not found: {in_dir}")
    direct = _list_frames(in_dir)
    seqs = []
    for name in sorted(os.listdir(in_dir)):
        sub = osp.join(in_dir, name)
        if osp.isdir(sub):
            frames = _list_frames(sub)
            if frames:
                seqs.append((name, sub, frames))
    if direct and seqs:
        # ambiguous layout: refusing beats silently serving only the loose
        # frames (a stray thumbnail would shadow every real sequence) or
        # only the sub-directories (dropping frames the user can see)
        raise ValueError(
            f"{in_dir} holds both loose image frames ({direct[0]}, ...) and "
            f"sequence sub-directories ({seqs[0][0]}, ...); point --in_dir "
            f"at one sequence directory or remove the stray images")
    if direct:
        return [(osp.basename(osp.normpath(in_dir)), in_dir, direct)]
    if not seqs:
        raise FileNotFoundError(
            f"no image frames (or sequence sub-directories with frames) "
            f"under {in_dir}")
    return seqs


def _read_sequence(seq_dir, frames, h, w, name):
    import cv2

    out = np.empty((len(frames), h, w, 3), np.float32)
    for i, fn in enumerate(frames):
        img = cv2.imread(osp.join(seq_dir, fn), cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"failed to read {osp.join(seq_dir, fn)}")
        if img.shape[:2] != (h, w):
            raise ValueError(
                f"sequence {name!r} frame {fn}: shape {img.shape[:2]} does "
                f"not match the artifact's LR geometry ({h}, {w}); export "
                f"an artifact for this geometry")
        out[i] = img[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
    return out


def _pad_to_t(seq, t, pad_front, mode):
    """Front pre-roll (reflect/replicate) + edge tail padding to the
    artifact's fixed t. -> (padded (t, h, w, 3), n_front)."""
    t_seq = len(seq)
    if pad_front >= t_seq:
        # same contract as test mode (models/base.py pad_sequence asserts
        # n_pad < sequence length) — a silent clamp would serve outputs
        # that differ from `--mode test` with no warning
        raise ValueError(
            f"--pad_front {pad_front} needs at least {pad_front + 1} "
            f"frames but the sequence has {t_seq}; lower --pad_front")
    n_front = pad_front
    if n_front:
        if mode == "reflect":
            front = seq[1:1 + n_front][::-1]
        elif mode == "replicate":
            front = np.broadcast_to(seq[:1], (n_front,) + seq.shape[1:])
        else:
            raise ValueError(f"unrecognized padding mode: {mode}")
        seq = np.concatenate([front, seq], axis=0)
    if len(seq) > t:
        raise ValueError(
            f"sequence of {t_seq} frames (+{n_front} pre-roll) exceeds the "
            f"artifact's fixed t={t}; re-export with --frames >= "
            f"{t_seq + n_front} (or lower --pad_front)")
    if len(seq) < t:
        tail = np.broadcast_to(seq[-1:], (t - len(seq),) + seq.shape[1:])
        seq = np.concatenate([seq, tail], axis=0)
    return seq, n_front


def serve(artifact: str, in_dir: str, out_dir: str, ckpt: str | None = None,
          pad_front: int = 0, padding_mode: str = "reflect",
          quiet: bool = False):
    """Run every sequence under ``in_dir`` through the artifact; write SR
    PNG frames (input basenames preserved, extension forced to .png —
    jpeg/bmp inputs are read fine but outputs are never lossy) under
    ``out_dir``/<seq>/."""
    from .ops import save_sequence
    from .serving import load_artifact

    run, meta, params = load_artifact(artifact)
    missing = [k for k in ("n", "t", "h", "w") if k not in meta]
    if missing:
        raise ValueError(
            f"artifact sidecar lacks geometry keys {missing}; re-export "
            f"with scripts/export_serving.py")
    n, t, h, w = (int(meta[k]) for k in ("n", "t", "h", "w"))

    if ckpt is not None:
        from .utils.ckpt import load_generator_params

        params = load_generator_params(ckpt, nb=int(meta.get("nb", 10)),
                                       scale=int(meta.get("scale", 4)))
    if params is None:
        raise ValueError(
            f"{artifact} has no embedded weights; pass --ckpt (the "
            f"exporter embeds weights unless --no_embed_params was given)")

    seqs = discover_sequences(in_dir)
    log = (lambda *a: None) if quiet else print
    log(f"[serve] {len(seqs)} sequence(s); artifact geometry "
        f"n={n} t={t} lr={h}x{w} scale={meta.get('scale', '?')}")

    import cv2  # noqa: F401  (fail early, before device work)

    for g0 in range(0, len(seqs), n):
        group = seqs[g0:g0 + n]
        batch = np.empty((n, t, h, w, 3), np.float32)
        fronts, lens = [], []
        for i in range(n):
            if i >= len(group):
                # filler slot for a partial last group: duplicate the last
                # real row (its SR output is discarded) instead of
                # re-reading the sequence from disk
                batch[i] = batch[len(group) - 1]
                continue
            name, sdir, frames = group[i]
            seq = _read_sequence(sdir, frames, h, w, name)
            padded, n_front = _pad_to_t(seq, t, pad_front, padding_mode)
            batch[i] = padded
            fronts.append(n_front)
            lens.append(len(seq))
        sr = np.asarray(run(params, batch))  # uint8 (n, t, sh, sw, 3)
        for i, (name, _sdir, frames) in enumerate(group):
            out_seq = sr[i, fronts[i]:fronts[i] + lens[i]]
            out_names = [osp.splitext(f)[0] + ".png" for f in frames]
            save_sequence(osp.join(out_dir, name), out_seq,
                          frm_idx_lst=out_names, to_bgr=True)
            log(f"[serve] {name}: {lens[i]} frames -> "
                f"{osp.join(out_dir, name)}")


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m tecogan_tpu.serve",
        description="SR PNG sequences from an AOT serving artifact")
    ap.add_argument("artifact", help=".tecosrv file from export_serving.py")
    ap.add_argument("in_dir", help="LR frames dir, or dir of sequence dirs")
    ap.add_argument("out_dir")
    ap.add_argument("--ckpt", default=None,
                    help="generator checkpoint overriding embedded weights")
    ap.add_argument("--pad_front", type=int, default=0,
                    help="recurrent warm-up pre-roll frames (test mode "
                         "uses 5); trimmed from the output")
    ap.add_argument("--padding_mode", default="reflect",
                    choices=["reflect", "replicate"])
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args(argv)
    serve(args.artifact, args.in_dir, args.out_dir, ckpt=args.ckpt,
          pad_front=args.pad_front, padding_mode=args.padding_mode,
          quiet=args.quiet)


if __name__ == "__main__":
    sys.exit(main())
