"""Build a TecoRecords store (or check one) from a PNG sequence tree.

Replaces the reference's LMDB builder (`scripts/create_lmdb.py`): the output
is the mmap-friendly flat-blob format in tecogan_tpu/data/records.py, which
the training loader (and the native C++ prefetcher) read zero-copy.

Usage:
  python scripts/create_records.py --dataset VimeoTecoGAN \
      --raw_dir data/VimeoTecoGAN/Raw --out_dir data/VimeoTecoGAN/GT.lmdb
  python scripts/create_records.py --check --out_dir data/.../GT.lmdb
"""

import argparse
import os
import os.path as osp
import random
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tecogan_tpu.data.records import RecordStore, RecordWriter, make_key  # noqa: E402


def _iter_sequences(raw_dir, filter_file=None):
    seqs = sorted(os.listdir(raw_dir))
    if filter_file:
        with open(filter_file) as f:
            sel = {line.strip() for line in f if line.strip()}
        seqs = [s for s in seqs if s in sel]
    for si, seq in enumerate(seqs):
        seq_dir = osp.join(raw_dir, seq)
        frames = []
        for fname in sorted(os.listdir(seq_dir)):
            if not fname.lower().endswith((".png", ".jpg")):
                continue
            img = cv2.imread(osp.join(seq_dir, fname))
            if img is None:  # cv2 returns None for unreadable files
                raise IOError(f"unreadable or corrupt image: "
                              f"{osp.join(seq_dir, fname)}")
            frames.append(img[..., ::-1])
        if frames:
            yield si, len(seqs), seq, np.ascontiguousarray(np.stack(frames))


def build(raw_dir, out_dir, filter_file=None):
    writer = RecordWriter(out_dir)
    for si, n, seq, frames in _iter_sequences(raw_dir, filter_file):
        writer.add_sequence(seq, frames)
        print(f"[{si + 1}/{n}] {seq}: {len(frames)} frames")
    writer.close()
    print(f"wrote {out_dir}")


def build_lmdb(raw_dir, out_dir, filter_file=None, map_gb=200):
    """Write a reference-format LMDB (`scripts/create_lmdb.py:13-139`):
    RGB uint8 frames under keys ``{seq}_{T}x{H}x{W}_{i:04d}`` plus a
    ``meta_info.pkl`` with name + keys. Readable by data.records.LMDBStore
    and by the reference's datasets. Requires the ``lmdb`` package."""
    import pickle

    import lmdb

    os.makedirs(out_dir, exist_ok=True)
    env = lmdb.open(out_dir, map_size=int(map_gb * 2 ** 30))
    all_keys = []
    for si, n, seq, frames in _iter_sequences(raw_dir, filter_file):
        t, h, w, _ = frames.shape
        with env.begin(write=True) as txn:
            for i in range(t):
                key = make_key(seq, t, h, w, i)
                txn.put(key.encode("ascii"),
                        np.ascontiguousarray(frames[i]).tobytes())
                all_keys.append(key)
        print(f"[{si + 1}/{n}] {seq}: {t} frames")
    env.close()
    meta = {"name": osp.basename(out_dir.rstrip("/")), "keys": all_keys}
    with open(osp.join(out_dir, "meta_info.pkl"), "wb") as f:
        pickle.dump(meta, f)
    print(f"wrote LMDB {out_dir} ({len(all_keys)} keys)")


def check(out_dir, n_samples=3):
    """Visual spot check: dump a few random frames next to the store.

    Uses the format auto-detector so it works on both TecoRecords and the
    LMDB stores this script writes."""
    from tecogan_tpu.data.records import open_store

    store = open_store(out_dir)
    n_seq = len({k.rsplit("_", 2)[0] for k in store.keys})
    print(f"{len(store.keys)} frame keys, ~{n_seq} sequences")
    for _ in range(n_samples):
        key = random.choice(store.keys)
        frm = store.get(key)
        out = osp.join(out_dir, f"check_{key}.png")
        cv2.imwrite(out, frm[..., ::-1])
        print(f"  {key}: {frm.shape} -> {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="")
    p.add_argument("--raw_dir", default="")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--filter_file", default=None)
    p.add_argument("--check", action="store_true")
    p.add_argument("--format", choices=["records", "lmdb"],
                   default="records")
    args = p.parse_args()
    if args.check:
        check(args.out_dir)
    elif args.format == "lmdb":
        build_lmdb(args.raw_dir, args.out_dir, args.filter_file)
    else:
        build(args.raw_dir, args.out_dir, args.filter_file)
