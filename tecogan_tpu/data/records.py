"""TecoRecords — mmap-friendly frame storage for training clips.

TPU-native replacement for the reference's LMDB databases
(`codes/data/base_dataset.py:48-66`, `scripts/create_lmdb.py`): a directory
holding one flat binary blob of raw uint8 RGB frames plus a numpy index.
Frames are fetched zero-copy via a single ``np.memmap`` (the kernel page
cache does the caching LMDB would), which keeps the host input pipeline
allocation-free and trivially shareable across loader threads — and the
same layout is consumable by the native C++ prefetcher.

Key format matches the reference ("<vid>_<T>x<H>x<W>_<idx>") so meta
tooling carries over. An ``lmdb``-backed store with the same interface is
provided for drop-in compatibility when the lmdb package exists.
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np

__all__ = ["RecordWriter", "RecordStore", "LMDBStore", "open_store",
           "parse_key", "make_key"]


def make_key(vid: str, tot_frm: int, h: int, w: int, idx: int) -> str:
    return f"{vid}_{tot_frm}x{h}x{w}_{idx:04d}"


def parse_key(key: str):
    parts = key.split("_")
    vid = "_".join(parts[:-2])
    tot, h, w = map(int, parts[-2].split("x"))
    return vid, (tot, h, w), int(parts[-1])


class RecordWriter:
    """Append frames sequence-by-sequence into a records directory."""

    def __init__(self, out_dir):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.blob = open(osp.join(out_dir, "data.bin"), "wb")
        self.seqs = []  # (vid, tot, h, w, c, start_offset)
        self.offset = 0

    def add_sequence(self, vid: str, frames: np.ndarray):
        """frames: (t, h, w, c) uint8 RGB."""
        t, h, w, c = frames.shape
        assert frames.dtype == np.uint8
        start = self.offset
        data = np.ascontiguousarray(frames)
        self.blob.write(data.tobytes())
        self.offset += data.nbytes
        self.seqs.append((vid, t, h, w, c, start))

    def close(self):
        self.blob.close()
        meta = {
            "seqs": [
                {"vid": v, "t": t, "h": h, "w": w, "c": c, "offset": o}
                for (v, t, h, w, c, o) in self.seqs
            ]
        }
        with open(osp.join(self.out_dir, "index.json"), "w") as f:
            json.dump(meta, f)


class RecordStore:
    """Read side: key -> (h, w, c) uint8 frame view (no copy)."""

    def __init__(self, rec_dir):
        with open(osp.join(rec_dir, "index.json")) as f:
            meta = json.load(f)
        self.blob = np.memmap(osp.join(rec_dir, "data.bin"), dtype=np.uint8,
                              mode="r")
        self.seq_info = {}
        self.keys = []
        for s in meta["seqs"]:
            self.seq_info[s["vid"]] = s
            for i in range(s["t"]):
                self.keys.append(make_key(s["vid"], s["t"], s["h"], s["w"], i))
        self.keys.sort()

    def get(self, key: str) -> np.ndarray:
        vid, (tot, h, w), idx = parse_key(key)
        s = self.seq_info[vid]
        c = s["c"]
        frame_bytes = h * w * c
        off = s["offset"] + idx * frame_bytes
        return self.blob[off:off + frame_bytes].reshape(h, w, c)


class LMDBStore:
    """Same interface over a reference-format LMDB (meta_info.pkl + frames).

    Lazily opens the environment per process (fork-safe), mirroring
    `base_dataset.py:48-51`. Requires the ``lmdb`` package.
    """

    def __init__(self, lmdb_dir):
        import pickle

        with open(osp.join(lmdb_dir, "meta_info.pkl"), "rb") as f:
            meta = pickle.load(f)
        self.keys = sorted(meta["keys"])
        self.dir = lmdb_dir
        self._env = None

    def _env_handle(self):
        if self._env is None:
            import lmdb

            self._env = lmdb.open(self.dir, readonly=True, lock=False,
                                  readahead=False, meminit=False)
        return self._env

    def get(self, key: str) -> np.ndarray:
        _, (tot, h, w), _ = parse_key(key)
        with self._env_handle().begin(write=False) as txn:
            buf = txn.get(key.encode("ascii"))
        return np.frombuffer(buf, dtype=np.uint8).reshape(h, w, 3)


def open_store(path: str):
    """Auto-detect the store type at ``path``."""
    if osp.exists(osp.join(path, "index.json")):
        return RecordStore(path)
    if osp.exists(osp.join(path, "meta_info.pkl")):
        return LMDBStore(path)
    raise FileNotFoundError(
        f"no TecoRecords index.json or LMDB meta_info.pkl under {path}")
