"""LMDB round-trip: scripts/create_records.py --format lmdb ->
data.records.LMDBStore, executed under a minimal in-process `lmdb` shim
(the real package is absent in this environment; the shim implements the
exact API slice both sides use — open/begin/put/get/close — backed by a
pickle file, so the reference-format read/write code paths run for real).
"""

import os.path as osp
import pickle
import sys
import types

import cv2
import numpy as np
import pytest


class _ShimTxn:
    def __init__(self, env, write):
        self.env, self.write = env, write

    def __enter__(self):
        return self

    def __exit__(self, *a):
        if self.write:
            self.env._flush()
        return False

    def put(self, key: bytes, val: bytes):
        assert self.write
        self.env._data[key] = bytes(val)

    def get(self, key: bytes):
        return self.env._data.get(key)


class _ShimEnv:
    def __init__(self, path, readonly=False, **kw):
        self.path = path
        self._file = osp.join(path, "shim.mdb")
        self._data = {}
        if osp.exists(self._file):
            with open(self._file, "rb") as f:
                self._data = pickle.load(f)
        elif readonly:
            raise FileNotFoundError(self._file)

    def begin(self, write=False):
        return _ShimTxn(self, write)

    def _flush(self):
        with open(self._file, "wb") as f:
            pickle.dump(self._data, f)

    def close(self):
        self._flush()


@pytest.fixture
def lmdb_shim(monkeypatch):
    mod = types.ModuleType("lmdb")
    mod.open = lambda path, **kw: _ShimEnv(path, **kw)
    monkeypatch.setitem(sys.modules, "lmdb", mod)
    return mod


def test_lmdb_write_read_roundtrip(tmp_path, rng, lmdb_shim, monkeypatch):
    monkeypatch.syspath_prepend(osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "scripts"))
    import create_records

    raw = tmp_path / "raw"
    originals = {}
    for seq in ("clipA", "clipB"):
        d = raw / seq
        d.mkdir(parents=True)
        frames = (rng.random((4, 24, 32, 3)) * 255).astype(np.uint8)
        originals[seq] = frames
        for i in range(4):
            cv2.imwrite(str(d / f"{i:04d}.png"), frames[i][..., ::-1])

    out = str(tmp_path / "GT.lmdb")
    create_records.build_lmdb(str(raw), out)
    assert osp.exists(osp.join(out, "meta_info.pkl"))

    from tecogan_tpu.data.records import LMDBStore, open_store

    store = open_store(out)  # auto-detects LMDB via meta_info.pkl
    assert isinstance(store, LMDBStore)
    assert len(store.keys) == 8

    for seq, frames in originals.items():
        for i in range(4):
            key = f"{seq}_4x24x32_{i:04d}"
            np.testing.assert_array_equal(store.get(key), frames[i])

    # clip assembly through the generic base path
    keys = [f"clipA_4x24x32_{i:04d}" for i in range(3)]
    clip = store.clip(keys, tops=[2] * 3, lefts=[4] * 3, ch=16, cw=16,
                      dtype=np.uint8)
    np.testing.assert_array_equal(
        clip, np.stack([originals["clipA"][i][2:18, 4:20] for i in range(3)]))


def test_lmdb_store_rejects_non_rgb_and_missing_keys(tmp_path, lmdb_shim):
    """A non-RGB (or truncated) LMDB value must fail loudly instead of
    being reshaped into garbage; a missing key must raise KeyError, not
    crash on a None buffer."""
    out = tmp_path / "bad.lmdb"
    out.mkdir()
    env = lmdb_shim.open(str(out))
    with env.begin(write=True) as txn:
        txn.put(b"gray_2x8x8_0000", bytes(8 * 8 * 1))  # 1-channel payload
        txn.put(b"gray_2x8x8_0001", bytes(8 * 8 * 3))  # valid RGB size
    env.close()
    with open(out / "meta_info.pkl", "wb") as f:
        pickle.dump({"keys": ["gray_2x8x8_0000", "gray_2x8x8_0001"]}, f)

    from tecogan_tpu.data.records import LMDBStore

    store = LMDBStore(str(out))
    with pytest.raises(ValueError, match="channels=1"):
        store.get("gray_2x8x8_0000")
    assert store.get("gray_2x8x8_0001").shape == (8, 8, 3)
    with pytest.raises(KeyError):
        store.get("gray_2x8x8_0099")


def test_lmdb_dataset_end_to_end(tmp_path, rng, lmdb_shim, monkeypatch):
    """UnpairedClipDataset over an LMDBStore: the training data path the
    reference runs on LMDB (`base_dataset.py:48-66`)."""
    monkeypatch.syspath_prepend(osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), "scripts"))
    import create_records

    raw = tmp_path / "raw"
    for seq in ("v0", "v1"):
        d = raw / seq
        d.mkdir(parents=True)
        frames = (rng.random((5, 44, 44, 3)) * 255).astype(np.uint8)
        for i in range(5):
            cv2.imwrite(str(d / f"{i:04d}.png"), frames[i][..., ::-1])
    out = str(tmp_path / "GT.lmdb")
    create_records.build_lmdb(str(raw), out)

    from tecogan_tpu.data import UnpairedClipDataset

    ds = UnpairedClipDataset(out, crop_size=32, tempo_extent=3)
    item = ds[(0, np.random.default_rng(0))]
    assert item["gt"].shape == (3, 32, 32, 3)


def test_record_store_rejects_inconsistent_key(tmp_path, rng):
    """An out-of-range frame index or wrong geometry in a key must fail
    loudly instead of reading well-shaped garbage from the next
    sequence's bytes."""
    import pytest

    from tecogan_tpu.data import RecordWriter, open_store
    from tecogan_tpu.data.records import make_key

    out = str(tmp_path / "GT.rec")
    w = RecordWriter(out)
    w.add_sequence("a", (rng.random((3, 8, 10, 3)) * 255).astype(np.uint8))
    w.add_sequence("b", (rng.random((3, 8, 10, 3)) * 255).astype(np.uint8))
    w.close()
    store = open_store(out)
    ok = store.get(make_key("a", 3, 8, 10, 2))
    assert ok.shape == (8, 10, 3)
    with pytest.raises(KeyError):
        store.get(make_key("a", 3, 8, 10, 3))  # one past the end
    with pytest.raises(KeyError):
        store.get(make_key("a", 3, 16, 10, 0))  # wrong geometry


def test_save_pytree_rejects_unsafe_dict_keys(tmp_path):
    """Non-string (stringified) dict keys don't round-trip: '2'/'10' sort
    differently as str vs int, silently permuting leaves on resume."""
    import pytest

    from tecogan_tpu.utils.ckpt import save_pytree

    with pytest.raises(ValueError, match="keys must be"):
        save_pytree({2: np.zeros(1), 10: np.zeros(1)},
                    str(tmp_path / "x.npz"))
    with pytest.raises(ValueError, match="keys must be"):
        save_pytree({"a/b": np.zeros(1)}, str(tmp_path / "y.npz"))
