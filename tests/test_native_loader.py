"""Native C++ clip assembler: parity with the numpy fallback path.

Skipped when native/libtecoloader.so has not been built (`make -C native`).
"""

import numpy as np
import pytest

from tecogan_tpu.data.records import RecordStore, RecordWriter, _StoreBase
from tecogan_tpu.data.native import load_library


pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native library not built")


@pytest.fixture
def store(tmp_path, rng):
    out = str(tmp_path / "rec")
    w = RecordWriter(out)
    for vid in ("a", "b"):
        w.add_sequence(vid, (rng.random((6, 40, 56, 3)) * 255).astype(
            np.uint8))
    w.close()
    return RecordStore(out)


def test_native_clip_matches_numpy(store, rng):
    keys = [k for k in store.keys if k.startswith("a_")][:4]
    tops = rng.integers(0, 8, size=4).astype(np.int32)
    lefts = rng.integers(0, 16, size=4).astype(np.int32)

    got = store.clip_f32(keys, tops, lefts, 32, 32)
    want = _StoreBase.clip_f32(store, keys, tops, lefts, 32, 32)

    assert store._native is not None  # the native path actually ran
    assert got.shape == (4, 32, 32, 3) and got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_native_clip_repeated_frame(store):
    keys = [store.keys[0]] * 3
    got = store.clip_f32(keys, [0, 2, 4], [0, 3, 6], 16, 16)
    want = _StoreBase.clip_f32(store, keys, [0, 2, 4], [0, 3, 6], 16, 16)
    np.testing.assert_array_equal(got, want)
