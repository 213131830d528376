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


@pytest.mark.parametrize("dtype", [np.float32, np.uint8])
def test_native_clip_aug_matches_numpy_all_variants(store, rng, dtype):
    """The fused gather+crop+aug kernel is bit-exact vs the numpy
    crop -> flip -> rot90 fallback for every dihedral variant."""
    keys = [k for k in store.keys if k.startswith("b_")][:5]
    tops = rng.integers(0, 8, size=5).astype(np.int32)
    lefts = rng.integers(0, 24, size=5).astype(np.int32)
    for aug in range(12):
        got = store.clip_aug(keys, tops, lefts, 32, aug, dtype)
        want = _StoreBase.clip_aug(store, keys, tops, lefts, 32, aug, dtype)
        assert store._native is not None
        assert got.shape == want.shape == (5, 32, 32, 3)
        assert got.dtype == np.dtype(dtype)
        np.testing.assert_array_equal(got, want, err_msg=f"aug={aug}")


def test_native_clip_aug_into_slot(store, rng):
    """assemble into a preallocated batch slot writes the same bytes."""
    keys = [k for k in store.keys if k.startswith("a_")][:3]
    tops = np.asarray([1, 2, 3], np.int32)
    lefts = np.asarray([4, 5, 6], np.int32)
    batch = np.empty((2, 3, 16, 16, 3), np.uint8)
    got = store.clip_aug(keys, tops, lefts, 16, 7, np.uint8,
                         out=batch[1])
    assert got.base is not None  # wrote into the slot, no new allocation
    want = _StoreBase.clip_aug(store, keys, tops, lefts, 16, 7, np.uint8)
    np.testing.assert_array_equal(batch[1], want)


def test_aug_coeffs_reproduce_dihedral_maps():
    """The affine coefficients are extracted from (and asserted against)
    the device path's dihedral_maps — same source of truth; spot-check
    the composed gather against direct numpy ops on a real image."""
    from tecogan_tpu.data.native import aug_coeffs

    img = (np.random.default_rng(3).random((1, 20, 20, 3)) * 255).astype(
        np.uint8)
    coeffs = aug_coeffs(20)
    for aug in range(12):
        axis, k = aug // 4 + 1, aug % 4
        want = img
        if axis > 1:
            want = np.flip(want, axis - 1)
        want = np.rot90(want, k, (1, 2))
        r0, c0, drr, drc, dcr, dcc = (int(v) for v in coeffs[aug])
        ro, co = np.meshgrid(np.arange(20), np.arange(20), indexing="ij")
        got = img[0][r0 + ro * drr + co * dcr, c0 + ro * drc + co * dcc]
        np.testing.assert_array_equal(got, want[0], err_msg=f"aug={aug}")


def test_train_loader_slot_path_matches_per_sample_assembly(store, tmp_path,
                                                            rng):
    """TrainLoader's preallocated-batch path yields batches bit-identical
    to stacking dataset[(i, rng)] samples in epoch order (the pre-slot
    loader's contract), for unpaired u8 AND paired f32 datasets."""
    from tecogan_tpu.data.datasets import (PairedClipDataset,
                                           UnpairedClipDataset)
    from tecogan_tpu.data.loader import TrainLoader
    from tecogan_tpu.data.records import RecordWriter

    # paired stores: LR 40x56 -> GT 80x112 at scale 2
    gt_dir, lr_dir = str(tmp_path / "gt"), str(tmp_path / "lr")
    wg, wl = RecordWriter(gt_dir), RecordWriter(lr_dir)
    for vid in ("a", "b"):
        wg.add_sequence(vid, (rng.random((6, 80, 112, 3)) * 255).astype(
            np.uint8))
        wl.add_sequence(vid, (rng.random((6, 40, 56, 3)) * 255).astype(
            np.uint8))
    wg.close(), wl.close()

    datasets = [
        UnpairedClipDataset(gt_dir, crop_size=24, tempo_extent=4,
                            moving_first_frame=True, moving_factor=0.5,
                            output_dtype=np.uint8),
        PairedClipDataset(gt_dir, lr_dir, scale=2, gt_crop_size=32,
                          tempo_extent=3, output_dtype=np.float32),
    ]
    for ds in datasets:
        loader = TrainLoader(ds, batch_size=4, seed=11, num_workers=2,
                             prefetch=2)
        for epoch in range(2):
            order = np.random.default_rng((11, epoch)).permutation(len(ds))
            got_batches = list(loader.epoch(epoch))
            assert len(got_batches) == len(loader) > 0
            for b, got in enumerate(got_batches):
                idxs = order[b * 4:(b + 1) * 4]
                want = {}
                for i in idxs:
                    s_rng = np.random.default_rng((11, epoch, int(i)))
                    s = ds[(int(i), s_rng)]
                    for k, v in s.items():
                        want.setdefault(k, []).append(v)
                for k in want:
                    np.testing.assert_array_equal(got[k], np.stack(want[k]))


def test_thread_knob_changes_cap_and_keeps_outputs_identical(store, rng):
    """The per-sample assembly thread cap (VERDICT r3 next-step #6:
    a pod host feeding a dp-sharded global batch needs to scale assembly
    beyond the single-chip default of 4) is settable at runtime and has
    zero effect on the assembled bytes."""
    import ctypes
    import os

    from tecogan_tpu.data.native import set_assembler_threads

    lib = load_library()
    prior = lib.teco_get_max_threads()
    if "TECOGAN_LOADER_THREADS" not in os.environ:
        # documented compiled-in default (an env override legitimately
        # changes the import-time cap; don't fail the feature's own test)
        assert prior == 4

    keys = [k for k in store.keys if k.startswith("b_")][:6]
    tops = rng.integers(0, 8, size=6).astype(np.int32)
    lefts = rng.integers(0, 16, size=6).astype(np.int32)
    base = store.clip_f32(keys, tops, lefts, 24, 24)
    try:
        for n in (1, 2, 16):
            set_assembler_threads(n)
            assert lib.teco_get_max_threads() == n
            np.testing.assert_array_equal(
                store.clip_f32(keys, tops, lefts, 24, 24), base)
        set_assembler_threads(0)  # clamped, never a zero-thread deadlock
        assert lib.teco_get_max_threads() == 1
    finally:
        set_assembler_threads(prior)
