"""Folder test datasets (data/datasets.py): IO error handling."""

import numpy as np
import pytest


def _write_png(path, arr):
    import cv2

    cv2.imwrite(str(path), arr[..., ::-1])


def test_unreadable_sequence_frame_raises_with_filename(tmp_path):
    """A corrupt frame in a test sequence must fail loudly with the file
    named — cv2.imread returns None for unreadable files, and the bare
    BGR->RGB slice used to die as an unsubscriptable-NoneType TypeError
    with no indication of which file was broken."""
    from tecogan_tpu.data.datasets import UnpairedFolderDataset

    seq = tmp_path / "clipA"
    seq.mkdir()
    rng = np.random.default_rng(0)
    _write_png(seq / "0000.png", (rng.random((8, 8, 3)) * 255).astype(
        np.uint8))
    (seq / "0001.png").write_bytes(b"\x89PNG\r\n\x1a\n garbage")

    ds = UnpairedFolderDataset(str(tmp_path))
    with pytest.raises(IOError, match="0001.png"):
        ds[0]
