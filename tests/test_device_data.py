"""Device-resident training data (data/device_data.py): the device-gathered
batches must be BIT-identical to the host loader's, across augmentation
variants, temporal reflection and the moving-first-frame walk."""

import numpy as np
import pytest

from tecogan_tpu.data import RecordWriter, TrainLoader, UnpairedClipDataset


@pytest.fixture
def uniform_records(tmp_path, rng):
    out = str(tmp_path / "GT.rec")
    w = RecordWriter(out)
    for i in range(3):
        frames = (rng.random((6, 48, 56, 3)) * 255).astype(np.uint8)
        w.add_sequence(f"vid{i}", frames)
    w.close()
    return out


@pytest.fixture
def mixed_records(tmp_path, rng):
    out = str(tmp_path / "GT_mixed.rec")
    w = RecordWriter(out)
    w.add_sequence("a", (rng.random((4, 48, 56, 3)) * 255).astype(np.uint8))
    w.add_sequence("b", (rng.random((4, 40, 56, 3)) * 255).astype(np.uint8))
    w.close()
    return out


def _dataset(path, **kw):
    kw.setdefault("crop_size", 24)
    kw.setdefault("tempo_extent", 4)
    kw.setdefault("output_dtype", np.uint8)
    return UnpairedClipDataset(path, **kw)


def test_plan_assemble_equals_getitem(uniform_records):
    """The sample_plan/assemble split reproduces __getitem__ exactly
    (same RNG stream consumption, same pixels)."""
    ds = _dataset(uniform_records, moving_first_frame=True,
                  moving_factor=0.5)
    for i in range(len(ds)):
        a = ds.assemble(ds.sample_plan(i, np.random.default_rng((7, i))))
        b = ds[(i, np.random.default_rng((7, i)))]
        np.testing.assert_array_equal(a["gt"], b["gt"])


def test_dihedral_maps_cover_all_augs(uniform_records):
    """Every spatial-aug index maps the crop exactly like the host numpy
    ops (maps are derived from them, but verify the gather-side use)."""
    from tecogan_tpu.data.device_data import dihedral_maps

    csz = 8
    maps = dihedral_maps(csz)
    x = np.arange(csz * csz * 3, dtype=np.int32).reshape(1, csz, csz, 3)
    for aug in range(12):
        axis, k = aug // 4 + 1, aug % 4
        want = x
        if axis > 1:
            want = np.flip(want, axis - 1)
        want = np.rot90(want, k, (1, 2))
        got = x[0][maps[aug, ..., 0], maps[aug, ..., 1]][None]
        np.testing.assert_array_equal(got, want)


def test_device_loader_matches_host_loader(uniform_records):
    """Bit-identical batches from the device-resident loader and the host
    TrainLoader for the same seed/epoch (the headline contract)."""
    from tecogan_tpu.data.device_data import DeviceResidentLoader

    ds = _dataset(uniform_records, moving_first_frame=True,
                  moving_factor=0.5)
    host = TrainLoader(ds, batch_size=4, seed=11, num_workers=2)
    dev = DeviceResidentLoader(ds, batch_size=4, seed=11)
    for epoch in (0, 1):
        hb = list(host.epoch(epoch))
        db = list(dev.epoch(epoch))
        assert len(hb) == len(db) == len(host)
        for h, d in zip(hb, db):
            got = np.asarray(d["gt"])
            assert got.dtype == np.uint8
            np.testing.assert_array_equal(got, h["gt"])


@pytest.fixture
def paired_records(tmp_path, rng):
    gt_dir, lr_dir = str(tmp_path / "GT4.rec"), str(tmp_path / "LR.rec")
    wg, wl = RecordWriter(gt_dir), RecordWriter(lr_dir)
    for i in range(3):
        gt = (rng.random((5, 112, 128, 3)) * 255).astype(np.uint8)
        lr = (rng.random((5, 28, 32, 3)) * 255).astype(np.uint8)
        wg.add_sequence(f"vid{i}", gt)
        wl.add_sequence(f"vid{i}", lr)
    wg.close()
    wl.close()
    return gt_dir, lr_dir


def test_paired_device_loader_matches_host_loader(paired_records):
    """BI path: both stores resident; gt AND lr batches bit-identical to
    the host loader's (incl. the LR-unit moving walk and paired aug)."""
    from tecogan_tpu.data import PairedClipDataset
    from tecogan_tpu.data.device_data import DeviceResidentLoader

    gt_dir, lr_dir = paired_records
    ds = PairedClipDataset(gt_dir, lr_dir, scale=4, gt_crop_size=32,
                           tempo_extent=4, moving_first_frame=True,
                           moving_factor=0.5, output_dtype=np.uint8)
    host = TrainLoader(ds, batch_size=4, seed=5, num_workers=2)
    dev = DeviceResidentLoader(ds, batch_size=4, seed=5)
    hb, db = list(host.epoch(0)), list(dev.epoch(0))
    assert len(hb) == len(db) == len(host) > 0  # zip must not be vacuous
    for h, d in zip(hb, db):
        np.testing.assert_array_equal(np.asarray(d["gt"]), h["gt"])
        np.testing.assert_array_equal(np.asarray(d["lr"]), h["lr"])


def test_device_loader_rejects_mixed_geometry(mixed_records):
    from tecogan_tpu.data.device_data import DeviceResidentLoader

    ds = _dataset(mixed_records)
    with pytest.raises(ValueError, match="uniform corpus"):
        DeviceResidentLoader(ds, batch_size=2)


def test_factory_knob(uniform_records):
    from tecogan_tpu.data import create_dataloader
    from tecogan_tpu.data.device_data import DeviceResidentLoader

    opt = {
        "scale": 4, "manual_seed": 3,
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "train": {"name": "x", "seq_dir": uniform_records,
                      "crop_size": 16, "batch_size_per_gpu": 2,
                      "device_resident": True},
        },
        "train": {"tempo_extent": 3},
    }
    loader = create_dataloader(opt, "train", "train", n_devices=1)
    assert isinstance(loader, DeviceResidentLoader)
    batch = next(iter(loader))
    # BD crop enlargement: 16 + 2*int(3*1.5) = 24
    assert np.asarray(batch["gt"]).shape == (2, 3, 24, 24, 3)


def test_factory_multiprocess_without_mesh_falls_back(uniform_records,
                                                      monkeypatch, caplog):
    """Programmatic callers (mesh=None) under multi-process training get
    the host loader, not a corpus committed to one process's device that
    a cross-host device_put later cannot reshard; with the mesh the
    put_global path serves multi-process directly."""
    import logging

    import jax

    from tecogan_tpu.data import TrainLoader, create_dataloader
    from tecogan_tpu.data.device_data import DeviceResidentLoader
    from tecogan_tpu.parallel import get_mesh

    opt = {
        "scale": 4, "manual_seed": 3,
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "train": {"name": "x", "seq_dir": uniform_records,
                      "crop_size": 16, "batch_size_per_gpu": 1,
                      "device_resident": True},
        },
        "train": {"tempo_extent": 3},
    }
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with caplog.at_level(logging.WARNING, logger="tecogan"):
        loader = create_dataloader(opt, "train", "train", n_devices=1)
    assert isinstance(loader, TrainLoader)
    assert any("falling back to the host loader" in r.message
               for r in caplog.records)

    mesh = get_mesh(min(8, jax.device_count()))
    loader = create_dataloader(opt, "train", "train",
                               n_devices=mesh.devices.size, mesh=mesh)
    assert isinstance(loader, DeviceResidentLoader)


def test_device_batch_reshards_to_dp_mesh(uniform_records):
    """A device-born batch device_puts onto a multi-device dp sharding
    (the prepare_training_data path) without a host round-trip and with
    values intact."""
    import jax

    from tecogan_tpu.data.device_data import DeviceResidentLoader
    from tecogan_tpu.parallel import batch_sharding, get_mesh

    ds = _dataset(uniform_records)
    dev = DeviceResidentLoader(ds, batch_size=8, seed=2)
    host = TrainLoader(ds, batch_size=8, seed=2, num_workers=2)
    mesh = get_mesh()
    assert mesh.devices.size == 8  # conftest's virtual CPU mesh
    sh = batch_sharding(mesh)
    d = next(iter(dev.epoch(0)))
    h = next(iter(host.epoch(0)))
    out = jax.device_put(d["gt"], sh)
    assert out.sharding == sh
    np.testing.assert_array_equal(np.asarray(out), h["gt"])


def test_device_loader_emits_native_dp_sharding(uniform_records):
    """With a multi-device mesh the loader's batches are BORN sharded over
    dp (corpus replicated, each device gathering its own rows) — no
    per-step reshard — and stay bit-identical to the host loader's."""
    import jax

    from tecogan_tpu.data.device_data import DeviceResidentLoader
    from tecogan_tpu.parallel import batch_sharding, get_mesh, replicated

    ds = _dataset(uniform_records)
    mesh = get_mesh()
    assert mesh.devices.size == 8  # conftest's virtual CPU mesh
    dev = DeviceResidentLoader(ds, batch_size=8, seed=2, mesh=mesh)
    host = TrainLoader(ds, batch_size=8, seed=2, num_workers=2)
    # the resident corpus is replicated over the mesh, not single-device
    assert all(c.sharding == replicated(mesh) for c in dev._clips.values())
    db, hb = list(dev.epoch(1)), list(host.epoch(1))
    assert len(db) == len(hb) == len(host) > 0
    for d, h in zip(db, hb):
        assert d["gt"].sharding == batch_sharding(mesh)
        np.testing.assert_array_equal(np.asarray(d["gt"]), h["gt"])
    # the factory threads the mesh through (main.py passes model.mesh)
    from tecogan_tpu.data import create_dataloader

    opt = {
        "scale": 4, "manual_seed": 3,
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "train": {"name": "x", "seq_dir": uniform_records,
                      "crop_size": 16, "batch_size_per_gpu": 1,
                      "device_resident": True},
        },
        "train": {"tempo_extent": 3},
    }
    loader = create_dataloader(opt, "train", "train", n_devices=8,
                               mesh=mesh)
    batch = next(iter(loader))
    assert batch["gt"].sharding == batch_sharding(mesh)
    assert np.asarray(batch["gt"]).shape == (8, 3, 24, 24, 3)


def test_paired_plan_assemble_equals_getitem(paired_records):
    from tecogan_tpu.data import PairedClipDataset

    gt_dir, lr_dir = paired_records
    ds = PairedClipDataset(gt_dir, lr_dir, scale=4, gt_crop_size=32,
                           tempo_extent=4, moving_first_frame=True,
                           moving_factor=0.5, output_dtype=np.uint8)
    for i in range(len(ds)):
        a = ds.assemble(ds.sample_plan(i, np.random.default_rng((9, i))))
        b = ds[(i, np.random.default_rng((9, i)))]
        np.testing.assert_array_equal(a["gt"], b["gt"])
        np.testing.assert_array_equal(a["lr"], b["lr"])


# NOTE: multi-PROCESS device-resident loading (each process uploads its
# replica copy and gathers only its own dp rows) is certified by a real
# 2-process spawned test: tests/test_multihost.py::
# test_two_process_device_resident_loader.
