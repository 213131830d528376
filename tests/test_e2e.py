"""End-to-end slice tests with synthetic data: record building, the loader,
FRVSR test mode through the real CLI driver, and a short train loop."""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest

from tecogan_tpu.data import (
    RecordWriter,
    TrainLoader,
    UnpairedClipDataset,
    create_dataloader,
)


def _write_png_seq(root, seq, t=6, h=48, w=56, seed=0):
    rng = np.random.default_rng(seed)
    d = osp.join(root, seq)
    os.makedirs(d, exist_ok=True)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    for i in range(t):
        img = np.roll(base, shift=i * 2, axis=1)
        cv2.imwrite(osp.join(d, f"{i:04d}.png"), img[..., ::-1])


@pytest.fixture
def gt_tree(tmp_path):
    root = str(tmp_path / "GT")
    for i, seq in enumerate(["seq_a", "seq_b"]):
        _write_png_seq(root, seq, seed=i)
    return root


@pytest.fixture
def records_dir(tmp_path, rng):
    out = str(tmp_path / "GT.rec")
    w = RecordWriter(out)
    for i, vid in enumerate(["vid0", "vid1"]):
        frames = (rng.random((5, 44, 52, 3)) * 255).astype(np.uint8)
        w.add_sequence(vid, frames)
    w.close()
    return out


def test_record_store_roundtrip(records_dir, rng):
    from tecogan_tpu.data.records import RecordStore, make_key

    store = RecordStore(records_dir)
    assert len(store.keys) == 10
    frm = store.get(make_key("vid1", 5, 44, 52, 3))
    assert frm.shape == (44, 52, 3) and frm.dtype == np.uint8


def test_record_writer_rejects_duplicate_vid(tmp_path, rng):
    """Duplicate sequence names would silently alias every read of the
    earlier sequence onto the later one's bytes (seq_info is vid-keyed)."""
    from tecogan_tpu.data.records import RecordStore, RecordWriter

    out = str(tmp_path / "dup.rec")
    w = RecordWriter(out)
    frames = (rng.random((2, 8, 8, 3)) * 255).astype(np.uint8)
    w.add_sequence("vid", frames)
    with pytest.raises(ValueError, match="duplicate sequence name"):
        w.add_sequence("vid", frames)

    # and a hand-corrupted index with duplicates refuses to open
    w.close()
    idx = osp.join(out, "index.json")
    meta = json.load(open(idx))
    meta["seqs"].append(dict(meta["seqs"][0]))
    json.dump(meta, open(idx, "w"))
    with pytest.raises(ValueError, match="duplicate sequence name"):
        RecordStore(out)


def test_clip_rejects_unsupported_dtype(records_dir):
    """float16 etc. would silently return raw 0-255 values under a
    'normalised' dtype on the numpy fallback path."""
    from tecogan_tpu.data.records import RecordStore, make_key

    store = RecordStore(records_dir)
    keys = [make_key("vid0", 5, 44, 52, i) for i in range(2)]
    with pytest.raises(ValueError, match="float32 .* or uint8"):
        store.clip(keys, [0, 0], [0, 0], 8, 8, np.float16)


def test_paired_dataset_pairs_by_vid_not_sort_order(tmp_path, rng):
    """GT/LR key sort order can diverge when the size substring flips the
    comparison (vids 'a' vs 'a_120x2'); pairing is by (vid, idx)."""
    from tecogan_tpu.data import PairedClipDataset
    from tecogan_tpu.data.records import RecordWriter, parse_key

    gt_dir, lr_dir = str(tmp_path / "gt.rec"), str(tmp_path / "lr.rec")
    wg, wl = RecordWriter(gt_dir), RecordWriter(lr_dir)
    for vid in ["a", "a_120x2"]:
        wg.add_sequence(vid, (rng.random((3, 64, 64, 3)) * 255
                              ).astype(np.uint8))
        wl.add_sequence(vid, (rng.random((3, 16, 16, 3)) * 255
                              ).astype(np.uint8))
    wg.close()
    wl.close()

    ds = PairedClipDataset(gt_dir, lr_dir, scale=4, gt_crop_size=32,
                           tempo_extent=2)
    assert len(ds.pairs) == 6
    for gk, lk in ds.pairs:
        gv, _g, gi = parse_key(gk)
        lv, _l, li = parse_key(lk)
        assert (gv, gi) == (lv, li)

    # a missing LR counterpart is a named error, not a zip mispair
    wl2 = RecordWriter(str(tmp_path / "lr2.rec"))
    wl2.add_sequence("a", (rng.random((3, 16, 16, 3)) * 255
                           ).astype(np.uint8))
    wl2.close()
    with pytest.raises(ValueError, match="no LR counterpart"):
        PairedClipDataset(gt_dir, str(tmp_path / "lr2.rec"), scale=4,
                          gt_crop_size=32, tempo_extent=2)


def test_unpaired_clip_dataset(records_dir):
    ds = UnpairedClipDataset(records_dir, crop_size=32, tempo_extent=4,
                             moving_first_frame=True, moving_factor=0.5)
    rng = np.random.default_rng(0)
    for i in range(4):
        out = ds[(i, rng)]
        assert out["gt"].shape == (4, 32, 32, 3)
        assert out["gt"].dtype == np.float32
        assert 0.0 <= out["gt"].min() and out["gt"].max() <= 1.0
    # temporal reflection: last key of vid0 still yields 4 frames
    out = ds[(4, rng)]
    assert out["gt"].shape == (4, 32, 32, 3)


def test_train_loader_batches_and_determinism(records_dir):
    ds = UnpairedClipDataset(records_dir, crop_size=32, tempo_extent=3)
    loader = TrainLoader(ds, batch_size=4, seed=7, num_workers=2)
    b1 = list(loader.epoch(0))
    b2 = list(loader.epoch(0))
    assert len(b1) == len(loader) == 2
    assert b1[0]["gt"].shape == (4, 3, 32, 32, 3)
    np.testing.assert_array_equal(b1[0]["gt"], b2[0]["gt"])
    b3 = list(loader.epoch(1))
    assert not np.array_equal(b1[0]["gt"], b3[0]["gt"])


def test_train_loader_start_batch_skips_without_assembling(records_dir):
    """Resume path: epoch(e, start_batch=k) yields exactly the tail of
    epoch(e) and never materialises the skipped batches."""
    ds = UnpairedClipDataset(records_dir, crop_size=32, tempo_extent=3)
    loader = TrainLoader(ds, batch_size=4, seed=7, num_workers=2)
    full = list(loader.epoch(0))

    calls = []
    orig = ds.sample_plan

    def counting(i, rng):
        calls.append(i)
        return orig(i, rng)

    ds.sample_plan = counting
    tail = list(loader.epoch(0, start_batch=1))
    ds.sample_plan = orig

    assert len(tail) == len(full) - 1
    for got, want in zip(tail, full[1:]):
        np.testing.assert_array_equal(got["gt"], want["gt"])
    # only the tail's samples were assembled (batch_size per batch)
    assert len(calls) == 4 * len(tail)


def test_device_loader_start_batch_matches_tail(records_dir):
    from tecogan_tpu.data.device_data import DeviceResidentLoader

    ds = UnpairedClipDataset(records_dir, crop_size=32, tempo_extent=3)
    dev = DeviceResidentLoader(ds, batch_size=4, seed=7)
    full = [np.asarray(b["gt"]) for b in dev.epoch(0)]
    tail = [np.asarray(b["gt"]) for b in dev.epoch(0, start_batch=1)]
    assert len(tail) == len(full) - 1
    for got, want in zip(tail, full[1:]):
        np.testing.assert_array_equal(got, want)


def _make_test_opt(gt_root, exp_dir, model_name="FRVSR"):
    return {
        "scale": 4,
        "manual_seed": 0,
        "is_train": False,
        "exp_dir": exp_dir,
        "device_ids": [0],
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "test1": {"name": "Toy", "gt_seq_dir": gt_root},
        },
        "model": {
            "name": model_name,
            "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                          "nf": 16, "nb": 2},
        },
        "test": {"save_res": True, "res_dir": osp.join(exp_dir, "results"),
                 "save_json": True, "json_dir": osp.join(exp_dir, "metrics"),
                 "padding_mode": "reflect", "num_pad_front": 2},
        "metric": {"PSNR": {"colorspace": "y"},
                   "SSIM": {},
                   "tOF": {"colorspace": "y"}},
    }


def test_frvsr_inference_end_to_end(gt_tree, tmp_path):
    """Full test-mode path: BD on-the-fly LR, scan inference, PNG output,
    PSNR/SSIM/tOF metrics, JSON persistence."""
    import jax
    from tecogan_tpu.main import _run_test_sets
    from tecogan_tpu.models import define_model
    from tecogan_tpu.utils.ckpt import save_pytree

    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir, exist_ok=True)
    opt = _make_test_opt(gt_tree, exp_dir)

    model = define_model(opt)
    _run_test_sets(opt, model, "G_iter1000")

    # PNG results exist and have the right size
    res = osp.join(exp_dir, "results", "Toy", "G_iter1000", "seq_a")
    files = sorted(os.listdir(res))
    assert len(files) == 6
    img = cv2.imread(osp.join(res, files[0]))
    assert img.shape == (48, 56, 3)  # SR output == GT size (LR = GT/4)

    # metrics json written
    with open(osp.join(exp_dir, "metrics", "Toy_avg.json")) as f:
        j = json.load(f)
    assert "G_iter1000" in j
    assert set(j["G_iter1000"]) == {"PSNR", "SSIM", "tOF"}
    assert np.isfinite(float(j["G_iter1000"]["PSNR"]))

    # checkpoint save/load roundtrip keeps outputs identical
    ck = str(tmp_path / "G_test.npz")
    save_pytree(jax.device_get(model.state["g"]), ck)
    opt2 = _make_test_opt(gt_tree, exp_dir)
    opt2["model"]["generator"]["load_path"] = ck
    model2 = define_model(opt2)
    lr = model.prepare_inference_data(
        {"gt": _load_seq(gt_tree, "seq_a")})
    np.testing.assert_array_equal(model.infer(lr), model2.infer(lr))


def _load_seq(root, seq):
    files = sorted(os.listdir(osp.join(root, seq)))
    return np.stack([
        cv2.imread(osp.join(root, seq, f))[..., ::-1] for f in files])


def test_frvsr_training_loop_runs(records_dir, tmp_path):
    """Two real optimisation steps through the model wrapper + loader."""
    exp_dir = str(tmp_path / "exp2")
    os.makedirs(osp.join(exp_dir, "train", "ckpt"), exist_ok=True)
    opt = {
        "scale": 4,
        "manual_seed": 0,
        "is_train": True,
        "exp_dir": exp_dir,
        "device_ids": list(range(8)),
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "train": {"name": "VimeoTecoGAN", "seq_dir": records_dir,
                      "crop_size": 32, "batch_size_per_gpu": 1,
                      "num_worker_per_gpu": 1},
        },
        "model": {"name": "FRVSR",
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": 8, "nb": 2}},
        "train": {
            "tempo_extent": 3,
            "ckpt_dir": osp.join(exp_dir, "train", "ckpt"),
            "generator": {"lr": 1e-4, "lr_schedule": {"type": "FixedLR"},
                          "betas": [0.9, 0.999]},
            "pixel_crit": {"type": "CB", "weight": 1, "reduction": "mean"},
            "warping_crit": {"type": "CB", "weight": 1, "reduction": "mean"},
        },
        "logger": {"decay": 0.99, "log_freq": 1, "ckpt_freq": 0},
        "test": {"test_freq": 0},
    }
    from tecogan_tpu.models import define_model

    model = define_model(opt)
    loader = create_dataloader(opt, "train", "train",
                               n_devices=model.mesh.devices.size)
    assert len(loader) == 1  # 10 samples, global batch 8, drop_last
    batch = model.prepare_training_data(next(iter(loader.epoch(0))))
    logs1 = model.train(batch)
    batch = model.prepare_training_data(next(iter(loader.epoch(1))))
    logs2 = model.train(batch)
    assert np.isfinite(float(logs2["l_pix_G"]))
    msg = model.get_format_msg(model.state, 0, 2)
    assert msg.startswith("[epoch: 0 | iter: 2 | lr_G: 1.00e-04] ")
    assert "l_pix_G" in msg and "l_warp_G" in msg


def test_train_loader_early_exit_stops_producer(records_dir):
    """Breaking out of an epoch mid-way (total_iter reached, exception)
    must not leave the producer thread parked in a blocking put."""
    import threading
    import time

    ds = UnpairedClipDataset(records_dir, crop_size=32, tempo_extent=3)
    loader = TrainLoader(ds, batch_size=1, seed=7, num_workers=2)
    assert len(loader) >= 4  # enough batches to fill the prefetch queue
    # compare Thread OBJECTS, not idents — CPython recycles idents of
    # exited threads, which could mask a genuinely leaked producer
    before = set(threading.enumerate())
    gen = loader.epoch(0)
    next(gen)
    gen.close()  # consumer exits early -> stop event fires
    deadline = time.time() + 10.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"leaked threads: {extra}"


def test_train_loader_slow_consumer_epoch_boundary(records_dir):
    """Regression (round-2 verdict #1): when the consumer is slower than
    host batch assembly the prefetch queue is full at producer exit; the
    end-of-epoch sentinel must still be delivered (a dropped sentinel left
    the consumer blocked forever in out_q.get()). Drives two full epochs
    with a consumer slower than the producer — the exact shape of
    main.train's multi-epoch loop — under a watchdog."""
    import threading
    import time

    ds = UnpairedClipDataset(records_dir, crop_size=32, tempo_extent=3)
    # prefetch(2) < n_batches(10): the queue is guaranteed full when the
    # producer finishes, since the consumer sleeps 50 ms per batch.
    loader = TrainLoader(ds, batch_size=1, seed=7, num_workers=2,
                         prefetch=2)
    assert len(loader) == 10

    counts = []

    def consume_two_epochs():
        for epoch in range(2):
            n = 0
            for _ in loader.epoch(epoch):
                time.sleep(0.05)  # TPU step slower than host assembly
                n += 1
            counts.append(n)

    t = threading.Thread(target=consume_two_epochs, daemon=True)
    t.start()
    t.join(timeout=30.0)
    assert not t.is_alive(), (
        "training loop hung at an epoch boundary (lost None sentinel)")
    assert counts == [10, 10]


def test_clip_keys_short_sequence_reflection():
    """Sequences shorter than tempo_extent reflect repeatedly instead of
    producing negative frame indices (which the mmap store would turn into
    garbage byte offsets)."""
    from tecogan_tpu.data.datasets import _clip_keys
    from tecogan_tpu.data.records import parse_key

    keys, _ = _clip_keys("vid_2x8x8_00000000", tempo_extent=7)
    idxs = [parse_key(k)[2] for k in keys]
    assert idxs == [0, 1, 0, 1, 0, 1, 0]
    assert all(i >= 0 for i in idxs)

    keys, _ = _clip_keys("vid_1x8x8_00000000", tempo_extent=3)
    assert [parse_key(k)[2] for k in keys] == [0, 0, 0]

    # single bounce unchanged vs the reference formula (tot >= extent)
    keys, _ = _clip_keys("vid_5x8x8_00000003", tempo_extent=4)
    assert [parse_key(k)[2] for k in keys] == [3, 4, 3, 2]
