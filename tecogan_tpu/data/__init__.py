"""Loader factory (reference contract: `codes/data/__init__.py:11-95`)."""

from .datasets import (
    PairedClipDataset,
    PairedFolderDataset,
    UnpairedClipDataset,
    UnpairedFolderDataset,
)
from .loader import TrainLoader
from .records import RecordStore, RecordWriter, open_store

__all__ = [
    "create_dataloader",
    "create_test_dataset",
    "TrainLoader",
    "PairedClipDataset",
    "PairedFolderDataset",
    "UnpairedClipDataset",
    "UnpairedFolderDataset",
    "RecordStore",
    "RecordWriter",
    "open_store",
]


def create_dataloader(opt, phase: str, idx: str, n_devices: int = 1,
                      mesh=None):
    """Build a loader/dataset per the YAML dataset block.

    For training returns a TrainLoader producing the GLOBAL batch
    (batch_size_per_gpu * n_devices, matching the reference's per-GPU
    batching under DDP). ``mesh`` (the model's dp mesh, when available)
    lets the device-resident loader emit natively dp-sharded batches.
    """
    data_opt = opt["dataset"][idx]
    degradation = opt["dataset"]["degradation"]["type"]

    if phase == "train":
        import numpy as np

        common = dict(
            tempo_extent=opt["train"]["tempo_extent"],
            moving_first_frame=opt["train"].get("moving_first_frame", False),
            moving_factor=opt["train"].get("moving_factor", 1.0),
            filter_file=data_opt.get("filter_file"),
            # ship uint8 to the device; the jitted step normalises —
            # a quarter of the host->device bytes
            output_dtype=np.uint8,
        )
        if degradation == "BI":
            dataset = PairedClipDataset(
                data_opt["gt_seq_dir"], data_opt["lr_seq_dir"],
                scale=opt["scale"], gt_crop_size=data_opt["gt_crop_size"],
                **common)
        elif degradation == "BD":
            from ..ops.degrade import bd_border_size

            sigma = opt["dataset"]["degradation"]["sigma"]
            # the same border constant the in-step BD crop consumes
            # (steps.prepare_bd_batch); sharing the helper keeps the two
            # sides in lockstep
            enlarged = data_opt["crop_size"] + 2 * bd_border_size(sigma)
            dataset = UnpairedClipDataset(
                data_opt["seq_dir"], crop_size=enlarged, **common)
        else:
            raise ValueError(f"Unrecognized degradation type: {degradation}")

        if data_opt.get("device_resident", False):
            # keep the whole (uniform, HBM-sized) corpus on device and
            # ship only per-step sample plans — the recurring uint8 batch
            # H2D disappears (see data/device_data.py). Works on single-
            # AND multi-process meshes: every process loads the corpus
            # from its records store (shared FS or per-host copy, the
            # same requirement the host loader has) and gathers only its
            # own dp rows.
            import jax

            if mesh is None and jax.process_count() > 1:
                # without the mesh, the resident batch is committed to
                # this process's local device, and resharding a committed
                # single-device array onto a mesh spanning OTHER hosts is
                # not a supported transfer. The CLI always passes the
                # model's mesh (which takes the put_global path above);
                # for programmatic callers fall back to the host loader,
                # whose replicated-numpy batches device_put cleanly.
                import logging

                logging.getLogger("tecogan").warning(
                    "device_resident requested under multi-process "
                    "training without a mesh — falling back to the host "
                    "loader (pass the model's mesh to create_dataloader "
                    "for process-local HBM corpus shards)")
            else:
                from .device_data import DeviceResidentLoader

                return DeviceResidentLoader(
                    dataset,
                    batch_size=data_opt["batch_size_per_gpu"] * n_devices,
                    seed=opt.get("manual_seed", 2021),
                    mesh=mesh,
                )

        return TrainLoader(
            dataset,
            batch_size=data_opt["batch_size_per_gpu"] * n_devices,
            seed=opt.get("manual_seed", 2021),
            num_workers=data_opt.get("num_worker_per_gpu", 3) * n_devices,
        )

    if phase == "test":
        return create_test_dataset(opt, idx)

    raise ValueError(f"Unrecognized phase: {phase}")


def create_test_dataset(opt, idx: str):
    data_opt = opt["dataset"][idx]
    degradation = opt["dataset"]["degradation"]["type"]
    if data_opt.get("lr_seq_dir"):
        return PairedFolderDataset(
            data_opt["gt_seq_dir"], data_opt["lr_seq_dir"],
            filter_file=data_opt.get("filter_file"),
            filter_list=data_opt.get("filter_list"))
    assert degradation == "BD", '"lr_seq_dir" is required for BI mode'
    return UnpairedFolderDataset(
        data_opt["gt_seq_dir"],
        filter_file=data_opt.get("filter_file"),
        filter_list=data_opt.get("filter_list"))
