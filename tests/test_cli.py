"""CLI-level end-to-end: the real `tecogan_tpu.main` entry in train and
profile modes with a tiny config, exercising config parsing, path setup,
the train loop (logging cadence, checkpointing, validation sub-loop) and
the profiler."""

import json
import os
import os.path as osp

import cv2
import numpy as np
import pytest
import yaml

from tecogan_tpu.data import RecordWriter


@pytest.fixture
def tiny_exp(tmp_path, rng):
    """Records store + GT PNG tree + train.yml for a tiny FRVSR run."""
    rec = str(tmp_path / "GT.rec")
    w = RecordWriter(rec)
    for vid in ("v0", "v1"):
        w.add_sequence(vid, (rng.random((5, 48, 48, 3)) * 255).astype(
            np.uint8))
    w.close()

    gt_root = str(tmp_path / "ValGT")
    d = osp.join(gt_root, "seq_x")
    os.makedirs(d)
    base = (rng.random((48, 56, 3)) * 255).astype(np.uint8)
    for i in range(5):
        cv2.imwrite(osp.join(d, f"{i:04d}.png"),
                    np.roll(base, i, axis=1)[..., ::-1])

    exp_dir = str(tmp_path / "exp")
    os.makedirs(exp_dir)
    opt = {
        "scale": 4, "manual_seed": 0, "verbose": False,
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "train": {"name": "VimeoTecoGAN", "seq_dir": rec,
                      "data_type": "rgb", "crop_size": 32,
                      "batch_size_per_gpu": 1, "num_worker_per_gpu": 1,
                      "pin_memory": True},
            "test": {"name": "Toy", "gt_seq_dir": gt_root,
                     "num_worker_per_gpu": 1, "pin_memory": True},
        },
        "model": {"name": "FRVSR",
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": 8, "nb": 2}},
        "train": {"tempo_extent": 3, "start_iter": 0, "total_iter": 2,
                  "moving_first_frame": True, "moving_factor": 0.7,
                  "generator": {"lr": 1e-4,
                                "lr_schedule": {"type": "FixedLR"},
                                "betas": [0.9, 0.999]},
                  "pixel_crit": {"type": "CB", "weight": 1,
                                 "reduction": "mean"},
                  "warping_crit": {"type": "CB", "weight": 1,
                                   "reduction": "mean"}},
        "test": {"test_freq": 2, "save_res": False, "res_dir": None,
                 "save_json": True, "json_dir": None,
                 "padding_mode": "reflect", "num_pad_front": 2},
        "metric": {"PSNR": {"colorspace": "y"}},
        "logger": {"log_freq": 1, "decay": 0.99, "ckpt_freq": 2},
    }
    with open(osp.join(exp_dir, "train.yml"), "w") as f:
        yaml.safe_dump(opt, f)
    return exp_dir


def test_cli_train_mode(tiny_exp):
    from tecogan_tpu.main import main

    main(["--exp_dir", tiny_exp, "--mode", "train",
          "--opt", osp.join(tiny_exp, "train.yml"), "--gpu_ids", "0,1"])

    ckpt_dir = osp.join(tiny_exp, "train", "ckpt")
    files = os.listdir(ckpt_dir)
    assert "G_iter2.npz" in files and "state_iter2.npz" in files

    json_path = osp.join(tiny_exp, "test", "metrics", "Toy_avg.json")
    with open(json_path) as f:
        j = json.load(f)
    assert "G_iter2" in j and "PSNR" in j["G_iter2"]


def test_cli_final_iter_checkpoint_when_freq_does_not_divide(tiny_exp):
    """The last iteration is always checkpointed, even when ckpt_freq
    does not divide total_iter — downstream eval (e.g.
    scripts/run_synth_campaign.py stage_eval) loads G_iter{total_iter}."""
    from tecogan_tpu.main import main

    with open(osp.join(tiny_exp, "train.yml")) as f:
        opt = yaml.safe_load(f)
    opt["train"]["total_iter"] = 3   # ckpt_freq stays 2 -> 3 % 2 != 0
    with open(osp.join(tiny_exp, "train.yml"), "w") as f:
        yaml.safe_dump(opt, f)

    main(["--exp_dir", tiny_exp, "--mode", "train",
          "--opt", osp.join(tiny_exp, "train.yml"), "--gpu_ids", "0"])

    files = os.listdir(osp.join(tiny_exp, "train", "ckpt"))
    assert "G_iter2.npz" in files          # the periodic save
    assert "G_iter3.npz" in files          # the forced final save
    assert "state_iter3.npz" in files


def test_cli_test_mode_after_training(tiny_exp):
    from tecogan_tpu.main import main

    main(["--exp_dir", tiny_exp, "--mode", "train",
          "--opt", osp.join(tiny_exp, "train.yml"), "--gpu_ids", "0"])

    # build a test.yml pointing at the saved checkpoint
    with open(osp.join(tiny_exp, "train.yml")) as f:
        opt = yaml.safe_load(f)
    opt["model"]["generator"]["load_path"] = osp.join(
        tiny_exp, "train", "ckpt", "G_iter2.npz")
    opt["test"] = {"save_res": True, "res_dir": None, "save_json": True,
                   "json_dir": None, "padding_mode": "reflect",
                   "num_pad_front": 2}
    del opt["dataset"]["train"]
    opt["dataset"]["test1"] = opt["dataset"].pop("test")
    with open(osp.join(tiny_exp, "test.yml"), "w") as f:
        yaml.safe_dump(opt, f)

    main(["--exp_dir", tiny_exp, "--mode", "test",
          "--opt", osp.join(tiny_exp, "test.yml"), "--gpu_ids", "0"])

    res = osp.join(tiny_exp, "test", "results", "Toy", "G_iter2", "seq_x")
    assert len(os.listdir(res)) == 5


def test_cli_profile_mode(tiny_exp, caplog):
    import logging

    from tecogan_tpu.main import main

    # the report goes through logging (log_info); stream handlers bind
    # whichever stderr existed at first setup, so capture via caplog
    with caplog.at_level(logging.INFO):
        main(["--exp_dir", tiny_exp, "--mode", "profile",
              "--opt", osp.join(tiny_exp, "train.yml"), "--gpu_ids", "0",
              "--lr_size", "3x16x16", "--test_speed"])
    out = "\n".join(r.getMessage() for r in caplog.records)
    # the reference profile contract: per-module FLOPs/params + overall,
    # and --test_speed adds an FPS line
    assert "FLOPs (10^9)" in out and "Parameters (10^6)" in out, out[-800:]
    assert "Overall" in out
    import re

    m = re.search(r"Speed: ([\d.]+) FPS", out)
    assert m and float(m.group(1)) > 0, out[-800:]


def test_all_shipped_configs_construct():
    """Every YAML under experiments_*/ must build its model configs."""
    import glob

    import yaml

    from tecogan_tpu.models.networks import (
        define_discriminator, define_generator)
    from tecogan_tpu.models.steps import make_train_config

    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    paths = sorted(glob.glob(osp.join(repo, "experiments_*", "**", "*.yml"),
                             recursive=True))
    assert len(paths) >= 16
    for path in paths:
        opt = yaml.safe_load(open(path))
        define_generator(opt)
        if path.endswith("train.yml"):
            make_train_config(opt)
            if "discriminator" in opt["model"]:
                define_discriminator(opt)


def test_generator_compute_dtype_key():
    """`model.generator.compute_dtype: bfloat16` reaches FRNetConfig (the
    fast serving path is CLI-selectable); bad values fail loudly."""
    import pytest

    from tecogan_tpu.models.networks import define_generator

    opt = {"scale": 4,
           "dataset": {"degradation": {"type": "BD"}},
           "model": {"generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                   "nf": 8, "nb": 2}}}
    cfg, _ = define_generator(opt)
    assert cfg.compute_dtype == "float32"
    opt["model"]["generator"]["compute_dtype"] = "bfloat16"
    cfg, _ = define_generator(opt)
    assert cfg.compute_dtype == "bfloat16"
    opt["model"]["generator"]["compute_dtype"] = "float16"
    with pytest.raises(ValueError, match="compute_dtype"):
        define_generator(opt)


def test_cli_resume_respects_global_iteration_budget(tiny_exp):
    """total_iter is the GLOBAL budget: re-launching a finished run
    auto-resumes at the saved step and trains ZERO further iterations
    (a resumed run used to train total_iter ADDITIONAL steps)."""
    from tecogan_tpu.main import main

    args = ["--exp_dir", tiny_exp, "--mode", "train",
            "--opt", osp.join(tiny_exp, "train.yml"), "--gpu_ids", "0"]
    main(args)
    ckpt_dir = osp.join(tiny_exp, "train", "ckpt")
    state_path = osp.join(ckpt_dir, "state_iter2.npz")
    mtime = os.path.getmtime(state_path)

    main(args)  # resumed run: budget already consumed
    files = os.listdir(ckpt_dir)
    assert not any(f.endswith(".npz") and ("iter3" in f or "iter4" in f)
                   for f in files), files
    assert os.path.getmtime(state_path) == mtime  # not re-written


def test_cli_resume_continues_data_stream(tmp_path, rng):
    """Resume must continue the DATA stream, not just the step counter:
    a run interrupted at iter K and resumed must end bit-identical to an
    uninterrupted run (the loaders seed shuffles/crops by (seed, epoch,
    i); restarting at epoch 0 replayed already-consumed samples)."""
    import yaml

    from tecogan_tpu.main import main
    from tecogan_tpu.utils.ckpt import load_pytree

    rec = str(tmp_path / "GT.rec")
    w = RecordWriter(rec)
    for vid in ("v0", "v1", "v2", "v3"):
        w.add_sequence(vid, (rng.random((5, 48, 48, 3)) * 255).astype(
            np.uint8))
    w.close()

    def opt_for(total_iter, ckpt_freq):
        return {
            "scale": 4, "manual_seed": 0, "verbose": False,
            "dataset": {
                "degradation": {"type": "BD", "sigma": 1.5},
                "train": {"name": "V", "seq_dir": rec, "data_type": "rgb",
                          "crop_size": 32, "batch_size_per_gpu": 2,
                          "num_worker_per_gpu": 1, "pin_memory": True},
            },
            "model": {"name": "FRVSR",
                      "generator": {"name": "FRNet", "in_nc": 3,
                                    "out_nc": 3, "nf": 8, "nb": 2}},
            "train": {"tempo_extent": 3, "start_iter": 0,
                      "total_iter": total_iter,
                      "generator": {"lr": 1e-3,
                                    "lr_schedule": {"type": "FixedLR"},
                                    "betas": [0.9, 0.999]},
                      "pixel_crit": {"type": "CB", "weight": 1,
                                     "reduction": "mean"}},
            "test": {"test_freq": 0},
            "logger": {"log_freq": 0, "decay": 0.99,
                       "ckpt_freq": ckpt_freq},
        }

    # 2 iters/epoch (4 samples, batch 2): iter 3 sits inside epoch 1
    def run(name, legs):
        d = tmp_path / name
        (d / "train" / "ckpt").mkdir(parents=True)
        for total_iter, ckpt_freq in legs:
            with open(d / "train.yml", "w") as f:
                yaml.safe_dump(opt_for(total_iter, ckpt_freq), f)
            main(["--exp_dir", str(d), "--mode", "train",
                  "--opt", str(d / "train.yml"), "--gpu_ids", "0"])
        return load_pytree(str(d / "train" / "ckpt" / "G_iter5.npz"))

    straight = run("straight", [(5, 5)])
    # interrupted at iter 3 (mid-epoch-1), then resumed to 5
    resumed = run("resumed", [(3, 3), (5, 5)])

    import jax

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), straight, resumed)


def test_cli_multi_checkpoint_sweep(tiny_exp):
    """`load_path: ckpt/*.npz` + test.{start_iter,end_iter,test_freq}
    sweeps every checkpoint through ONE model instance (params swapped via
    load_generator; datasets/metric stack/compiled executables reused) and
    writes a JSON entry per G_iter{N}."""
    import json

    import yaml

    from tecogan_tpu.main import main

    # ckpt_freq 1 -> two GENUINELY DIFFERENT checkpoints (a copied
    # checkpoint could not distinguish a stale model from a real swap)
    with open(osp.join(tiny_exp, "train.yml")) as f:
        opt = yaml.safe_load(f)
    opt["logger"]["ckpt_freq"] = 1
    with open(osp.join(tiny_exp, "train.yml"), "w") as f:
        yaml.safe_dump(opt, f)
    main(["--exp_dir", tiny_exp, "--mode", "train",
          "--opt", osp.join(tiny_exp, "train.yml"), "--gpu_ids", "0"])
    ckpt_dir = osp.join(tiny_exp, "train", "ckpt")
    assert {"G_iter1.npz", "G_iter2.npz"} <= set(os.listdir(ckpt_dir))

    opt["model"]["generator"]["load_path"] = osp.join(ckpt_dir, "*.npz")
    opt["test"].update({"start_iter": 1, "end_iter": 2, "test_freq": 1,
                        "save_res": False, "save_json": True})
    with open(osp.join(tiny_exp, "test.yml"), "w") as f:
        yaml.safe_dump(opt, f)

    main(["--exp_dir", tiny_exp, "--mode", "test",
          "--opt", osp.join(tiny_exp, "test.yml"), "--gpu_ids", "0"])

    json_path = osp.join(tiny_exp, "test", "metrics", "Toy_avg.json")
    with open(json_path) as f:
        d = json.load(f)
    assert "G_iter1" in d and "G_iter2" in d, list(d)
    # different weights -> different metrics: proves the swapped-in
    # checkpoint really was evaluated, not a stale model
    assert d["G_iter1"]["PSNR"] != d["G_iter2"]["PSNR"], d
    assert all(np.isfinite(float(v["PSNR"])) for v in d.values())
