"""CLI + YAML configuration (reference contract: `base_utils.py:14-83`).

The framework accepts the reference's experiment YAMLs unchanged; the CLI
flags mirror the reference driver so train.sh / test.sh / profile.sh work
the same way. GPU-specific flags are reinterpreted for TPU:

- ``--gpu_ids``: number/ids of local accelerator devices to span with the
  data-parallel mesh ('-1' = CPU, '0' = first device, '0,1' = two devices).
- ``--local_rank``: accepted and ignored (single-controller JAX replaces
  process-per-GPU launching).
"""

from __future__ import annotations

import argparse
import random

import numpy as np
import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="tecogan_tpu driver")
    p.add_argument("--exp_dir", type=str, required=True,
                   help="directory of the current experiment")
    p.add_argument("--mode", type=str, required=True,
                   help="train | test | profile")
    p.add_argument("--opt", type=str, required=True,
                   help="path to the option yaml file")
    p.add_argument("--gpu_ids", type=str, default="0",
                   help="device ids to use (-1 for cpu)")
    p.add_argument("--lr_size", type=str, default="3x134x320",
                   help="CxHxW size of the input frame (profile mode)")
    p.add_argument("--test_speed", action="store_true",
                   help="measure FPS in profile mode")
    p.add_argument("--local_rank", type=int, default=0,
                   help="ignored (kept for CLI compatibility)")
    return p.parse_args(argv)


def parse_configs(args):
    """Load the YAML into an opt dict and inject runtime settings."""
    with open(args.opt, "r") as f:
        opt = yaml.load(f.read(), Loader=yaml.FullLoader)

    opt["exp_dir"] = args.exp_dir
    opt["mode"] = args.mode
    opt["is_train"] = args.mode == "train"

    # device selection: ids over the local jax devices
    ids = [int(i) for i in str(args.gpu_ids).split(",") if i != ""]
    opt["device_ids"] = [] if ids == [-1] else ids
    opt["gpu_ids"] = args.gpu_ids

    setup_random_seed(opt.get("manual_seed", 2021))
    return opt


def setup_random_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)


# NOTE: YAML paths resolve against the CWD, matching the reference
# (train.sh/test.sh run from the repo root).
