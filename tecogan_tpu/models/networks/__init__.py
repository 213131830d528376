"""Network factories (reference contract: `codes/models/networks/__init__.py`).

``define_generator`` / ``define_discriminator`` map the YAML model blocks to
(config, init_fn) pairs; parameters are created explicitly by the caller so
model wrappers control RNG and sharding.
"""

from .fnet import fnet_apply, init_fnet
from .srnet import init_srnet, srnet_apply
from .frnet import (
    FRNetConfig,
    forward_sequence,
    infer_sequence,
    infer_sequence_batch,
    init_frnet,
    step,
)
from .frnet_sp import infer_sequence_sp
from .discriminators import (
    SNetConfig,
    STNetConfig,
    init_snet,
    init_stnet,
    snet_apply,
    stnet_apply,
    build_d_input,
    build_flow_merge,
    trunk_apply,
)
from .vgg import init_vgg19, vgg19_features


def define_generator(opt):
    """opt -> (FRNetConfig, init_fn). Supports generator name 'frnet'."""
    g = opt["model"]["generator"]
    name = g["name"].lower()
    if name != "frnet":
        raise ValueError(f"Unrecognized generator: {g['name']}")
    cfg = FRNetConfig(
        in_nc=g["in_nc"],
        out_nc=g["out_nc"],
        nf=g["nf"],
        nb=g["nb"],
        scale=opt["scale"],
        degradation=opt["dataset"]["degradation"]["type"],
        # BPTT rematerialisation: True bounds training memory at
        # O(t * one-frame activations); False is ~1.5% faster at the
        # reference geometry (measured, PARITY.md) but stores the whole
        # unroll's activations — set `remat: false` for small crops
        remat=g.get("remat", True),
        # INFERENCE precision (training precision is train.mixed_precision):
        # 'bfloat16' enables the fast serving path (fp32 warp coordinates
        # and output quantisation are kept regardless; drift bounded by
        # tests/test_golden.py). Default fp32 = reference numerics.
        compute_dtype=g.get("compute_dtype", "float32"),
    )
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"generator.compute_dtype must be float32|bfloat16, got "
            f"{cfg.compute_dtype!r}")
    return cfg, (lambda key: init_frnet(key, cfg))


def define_discriminator(opt):
    """opt -> (config, init_fn, apply_fn) for 'stnet' | 'snet'."""
    d = opt["model"]["discriminator"]
    degradation = opt["dataset"]["degradation"]["type"]
    train_ds = opt["dataset"]["train"]
    spatial_size = (
        train_ds["crop_size"] if degradation == "BD"
        else train_ds["gt_crop_size"]
    )
    name = d["name"].lower()
    if name == "stnet":
        cfg = STNetConfig(
            in_nc=d["in_nc"],
            spatial_size=spatial_size,
            tempo_range=d["tempo_range"],
            degradation=degradation,
            scale=opt["scale"],
        )
        return cfg, (lambda key: init_stnet(key, cfg)), stnet_apply
    if name == "snet":
        cfg = SNetConfig(
            in_nc=d["in_nc"],
            spatial_size=spatial_size,
            use_cond=d["use_cond"],
        )
        return cfg, (lambda key: init_snet(key, cfg)), snet_apply
    raise ValueError(f"Unrecognized discriminator: {d['name']}")


__all__ = [
    "FRNetConfig",
    "STNetConfig",
    "SNetConfig",
    "define_generator",
    "define_discriminator",
    "init_frnet",
    "init_fnet",
    "init_srnet",
    "init_stnet",
    "init_snet",
    "init_vgg19",
    "fnet_apply",
    "srnet_apply",
    "stnet_apply",
    "snet_apply",
    "build_d_input",
    "trunk_apply",
    "vgg19_features",
    "forward_sequence",
    "infer_sequence",
    "infer_sequence_batch",
    "infer_sequence_sp",
    "step",
    "build_flow_merge",
]
