"""Checkpoint conversion: reference PyTorch state_dicts -> param pytrees.

Layout rules (the single place where NCHW/NHWC decisions are recorded):

- Conv2d weight (out, in, kh, kw)            -> HWIO (kh, kw, in, out)
- ConvTranspose2d weight (in, out, kh, kw)   -> spatially flipped HWIO kernel
  of the equivalent fractionally-strided convolution (see
  ``nn.conv2d_transpose``): flip (kh, kw), then (kh, kw, in, out).
- Linear weight (dout, din) whose input was a flattened NCHW feature map of
  shape (c, h, w)                            -> re-ordered for NHWC flatten
  (h, w, c), stored as (din, dout).
- BatchNorm2d weight/bias/running_mean/running_var -> scale/bias/mean/var.

Reference param names follow `codes/models/networks/tecogan_nets.py`
(e.g. ``fnet.encoder1.0.weight``, ``srnet.resblocks.3.conv.2.bias``,
``conv_in.0.weight``); torch is only needed inside these functions.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "load_state_dict",
    "convert_frnet",
    "convert_stnet",
    "convert_snet",
    "convert_vgg19",
    "export_frnet",
]


def load_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # np.array(copy=True): tensor.numpy() returns a VIEW of torch storage;
    # a zero-copy jax.Array over it would alias mutable torch memory
    return {k: np.array(v.numpy()) for k, v in sd.items()}


def _conv(sd, name):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["b"] = np.array(sd[f"{name}.bias"])
    return p


def _convt(sd, name):
    w = sd[f"{name}.weight"]  # (in, out, kh, kw)
    w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # flip, -> (kh, kw, in, out)
    return {"w": np.ascontiguousarray(w), "b": np.array(sd[f"{name}.bias"])}


def _dense_from_nchw(sd, name, c, h, w):
    wt = sd[f"{name}.weight"]  # (dout, c*h*w)
    dout = wt.shape[0]
    wt = wt.reshape(dout, c, h, w).transpose(0, 2, 3, 1).reshape(dout, -1)
    return {"w": np.ascontiguousarray(wt.T), "b": np.array(sd[f"{name}.bias"])}


def _bn(sd, name):
    return {
        "scale": np.array(sd[f"{name}.weight"]),
        "bias": np.array(sd[f"{name}.bias"]),
        "mean": np.array(sd[f"{name}.running_mean"]),
        "var": np.array(sd[f"{name}.running_var"]),
    }


# --------------------------------------------------------------------------
# generator
# --------------------------------------------------------------------------

def _convert_fnet(sd, prefix=""):
    p = {}
    for li in range(3):
        p[f"enc{li}_0"] = _conv(sd, f"{prefix}encoder{li+1}.0")
        p[f"enc{li}_1"] = _conv(sd, f"{prefix}encoder{li+1}.2")
        p[f"dec{li}_0"] = _conv(sd, f"{prefix}decoder{li+1}.0")
        p[f"dec{li}_1"] = _conv(sd, f"{prefix}decoder{li+1}.2")
    p["flow_0"] = _conv(sd, f"{prefix}flow.0")
    p["flow_1"] = _conv(sd, f"{prefix}flow.2")
    return p


def _convert_srnet(sd, nb, scale, prefix=""):
    p = {"conv_in": _conv(sd, f"{prefix}conv_in.0")}
    for bi in range(nb):
        p[f"res{bi}_0"] = _conv(sd, f"{prefix}resblocks.{bi}.conv.0")
        p[f"res{bi}_1"] = _conv(sd, f"{prefix}resblocks.{bi}.conv.2")
    for ui in range(2 if scale == 4 else 1):
        p[f"up{ui}"] = _convt(sd, f"{prefix}conv_up.{2*ui}")
    p["conv_out"] = _conv(sd, f"{prefix}conv_out")
    return p


def convert_frnet(sd, nb: int = 10, scale: int = 4):
    """FRNet state_dict (G_iter*.pth) -> {'fnet', 'srnet'} pytree."""
    return {
        "fnet": _convert_fnet(sd, "fnet."),
        "srnet": _convert_srnet(sd, nb, scale, "srnet."),
    }


def export_frnet(params, nb: int = 10, scale: int = 4):
    """Inverse of convert_frnet (for writing reference-compatible .pth)."""
    import torch

    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(p["w"]).transpose(3, 2, 0, 1)))
        if "b" in p:
            sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]))

    def put_convt(name, p):
        w = np.asarray(p["w"]).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        sd[f"{name}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd[f"{name}.bias"] = torch.from_numpy(np.asarray(p["b"]))

    f = params["fnet"]
    for li in range(3):
        put_conv(f"fnet.encoder{li+1}.0", f[f"enc{li}_0"])
        put_conv(f"fnet.encoder{li+1}.2", f[f"enc{li}_1"])
        put_conv(f"fnet.decoder{li+1}.0", f[f"dec{li}_0"])
        put_conv(f"fnet.decoder{li+1}.2", f[f"dec{li}_1"])
    put_conv("fnet.flow.0", f["flow_0"])
    put_conv("fnet.flow.2", f["flow_1"])
    s = params["srnet"]
    put_conv("srnet.conv_in.0", s["conv_in"])
    for bi in range(nb):
        put_conv(f"srnet.resblocks.{bi}.conv.0", s[f"res{bi}_0"])
        put_conv(f"srnet.resblocks.{bi}.conv.2", s[f"res{bi}_1"])
    for ui in range(2 if scale == 4 else 1):
        put_convt(f"srnet.conv_up.{2*ui}", s[f"up{ui}"])
    put_conv("srnet.conv_out", s["conv_out"])
    return sd


# --------------------------------------------------------------------------
# discriminators
# --------------------------------------------------------------------------

def _convert_trunk(sd, spatial_size):
    p = {"conv_in": _conv(sd, "conv_in.0")}
    chans = [64, 64, 128, 256]
    for bi in range(4):
        p[f"block{bi}"] = {
            "conv": _conv(sd, f"discriminator_block.block{bi+1}.0"),
            "bn": _bn(sd, f"discriminator_block.block{bi+1}.1"),
        }
    feat = spatial_size // 16
    p["dense"] = _dense_from_nchw(sd, "dense", chans[-1], feat, feat)
    return p


def convert_stnet(sd, spatial_size: int = 128):
    return _convert_trunk(sd, spatial_size)


def convert_snet(sd, spatial_size: int = 128):
    return _convert_trunk(sd, spatial_size)


# --------------------------------------------------------------------------
# VGG19 (torchvision)
# --------------------------------------------------------------------------

def convert_vgg19(sd):
    """torchvision vgg19 state_dict -> {'conv{i}': {...}} pytree."""
    from .networks.vgg import feature_index_map

    p = {}
    for seq_idx, ci in feature_index_map().items():
        p[f"conv{ci}"] = {
            "w": np.ascontiguousarray(
                sd[f"features.{seq_idx}.weight"].transpose(2, 3, 1, 0)),
            "b": np.array(sd[f"features.{seq_idx}.bias"]),
        }
    return p
