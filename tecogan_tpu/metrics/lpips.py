"""LPIPS (net-lin) perceptual distance — JAX port.

Architecture per LPIPS v0.1 (`codes/metrics/LPIPS/models/networks_basic.py`):
shift/scale input normalisation, a frozen AlexNet (or VGG16) feature trunk
tapped after each ReLU stage, channel-unit-normalised feature differences,
squared, 1x1 learned linear heads, spatial average, summed over stages.

Weights: the learned linear heads load from the official v0.1 checkpoints
(e.g. the reference's vendored ``alex.pth``); the backbone needs ImageNet
AlexNet weights (torchvision format). Neither is bundled here — paths are
searched via ``find_lpips_weights`` and the metric is cleanly gated when
they are absent (this environment has no network egress).
"""

from __future__ import annotations

import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn

__all__ = ["LPIPS", "find_lpips_weights", "convert_alexnet",
           "convert_lin_heads"]

# input normalisation (networks_basic.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet features: (out_ch, kernel, stride, pad); M = maxpool3/2.
# torchvision ends with a trailing maxpool, but the 5 LPIPS taps are all
# post-ReLU (pre-pool), so it is omitted — pure dead work for this use
_ALEX_CFG = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M", (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
# taps: after each ReLU (i.e. after conv i for i in 0..4)
_ALEX_CHANS = [64, 192, 384, 256, 256]


def _max_pool_3_2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def alexnet_features(params, x):
    """x (n, h, w, 3) -> 5 tapped post-ReLU feature maps."""
    taps = []
    ci = 0
    for spec in _ALEX_CFG:
        if spec == "M":
            x = _max_pool_3_2(x)
            continue
        cout, k, s, p = spec
        x = nn.conv2d(params[f"conv{ci}"], x, stride=s, padding=p)
        x = nn.relu(x)
        taps.append(x)
        ci += 1
    return taps


def convert_alexnet(sd):
    """torchvision alexnet state_dict -> params pytree (features only)."""
    idxs = [0, 3, 6, 8, 10]
    p = {}
    for ci, i in enumerate(idxs):
        p[f"conv{ci}"] = {
            "w": np.ascontiguousarray(
                np.asarray(sd[f"features.{i}.weight"]).transpose(2, 3, 1, 0)),
            "b": np.asarray(sd[f"features.{i}.bias"]),
        }
    return p


def convert_lin_heads(sd):
    """LPIPS v0.1 lin checkpoint -> list of (1,1,C,1) HWIO kernels."""
    heads = []
    for i in range(5):
        w = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        heads.append(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
    return heads


def find_lpips_weights(search_dirs=("pretrained_models/lpips",)):
    """Locate (backbone.npz|pth, lin heads .pth) on disk; None if missing."""
    candidates = list(search_dirs) + [
        "/root/reference/codes/metrics/LPIPS/models/weights/v0.1",
    ]
    backbone = lin = None
    for d in candidates:
        for name in ("alexnet.npz", "alexnet.pth", "alexnet-owt.pth"):
            p = osp.join(d, name)
            if backbone is None and osp.exists(p):
                backbone = p
        p = osp.join(d, "alex.pth")
        if lin is None and osp.exists(p):
            lin = p
    return backbone, lin


class LPIPS:
    """Callable LPIPS distance. Raises at construction if weights missing."""

    def __init__(self, net: str = "alex", backbone_path=None, lin_path=None):
        if net != "alex":
            raise NotImplementedError(
                f"LPIPS backbone '{net}' not implemented (alex only)")
        auto_bb, auto_lin = find_lpips_weights()
        backbone_path = backbone_path or auto_bb
        lin_path = lin_path or auto_lin
        if backbone_path is None or lin_path is None:
            raise FileNotFoundError(
                "LPIPS weights unavailable: need an ImageNet AlexNet "
                "checkpoint (torchvision format or converted .npz) and the "
                "LPIPS v0.1 'alex.pth' linear heads under "
                "pretrained_models/lpips/")
        if backbone_path.endswith(".npz"):
            from ..utils.ckpt import load_pytree

            self.backbone = load_pytree(backbone_path)
        else:
            import torch

            sd = torch.load(backbone_path, map_location="cpu",
                            weights_only=True)
            self.backbone = convert_alexnet(
                {k: v.numpy() for k, v in sd.items()})
        if lin_path.endswith(".npz"):
            from ..utils.ckpt import load_pytree

            self.lin = load_pytree(lin_path)
        else:
            import torch  # .pth lin heads need torch's unpickler

            lin_sd = torch.load(lin_path, map_location="cpu",
                                weights_only=True)
            self.lin = convert_lin_heads(
                {k: v.numpy() for k, v in lin_sd.items()})
        self._fn = jax.jit(self._distance)

    def _distance(self, x, y):
        """x, y: (n, h, w, 3) in [-1, 1] -> (n,) LPIPS distances."""
        def norm_in(v):
            return (v - _SHIFT) / _SCALE

        fx = alexnet_features(self.backbone, norm_in(x))
        fy = alexnet_features(self.backbone, norm_in(y))
        total = 0.0
        for tx, ty, head in zip(fx, fy, self.lin):
            nx = tx * jax.lax.rsqrt(
                jnp.sum(tx * tx, axis=-1, keepdims=True) + 1e-10)
            ny = ty * jax.lax.rsqrt(
                jnp.sum(ty * ty, axis=-1, keepdims=True) + 1e-10)
            d = (nx - ny) ** 2
            val = jax.lax.conv_general_dilated(
                d, jnp.asarray(head, d.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return total

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> np.ndarray:
        """uint8 RGB (h, w, c) or (n, h, w, c) images -> distances."""
        a = np.asarray(img_a, np.float32)
        b = np.asarray(img_b, np.float32)
        if a.ndim == 3:
            a, b = a[None], b[None]
        a = a * (2.0 / 255.0) - 1.0
        b = b * (2.0 / 255.0) - 1.0
        return np.asarray(self._fn(jnp.asarray(a), jnp.asarray(b)))
