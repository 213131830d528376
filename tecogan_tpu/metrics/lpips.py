"""LPIPS (net-lin) perceptual distance — JAX port, all three backbones.

Architecture per LPIPS v0.1 (`codes/metrics/LPIPS/models/networks_basic.py:27-101`):
shift/scale input normalisation, a frozen feature trunk — AlexNet, VGG16
or SqueezeNet1.1 (`codes/metrics/LPIPS/models/pretrained_networks.py`) —
tapped after each ReLU stage (5 taps; 7 for squeeze), channel-unit-
normalised feature differences, squared, 1x1 learned linear heads,
spatial average, summed over stages.

Weights: the learned linear heads load from the official v0.1 checkpoints
(``{alex,vgg,squeeze}.pth`` — the reference vendors all three and they are
auto-discovered from its tree); the backbone needs ImageNet weights in
torchvision state_dict format. Backbones are not bundled here — paths are
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
           "convert_vgg16", "convert_squeezenet", "convert_lin_heads",
           "alexnet_features", "vgg16_features", "squeezenet_features"]

# input normalisation (networks_basic.py ScalingLayer constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet features: (out_ch, kernel, stride, pad); M = maxpool3/2.
# torchvision ends with a trailing maxpool, but the 5 LPIPS taps are all
# post-ReLU (pre-pool), so it is omitted — pure dead work for this use
_ALEX_CFG = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M", (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]

# per-net tap channel counts (networks_basic.py:41-47)
_NET_CHANS = {
    "alex": [64, 192, 384, 256, 256],
    "vgg": [64, 128, 256, 512, 512],
    "squeeze": [64, 128, 256, 384, 384, 512, 512],
}
# (backbone checkpoint stem, lin-head checkpoint stem) per net
_NET_FILES = {
    "alex": ("alexnet", "alex"),
    "vgg": ("vgg16", "vgg"),
    "squeeze": ("squeezenet1_1", "squeeze"),
}


def _canon_net(net: str) -> str:
    net = {"vgg16": "vgg"}.get(net, net)  # reference accepts both spellings
    if net not in _NET_CHANS:
        raise ValueError(f"unknown LPIPS backbone {net!r}; expected one of "
                         f"{sorted(_NET_CHANS)} (or 'vgg16')")
    return net


def _max_pool(x, k, s, ceil=False):
    if ceil:
        # torch ceil_mode: pad bottom/right with -inf so the final partial
        # window is kept (torchvision squeezenet1_1 pools are ceil_mode)
        def pad_amt(n):
            r = (n - k) % s
            return (s - r) % s if (n - k) % s else 0

        ph, pw = pad_amt(x.shape[1]), pad_amt(x.shape[2])
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        constant_values=-np.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), "VALID")


def _max_pool_3_2(x):
    return _max_pool(x, 3, 2)


def alexnet_features(params, x):
    """x (n, h, w, 3) -> 5 tapped post-ReLU feature maps
    (pretrained_networks.py alexnet: taps after every ReLU)."""
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


# torchvision vgg16.features: 13 3x3/pad-1 convs in blocks of (2,2,3,3,3)
# with 2x2 maxpools between blocks; LPIPS taps relu1_2/2_2/3_3/4_3/5_3 =
# the last ReLU of each block (pretrained_networks.py vgg16 slices
# [0:4),[4:9),[9:16),[16:23),[23:30))
_VGG16_BLOCKS = [2, 2, 3, 3, 3]


def vgg16_features(params, x):
    """x (n, h, w, 3) -> 5 tapped feature maps (relu{1_2,2_2,3_3,4_3,5_3})."""
    taps = []
    ci = 0
    for bi, n_convs in enumerate(_VGG16_BLOCKS):
        if bi:
            x = _max_pool(x, 2, 2)
        for _ in range(n_convs):
            x = nn.relu(nn.conv2d(params[f"conv{ci}"], x, padding=1))
            ci += 1
        taps.append(x)
    return taps


def _fire(p, x):
    """SqueezeNet Fire: 1x1 squeeze -> relu -> [1x1 expand, 3x3 expand]
    each -> relu, channel-concatenated."""
    s = nn.relu(nn.conv2d(p["squeeze"], x))
    e1 = nn.relu(nn.conv2d(p["expand1x1"], s))
    e3 = nn.relu(nn.conv2d(p["expand3x3"], s, padding=1))
    return jnp.concatenate([e1, e3], axis=-1)


def squeezenet_features(params, x):
    """x (n, h, w, 3) -> 7 tapped feature maps.

    torchvision squeezenet1_1.features = conv(3->64, k3, s2) + ReLU,
    pool, fire x2, pool, fire x2, pool, fire x4 (pools are 3/2
    ceil_mode); LPIPS taps after the first ReLU, after fire pairs 2/4,
    then after each of the last four fires (pretrained_networks.py
    squeezenet slices)."""
    taps = []
    x = nn.relu(nn.conv2d(params["conv0"], x, stride=2, padding=0))
    taps.append(x)
    x = _max_pool(x, 3, 2, ceil=True)
    x = _fire(params["fire3"], x)
    x = _fire(params["fire4"], x)
    taps.append(x)
    x = _max_pool(x, 3, 2, ceil=True)
    x = _fire(params["fire6"], x)
    x = _fire(params["fire7"], x)
    taps.append(x)
    x = _max_pool(x, 3, 2, ceil=True)
    x = _fire(params["fire9"], x)
    taps.append(x)
    x = _fire(params["fire10"], x)
    taps.append(x)
    x = _fire(params["fire11"], x)
    taps.append(x)
    x = _fire(params["fire12"], x)
    taps.append(x)
    return taps


_FEATURE_FNS = {
    "alex": alexnet_features,
    "vgg": vgg16_features,
    "squeeze": squeezenet_features,
}


def _oihw_to_hwio(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def convert_alexnet(sd):
    """torchvision alexnet state_dict -> params pytree (features only)."""
    idxs = [0, 3, 6, 8, 10]
    p = {}
    for ci, i in enumerate(idxs):
        p[f"conv{ci}"] = {
            "w": _oihw_to_hwio(sd[f"features.{i}.weight"]),
            "b": np.asarray(sd[f"features.{i}.bias"]),
        }
    return p


def convert_vgg16(sd):
    """torchvision vgg16 state_dict -> params pytree (features only)."""
    idxs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    p = {}
    for ci, i in enumerate(idxs):
        p[f"conv{ci}"] = {
            "w": _oihw_to_hwio(sd[f"features.{i}.weight"]),
            "b": np.asarray(sd[f"features.{i}.bias"]),
        }
    return p


def convert_squeezenet(sd):
    """torchvision squeezenet1_1 state_dict -> params pytree."""
    p = {"conv0": {"w": _oihw_to_hwio(sd["features.0.weight"]),
                   "b": np.asarray(sd["features.0.bias"])}}
    for i in (3, 4, 6, 7, 9, 10, 11, 12):
        p[f"fire{i}"] = {
            part: {"w": _oihw_to_hwio(sd[f"features.{i}.{part}.weight"]),
                   "b": np.asarray(sd[f"features.{i}.{part}.bias"])}
            for part in ("squeeze", "expand1x1", "expand3x3")
        }
    return p


_CONVERTERS = {
    "alex": convert_alexnet,
    "vgg": convert_vgg16,
    "squeeze": convert_squeezenet,
}


def convert_lin_heads(sd, n_taps: int = 5):
    """LPIPS v0.1 lin checkpoint -> list of (1,1,C,1) HWIO kernels."""
    heads = []
    for i in range(n_taps):
        w = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        heads.append(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
    return heads


def find_lpips_weights(search_dirs=("pretrained_models/lpips",),
                       net: str = "alex"):
    """Locate (backbone.npz|pth, lin heads .pth|.npz) on disk for the given
    backbone; None per missing piece."""
    net = _canon_net(net)
    bb_stem, lin_stem = _NET_FILES[net]
    candidates = list(search_dirs) + [
        "/root/reference/codes/metrics/LPIPS/models/weights/v0.1",
    ]
    bb_names = [f"{bb_stem}.npz", f"{bb_stem}.pth"]
    if net == "alex":
        bb_names.append("alexnet-owt.pth")
    backbone = lin = None
    for d in candidates:
        for name in bb_names:
            p = osp.join(d, name)
            if backbone is None and osp.exists(p):
                backbone = p
        for name in (f"{lin_stem}.npz", f"{lin_stem}.pth"):
            p = osp.join(d, name)
            if lin is None and osp.exists(p):
                lin = p
    return backbone, lin


class LPIPS:
    """Callable LPIPS distance. Raises at construction if weights missing.

    ``net``: 'alex' (shipped configs), 'vgg'/'vgg16' or 'squeeze' — the
    same choices as the reference's vendored v0.1
    (`networks_basic.py:27-101`).

    ``spatial``: when True, returns PER-PIXEL distance maps instead of
    scalars — each stage's 1x1-head map is bilinearly upsampled
    (half-pixel, torch align_corners=False) to the input size and the
    stages are summed (`networks_basic.py:75-78`). Shipped configs all
    set ``spatial: false``; the mode exists for API completeness with
    the vendored reference."""

    def __init__(self, net: str = "alex", backbone_path=None, lin_path=None,
                 spatial: bool = False):
        self.net = net = _canon_net(net)
        self.spatial = bool(spatial)
        auto_bb, auto_lin = find_lpips_weights(net=net)
        backbone_path = backbone_path or auto_bb
        lin_path = lin_path or auto_lin
        if backbone_path is None or lin_path is None:
            bb_stem, lin_stem = _NET_FILES[net]
            raise FileNotFoundError(
                f"LPIPS weights unavailable for net='{net}': need an "
                f"ImageNet backbone checkpoint ('{bb_stem}.pth' torchvision "
                f"format or converted .npz) and the LPIPS v0.1 "
                f"'{lin_stem}.pth' linear heads under pretrained_models/lpips/")
        if backbone_path.endswith(".npz"):
            from ..utils.ckpt import load_pytree

            self.backbone = load_pytree(backbone_path)
        else:
            import torch

            sd = torch.load(backbone_path, map_location="cpu",
                            weights_only=True)
            self.backbone = _CONVERTERS[net](
                {k: v.numpy() for k, v in sd.items()})
        n_taps = len(_NET_CHANS[net])
        if lin_path.endswith(".npz"):
            from ..utils.ckpt import load_pytree

            self.lin = load_pytree(lin_path)
        else:
            import torch  # .pth lin heads need torch's unpickler

            lin_sd = torch.load(lin_path, map_location="cpu",
                                weights_only=True)
            self.lin = convert_lin_heads(
                {k: v.numpy() for k, v in lin_sd.items()}, n_taps)
        got_chans = [int(np.asarray(h).shape[2]) for h in self.lin]
        if got_chans != _NET_CHANS[net]:
            raise ValueError(
                f"lin heads at {lin_path} have channels {got_chans}, but "
                f"net='{net}' taps are {_NET_CHANS[net]} — wrong checkpoint "
                f"for this backbone?")
        self._features = _FEATURE_FNS[net]
        self._fn = jax.jit(self._distance)

    def _distance(self, x, y):
        """x, y: (n, h, w, 3) in [-1, 1] -> (n,) LPIPS distances, or
        (n, h, w) per-pixel maps when ``spatial``."""
        from ..ops.resize import apply_separable, resize_matrix

        def norm_in(v):
            return (v - _SHIFT) / _SCALE

        in_h, in_w = x.shape[1], x.shape[2]
        fx = self._features(self.backbone, norm_in(x))
        fy = self._features(self.backbone, norm_in(y))
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
            if self.spatial:
                mh = resize_matrix("bilinear_fractional", val.shape[1],
                                   out_size=in_h)
                mw = resize_matrix("bilinear_fractional", val.shape[2],
                                   out_size=in_w)
                total = total + apply_separable(val, mh, mw)[..., 0]
            else:
                total = total + jnp.mean(val, axis=(1, 2, 3))
        return total

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> np.ndarray:
        """uint8 RGB (h, w, c) or (n, h, w, c) images -> (n,) distances,
        or (n, h, w) per-pixel maps when ``spatial``."""
        a = np.asarray(img_a, np.float32)
        b = np.asarray(img_b, np.float32)
        if a.ndim == 3:
            a, b = a[None], b[None]
        a = a * (2.0 / 255.0) - 1.0
        b = b * (2.0 / 255.0) - 1.0
        return np.asarray(self._fn(jnp.asarray(a), jnp.asarray(b)))
