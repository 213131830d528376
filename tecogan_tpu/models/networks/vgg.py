"""VGG19 feature extractor for the perceptual loss (JAX port).

Equivalent of the reference's frozen torchvision VGG19 feature trunk with
ImageNet normalisation and taps after the ReLUs at feature indices
{8, 17, 26, 35} = conv2_2, conv3_4, conv4_4, conv5_4
(`codes/models/networks/vgg_nets.py:6-38`).

Pretrained weights are not bundled (this environment has no network egress);
``tecogan_tpu.models.convert.convert_vgg19`` converts a torchvision
state_dict when one is available on disk. With random weights the module is
still exercisable and numerics-tested against torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn

# torchvision vgg19.features layout: conv indices and pool positions
_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

# plain numpy on purpose: a module-level jnp.array would initialise the
# XLA backend at import time, which breaks jax.distributed.initialize()
# in multi-host launches (main.py imports models before it can run)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def feature_index_map():
    """Map torchvision `features` sequential index -> our conv number."""
    mapping = {}
    seq_idx, conv_idx = 0, 0
    for v in _CFG:
        if v == "M":
            seq_idx += 1
        else:
            mapping[seq_idx] = conv_idx  # conv at seq_idx, relu at seq_idx+1
            seq_idx += 2
            conv_idx += 1
    return mapping


def init_vgg19(key):
    params = {}
    cin = 3
    keys = iter(jax.random.split(key, 32))
    ci = 0
    for v in _CFG:
        if v == "M":
            continue
        params[f"conv{ci}"] = nn.init_conv(next(keys), 3, 3, cin, v)
        cin = v
        ci += 1
    return params


def vgg19_features(params, x: jnp.ndarray,
                   feature_indexs=(8, 17, 26, 35)):
    """x (n, h, w, 3) in [0, 1] -> list of tapped post-ReLU feature maps.

    ``feature_indexs`` uses torchvision `features` sequential indices (the
    reference's convention); taps fire after the ReLU at each index.
    """
    want = set(feature_indexs)
    out = (x - _IMAGENET_MEAN.astype(x.dtype)) / _IMAGENET_STD.astype(x.dtype)
    taps = []
    seq_idx, ci = 0, 0
    for v in _CFG:
        if v == "M":
            if seq_idx in want:
                raise ValueError("taps at pooling layers are unsupported")
            out = nn.max_pool_2x2(out)
            seq_idx += 1
            continue
        out = nn.conv2d(params[f"conv{ci}"], out, padding=1)
        if seq_idx in want:  # tap after conv (pre-ReLU) — not used by ref
            taps.append(out)
        out = nn.relu(out)
        if seq_idx + 1 in want:
            taps.append(out)
        seq_idx += 2
        ci += 1
        if seq_idx > max(want) + 1:
            break
    return taps
