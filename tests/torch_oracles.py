"""Compact torch re-implementations of the reference networks, used as
numerical oracles for checkpoint-conversion and forward parity tests.

State-dict key names intentionally match the reference modules
(`codes/models/networks/tecogan_nets.py`) so tecogan_tpu.models.convert can
consume them; the code itself is an independent, minimal reconstruction.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def _c(cin, cout, k=3, s=1, p=1, bias=True):
    return nn.Conv2d(cin, cout, k, s, p, bias=bias)


def _lrelu():
    return nn.LeakyReLU(0.2)


class TorchFNet(nn.Module):
    def __init__(self, in_nc=3):
        super().__init__()
        chans = [(2 * in_nc, 32), (32, 64), (64, 128)]
        for i, (ci, co) in enumerate(chans):
            setattr(self, f"encoder{i+1}", nn.Sequential(
                _c(ci, co), _lrelu(), _c(co, co), _lrelu(), nn.MaxPool2d(2)))
        dchans = [(128, 256), (256, 128), (128, 64)]
        for i, (ci, co) in enumerate(dchans):
            setattr(self, f"decoder{i+1}", nn.Sequential(
                _c(ci, co), _lrelu(), _c(co, co), _lrelu()))
        self.flow = nn.Sequential(_c(64, 32), _lrelu(), _c(32, 2))

    def forward(self, x_cur, x_prev):
        h = torch.cat([x_cur, x_prev], dim=1)
        for i in (1, 2, 3):
            h = getattr(self, f"encoder{i}")(h)
        for i in (1, 2, 3):
            h = F.interpolate(getattr(self, f"decoder{i}")(h),
                              scale_factor=2, mode="bilinear",
                              align_corners=False)
        return torch.tanh(self.flow(h)) * 24


class _Res(nn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv = nn.Sequential(_c(nf, nf), nn.ReLU(), _c(nf, nf))

    def forward(self, x):
        return x + self.conv(x)


class TorchSRNet(nn.Module):
    def __init__(self, in_nc=3, out_nc=3, nf=64, nb=10, scale=4):
        super().__init__()
        self.conv_in = nn.Sequential(
            _c((scale * scale + 1) * in_nc, nf), nn.ReLU())
        self.resblocks = nn.Sequential(*[_Res(nf) for _ in range(nb)])
        ups = []
        for _ in range(2 if scale == 4 else 1):
            ups += [nn.ConvTranspose2d(nf, nf, 3, 2, 1, output_padding=1),
                    nn.ReLU()]
        self.conv_up = nn.Sequential(*ups)
        self.conv_out = _c(nf, out_nc)

    def forward(self, lr_curr, hr_prev_packed, upsample):
        h = self.conv_in(torch.cat([lr_curr, hr_prev_packed], dim=1))
        h = self.conv_out(self.conv_up(self.resblocks(h)))
        return h + upsample(lr_curr)


def torch_bicubic_up(x, f, a=-0.75):
    """Reference-style separable 4-tap cubic upsampler (oracle)."""
    cubic = torch.tensor(
        [[0, a, -2 * a, a],
         [1, 0, -(a + 3), a + 2],
         [0, -a, 2 * a + 3, -(a + 2)],
         [0, 0, a, -a]], dtype=torch.float32)
    kern = torch.stack([cubic @ torch.tensor([1.0, s, s ** 2, s ** 3])
                        for s in [d / f for d in range(f)]])
    n, c, h, w = x.shape
    t = F.pad(x.reshape(n * c, 1, h, w), (1, 2, 1, 2), mode="replicate")
    t = F.conv2d(t, kern.view(f, 1, 4, 1))
    t = t.permute(0, 2, 1, 3).reshape(n * c, 1, f * h, w + 3)
    t = F.conv2d(t, kern.view(f, 1, 1, 4))
    t = t.permute(0, 2, 3, 1).reshape(n, c, f * h, f * w)
    return t


def torch_warp(x, flow):
    """grid_sample-based backward warp (align_corners=True, border)."""
    n, c, h, w = x.shape
    iu = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(n, -1, h, -1)
    iv = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(n, -1, -1, w)
    grid = torch.cat([iu, iv], 1)
    fl = torch.cat([flow[:, 0:1] / ((w - 1.0) / 2.0),
                    flow[:, 1:2] / ((h - 1.0) / 2.0)], dim=1)
    return F.grid_sample(x, (grid + fl).permute(0, 2, 3, 1), mode="bilinear",
                         padding_mode="border", align_corners=True)


def torch_s2d(x, s):
    n, c, h, w = x.shape
    r = x.reshape(n, c, h // s, s, w // s, s)
    return r.permute(0, 3, 5, 1, 2, 4).reshape(n, s * s * c, h // s, w // s)


def torch_upsample_fn(scale, degradation):
    if degradation == "BD":
        return lambda x: torch_bicubic_up(x, scale)
    return lambda x: F.interpolate(x, scale_factor=scale, mode="bilinear",
                                   align_corners=False)


class TorchFRNet(nn.Module):
    """Frame-recurrent composition oracle (reference forward_sequence/step)."""

    def __init__(self, in_nc=3, out_nc=3, nf=64, nb=10, scale=4,
                 degradation="BD"):
        super().__init__()
        self.fnet = TorchFNet(in_nc)
        self.srnet = TorchSRNet(in_nc, out_nc, nf, nb, scale)
        self.scale = scale
        self.up = torch_upsample_fn(scale, degradation)

    def forward_sequence(self, lr):
        n, t, c, h, w = lr.shape
        s = self.scale
        prev = lr[:, :-1].reshape(n * (t - 1), c, h, w)
        cur = lr[:, 1:].reshape(n * (t - 1), c, h, w)
        lr_flow = self.fnet(cur, prev)
        hr_flow = (s * self.up(lr_flow)).view(n, t - 1, 2, s * h, s * w)
        outs = [self.srnet(lr[:, 0], torch.zeros(n, s * s * c, h, w),
                           self.up)]
        for i in range(1, t):
            warped = torch_warp(outs[-1], hr_flow[:, i - 1])
            outs.append(self.srnet(lr[:, i], torch_s2d(warped, s), self.up))
        return torch.stack(outs, dim=1), hr_flow, lr_flow, prev, cur

    def step(self, lr_curr, lr_prev, hr_prev):
        h, w = lr_curr.shape[-2:]
        lr_flow = self.fnet(lr_curr, lr_prev)
        ph, pw = h - h // 8 * 8, w - w // 8 * 8
        lr_flow = F.pad(lr_flow, (0, pw, 0, ph), "reflect")
        hr_flow = self.scale * self.up(lr_flow)
        warped = torch_warp(hr_prev, hr_flow)
        return self.srnet(lr_curr, torch_s2d(warped, self.scale), self.up)


def torch_stnet_assembly(data, bi, hr_flow, crop_ratio, use_pp):
    """STNet input assembly oracle, NCHW (`tecogan_nets.py:384-463`)."""
    n, t_all, c, hh, ww = data.shape
    t = t_all // 3 * 3
    n_clip = n * (t // 3)
    s_size = hh
    c_size = int(s_size * crop_ratio)
    n_pad = (s_size - c_size) // 2

    flow_bw = hr_flow[:, 0:t:3]
    flow_idle = torch.zeros_like(flow_bw)
    assert use_pp, "oracle implements the ping-pong path only"
    flow_fw = hr_flow.flip(1)[:, 1:t:3]
    merge = torch.stack([flow_bw, flow_idle, flow_fw], dim=2)
    merge = merge.reshape(n_clip * 3, 2, hh, ww).detach()

    def pack(x):
        x = x[:, :t].reshape(n_clip, 3, c, hh, ww)
        return x.permute(0, 2, 1, 3, 4).reshape(n_clip, c * 3, hh, ww)

    cond = pack(bi)
    orig = pack(data)
    warped = torch_warp(data[:, :t].reshape(n * t, c, hh, ww), merge)
    warped = pack(warped.view(n, t, c, hh, ww))
    warped = F.pad(
        warped[..., n_pad:n_pad + c_size, n_pad:n_pad + c_size],
        (n_pad,) * 4, mode="constant")
    return torch.cat([orig, warped, cond], dim=1), merge


class TorchDTrunk(nn.Module):
    """Discriminator conv trunk + dense head (STNet/SNet share it)."""

    def __init__(self, cin, spatial_size=128):
        super().__init__()
        self.conv_in = nn.Sequential(_c(cin, 64), _lrelu())
        blocks = {}
        chans = [(64, 64), (64, 64), (64, 128), (128, 256)]
        body = []
        for i, (ci, co) in enumerate(chans):
            body.append((f"block{i+1}", nn.Sequential(
                nn.Conv2d(ci, co, 4, 2, 1, bias=False),
                nn.BatchNorm2d(co, affine=True), _lrelu())))
        self.discriminator_block = nn.Sequential()
        for name, mod in body:
            self.discriminator_block.add_module(name, mod)
        f = spatial_size // 16
        self.dense = nn.Linear(256 * f * f, 1)

    def forward(self, x):
        h = self.conv_in(x)
        feats = []
        for blk in self.discriminator_block:
            h = blk(h)
            feats.append(h)
        return self.dense(h.flatten(1)), feats


def rand_alexnet_sd(rng):
    """Random weights in the torchvision AlexNet state_dict layout (numpy);
    the single source for the conv specs/feature indices used by the LPIPS
    converter tests."""
    import numpy as np
    specs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3),
             (256, 256, 3)]
    idxs = [0, 3, 6, 8, 10]
    sd = {}
    for (co, ci, k), i in zip(specs, idxs):
        sd[f"features.{i}.weight"] = (
            rng.standard_normal((co, ci, k, k)).astype(np.float32) * 0.05)
        sd[f"features.{i}.bias"] = rng.standard_normal(co).astype(
            np.float32) * 0.1
    return sd


def rand_vgg19_sd(rng):
    """Random weights in the torchvision VGG19 `features` state_dict layout
    (numpy), matching `tecogan_tpu.models.networks.vgg._CFG`: 16 convs with
    pools after {2, 4, 8, 12, 16} convs. Used to rehearse the conversion
    pipeline when the real ImageNet checkpoint is unavailable."""
    import numpy as np
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    sd = {}
    seq_idx, cin = 0, 3
    for v in cfg:
        if v == "M":
            seq_idx += 1
            continue
        sd[f"features.{seq_idx}.weight"] = (
            rng.standard_normal((v, cin, 3, 3)).astype(np.float32) * 0.02)
        sd[f"features.{seq_idx}.bias"] = rng.standard_normal(v).astype(
            np.float32) * 0.1
        seq_idx += 2
        cin = v
    return sd


def rand_vgg16_sd(rng):
    """Random weights in the torchvision VGG16 `features` state_dict
    layout (numpy): 13 3x3 convs in blocks of (2,2,3,3,3) with pools
    between blocks — the LPIPS 'vgg' backbone
    (`codes/metrics/LPIPS/models/pretrained_networks.py` vgg16)."""
    import numpy as np
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    sd = {}
    cin, idx = 3, 0
    for spec in cfg:
        if spec == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = (
            rng.standard_normal((spec, cin, 3, 3)).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = rng.standard_normal(spec).astype(
            np.float32) * 0.1
        cin = spec
        idx += 2  # conv + relu
    return sd


# (feature idx, cin, squeeze, expand) of squeezenet1_1's 8 Fire modules
SQUEEZE_FIRES = [(3, 64, 16, 64), (4, 128, 16, 64), (6, 128, 32, 128),
                 (7, 256, 32, 128), (9, 256, 48, 192), (10, 384, 48, 192),
                 (11, 384, 64, 256), (12, 512, 64, 256)]


def rand_squeezenet_sd(rng):
    """Random weights in the torchvision SqueezeNet1.1 `features`
    state_dict layout (numpy) — the LPIPS 'squeeze' backbone."""
    import numpy as np

    def conv(co, ci, k):
        return (rng.standard_normal((co, ci, k, k)).astype(np.float32) * 0.05,
                rng.standard_normal(co).astype(np.float32) * 0.1)

    sd = {}
    sd["features.0.weight"], sd["features.0.bias"] = conv(64, 3, 3)
    for i, cin, sq, ex in SQUEEZE_FIRES:
        for part, co, ci, k in ((f"squeeze", sq, cin, 1),
                                (f"expand1x1", ex, sq, 1),
                                (f"expand3x3", ex, sq, 3)):
            w, b = conv(co, ci, k)
            sd[f"features.{i}.{part}.weight"] = w
            sd[f"features.{i}.{part}.bias"] = b
    return sd
