"""Discriminators: spatio-temporal (STNet) and spatial (SNet).

Behavioural spec from the reference (`tecogan_nets.py:318-534`):

STNet consumes 3-frame clips as a 27-channel stack of three triplets —
(original frames, flow-warped frames, bicubic-conditioned frames) — each
triplet channel-packed frame-major ("rrrgggbbb", `tecogan_nets.py:440-463`).
Trunk: 3x3 conv (+LeakyReLU 0.2), then four 4x4/stride-2 conv+BN+LeakyReLU
blocks, then a dense logit over the flattened /16 feature map. BatchNorm uses
global (cross-replica) batch statistics, the GSPMD equivalent of the
reference's SyncBN wrap (`base_model.py:133`).

The flow-merge for the warped triplet (backward / idle / forward flow per
clip) is built here and gradient-stopped, exactly like the reference's
`.detach()` (`tecogan_nets.py:407-432`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ... import nn
from ...ops import backward_warp_diff, get_upsampling_fn
from .fnet import fnet_apply

_BLOCKS = [(64, 64), (64, 64), (64, 128), (128, 256)]


@dataclasses.dataclass(frozen=True)
class STNetConfig:
    in_nc: int = 3
    spatial_size: int = 128
    tempo_range: int = 3
    degradation: str = "BD"
    scale: int = 4

    @property
    def upsample_fn(self):
        return get_upsampling_fn(self.scale, self.degradation)


@dataclasses.dataclass(frozen=True)
class SNetConfig:
    in_nc: int = 3
    spatial_size: int = 128
    use_cond: bool = True


def _init_trunk(keys, cin):
    params = {"conv_in": nn.init_conv(next(keys), 3, 3, cin, 64)}
    c_prev = 64
    for bi, (_, cout) in enumerate(_BLOCKS):
        params[f"block{bi}"] = {
            "conv": nn.init_conv(next(keys), 4, 4, c_prev, cout),
            "bn": nn.init_batch_norm(cout),
        }
        params[f"block{bi}"]["conv"].pop("b")  # bias=False in the 4x4 convs
        c_prev = cout
    return params, c_prev


def init_stnet(key, cfg: STNetConfig):
    keys = iter(jax.random.split(key, 8))
    cin = cfg.in_nc * cfg.tempo_range * 3
    params, c_last = _init_trunk(keys, cin)
    feat = cfg.spatial_size // 16
    params["dense"] = nn.init_dense(next(keys), c_last * feat * feat, 1)
    return params


def init_snet(key, cfg: SNetConfig):
    keys = iter(jax.random.split(key, 8))
    cin = cfg.in_nc * (2 if cfg.use_cond else 1)
    params, c_last = _init_trunk(keys, cin)
    feat = cfg.spatial_size // 16
    params["dense"] = nn.init_dense(next(keys), c_last * feat * feat, 1)
    return params


def _trunk_apply(params, x, train: bool):
    """Shared conv trunk. Returns (logits, feature_list, new_params)."""
    out = nn.leaky_relu(nn.conv2d(params["conv_in"], x, padding=1))
    feats = []
    new_params = dict(params)
    for bi in range(4):
        bp = params[f"block{bi}"]
        out = nn.conv2d(bp["conv"], out, stride=2, padding=1)
        out, new_bn = nn.batch_norm(bp["bn"], out, train=train)
        out = nn.leaky_relu(out)
        feats.append(out)
        new_params[f"block{bi}"] = {"conv": bp["conv"], "bn": new_bn}
    n = out.shape[0]
    # flatten NHWC -> (n, h*w*c); the dense kernel is stored for this order
    logits = nn.dense(params["dense"], out.reshape(n, -1))
    return logits, feats, new_params


# --------------------------------------------------------------------------
# STNet input assembly
# --------------------------------------------------------------------------

def _pack_triplet(x):
    """(n_clip, 3, h, w, c) -> (n_clip, h, w, 3*c), channel = ch*3 + frame.

    The reference permutes to (c, 3) before flattening ("rrrgggbbb":
    channels group by colour first, then frame, `tecogan_nets.py:440-444`);
    putting the colour channel as the leading factor reproduces that order.
    """
    n, t3, h, w, c = x.shape
    x = jnp.moveaxis(x, 1, -1)  # (n, h, w, c, 3)
    return x.reshape(n, h, w, c * t3)


def build_flow_merge(hr_flow, lr_data, fnet_params, cfg: STNetConfig,
                     use_pp: bool):
    """Backward/idle/forward flow per 3-frame clip, gradient-stopped.

    With ping-pong data the forward flow of a clip equals a backward flow of
    the mirrored half, so it is sliced from the existing flow tensor
    (`tecogan_nets.py:409-411`); otherwise an extra FNet pass computes it
    (`tecogan_nets.py:413-425`).
    """
    n, tm1 = hr_flow.shape[0], hr_flow.shape[1]
    t = (tm1 + 1) // 3 * 3
    n_clip = n * (t // 3)
    hr_h, hr_w = hr_flow.shape[2], hr_flow.shape[3]

    flow_bw = hr_flow[:, 0:t:3]
    flow_idle = jnp.zeros_like(flow_bw)
    if use_pp:
        flow_fw = hr_flow[:, ::-1][:, 1:t:3]
    else:
        from .frnet import _hr_flow

        _, _, lh, lw, c = lr_data.shape
        lr_curr = lr_data[:, 1:t:3].reshape(n_clip, lh, lw, c)
        lr_next = lr_data[:, 2:t:3].reshape(n_clip, lh, lw, c)
        lr_flow_fw = fnet_apply(fnet_params, lr_curr, lr_next)
        # _hr_flow reflect-pads FNet's /8-truncated flow back to (lh, lw)
        # before upsampling — without it the reshape below crashes for
        # any LR crop not divisible by 8 (the hr_flow operand already
        # carries this invariant from forward_sequence)
        flow_fw = _hr_flow(cfg, lr_flow_fw, lh, lw).reshape(
            n, t // 3, hr_h, hr_w, 2)

    merge = jnp.stack([flow_bw, flow_idle, flow_fw], axis=2)
    merge = merge.reshape(n_clip * 3, hr_h, hr_w, 2)
    return jax.lax.stop_gradient(merge)


def build_stnet_input(data, bi_data, flow_merge, crop_border_ratio: float,
                      cfg: STNetConfig):
    """Assemble the 27-channel D input from (n, t, H, W, c) sequences."""
    n, t_all, hh, ww, c = data.shape
    t = t_all // 3 * 3
    n_clip = n * (t // 3)

    cond = _pack_triplet(bi_data[:, :t].reshape(n_clip, 3, hh, ww, c))
    d3 = data[:, :t].reshape(n_clip, 3, hh, ww, c)
    orig = _pack_triplet(d3)

    # the idle (middle) slot's merged flow is identically zero
    # (build_flow_merge), and warping with zero flow is the identity —
    # warp only the bw/fw end slots (2/3 of the assembly's warp work);
    # the middle frame passes through with the same (identity) gradient
    fm3 = flow_merge.reshape(n_clip, 3, hh, ww, 2)
    ends = d3[:, ::2].reshape(n_clip * 2, hh, ww, c)
    f_ends = fm3[:, ::2].reshape(n_clip * 2, hh, ww, 2)
    w_ends = backward_warp_diff(ends, f_ends).reshape(n_clip, 2, hh, ww, c)
    warped = jnp.stack([w_ends[:, 0], d3[:, 1], w_ends[:, 1]], axis=1)
    warped = _pack_triplet(warped)

    # crop the warped borders then zero-pad back (training-stability trick,
    # `tecogan_nets.py:457-460`)
    s_size = cfg.spatial_size
    c_size = int(s_size * crop_border_ratio)
    n_pad = (s_size - c_size) // 2
    if n_pad > 0:
        warped = warped[:, n_pad:n_pad + c_size, n_pad:n_pad + c_size, :]
        warped = jnp.pad(
            warped, ((0, 0), (n_pad, s_size - c_size - n_pad),
                     (n_pad, s_size - c_size - n_pad), (0, 0)))

    return jnp.concatenate([orig, warped, cond], axis=-1)


def build_d_input(data, ctx: dict, cfg):
    """Assemble the discriminator input tensor for ``data`` WITHOUT running
    the trunk. Split out of the apply functions so the train step can build
    the (parameter-independent, gradient-free for gt / stop-gradient'd hr)
    inputs ONCE and reuse them across the vote and loss forwards — the
    flow warp in the STNet assembly is by far the most expensive part of a
    D evaluation at the training geometry."""
    if isinstance(cfg, STNetConfig):
        flow_merge = ctx.get("flow_merge")
        if flow_merge is None:
            flow_merge = build_flow_merge(
                ctx["hr_flow"], ctx["lr_data"], ctx["fnet_params"], cfg,
                ctx["use_pp"])
        return build_stnet_input(
            data, ctx["bi_data"], flow_merge, ctx["crop_border_ratio"], cfg)
    n, t, hh, ww, c = data.shape
    x = data.reshape(n * t, hh, ww, c)
    if cfg.use_cond:
        bi = ctx["bi_data"].reshape(n * t, hh, ww, c)
        x = jnp.concatenate([bi, x], axis=-1)
    return x


def trunk_apply(params, x, train: bool = True):
    """Run the shared conv trunk on a pre-assembled input (see
    ``build_d_input``). Returns (logits, feature_list, new_params)."""
    return _trunk_apply(params, x, train)


def stnet_apply(params, data, ctx: dict, cfg: STNetConfig, train: bool = True):
    """Full STNet forward.

    ctx keys: lr_data, bi_data, hr_flow, use_pp, crop_border_ratio,
    fnet_params (for the non-ping-pong forward flow), and optionally
    flow_merge to reuse a previous call's flows (reference
    `tecogan_nets.py:434-436`).

    Returns (logits, feature_list, out_ctx, new_params).
    """
    flow_merge = ctx.get("flow_merge")
    if flow_merge is None:
        flow_merge = build_flow_merge(
            ctx["hr_flow"], ctx["lr_data"], ctx["fnet_params"], cfg,
            ctx["use_pp"])
    x = build_stnet_input(
        data, ctx["bi_data"], flow_merge, ctx["crop_border_ratio"], cfg)
    logits, feats, new_params = _trunk_apply(params, x, train)
    return logits, feats, {"flow_merge": flow_merge}, new_params


def snet_apply(params, data, ctx: dict, cfg: SNetConfig, train: bool = True):
    """Spatial discriminator over per-frame inputs (`tecogan_nets.py:480-534`)."""
    x = build_d_input(data, ctx, cfg)
    logits, feats, new_params = _trunk_apply(params, x, train)
    return logits, feats, {}, new_params
