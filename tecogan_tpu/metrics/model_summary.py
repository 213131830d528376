"""Model profiling: analytic per-module GFLOPs + XLA cost analysis.

Counterpart of the reference's forward-hook FLOP counter
(`codes/metrics/model_summary.py`): convolution FLOPs are counted
analytically (2*K_h*K_w*C_in*C_out*H_out*W_out per conv; transposed convs
at the INPUT spatial size, matching the reference's accounting at
`model_summary.py:47-48`), plus parameter totals. An XLA-reported FLOP
estimate for the whole jitted step is also exposed via ``xla_cost``.

Note on the published "142 GFLOPs" (benchmark.png): at 3x134x320 this tool
— like the reference's own — reports ~94.4 G; the published figure counts
the transposed convs at their OUTPUT size (TecoGAN-TF lineage), which adds
~48 G. Both accountings describe the same network.
"""

from __future__ import annotations

import jax
import numpy as np

__all__ = ["profile_frnet", "count_params", "xla_cost"]


def _conv_flops(k, cin, cout, h_out, w_out):
    return 2.0 * k * k * cin * cout * h_out * w_out


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def profile_frnet(cfg, lr_size):
    """Analytic FLOPs/params per module for one generator step.

    lr_size: (c, h, w) like the reference CLI. Returns
    ({'FNet': gflops, 'SRNet': gflops}, {'FNet': params, 'SRNet': params}).
    """
    c, h, w = lr_size
    s, nf, nb = cfg.scale, cfg.nf, cfg.nb

    # ---- FNet: encoder (2 convs per level, /2 after), decoder (2 convs,
    # x2 after), flow head
    enc = [(2 * c, 32), (32, 32), (32, 64), (64, 64), (64, 128), (128, 128)]
    dec = [(128, 256), (256, 256), (256, 128), (128, 128), (128, 64),
           (64, 64)]
    flow = [(64, 32), (32, 2)]
    fl = 0.0
    params_f = 0
    hh, ww = h, w
    for i, (ci, co) in enumerate(enc):
        fl += _conv_flops(3, ci, co, hh, ww)
        params_f += 9 * ci * co + co
        if i % 2 == 1:
            hh, ww = hh // 2, ww // 2
    for i, (ci, co) in enumerate(dec):
        fl += _conv_flops(3, ci, co, hh, ww)
        params_f += 9 * ci * co + co
        if i % 2 == 1:
            hh, ww = hh * 2, ww * 2
    for ci, co in flow:
        fl += _conv_flops(3, ci, co, hh, ww)
        params_f += 9 * ci * co + co

    # ---- SRNet: conv_in + nb residual blocks + upsampling convT + conv_out
    sl = _conv_flops(3, (s * s + 1) * c, nf, h, w)
    params_s = 9 * (s * s + 1) * c * nf + nf
    sl += nb * 2 * _conv_flops(3, nf, nf, h, w)
    params_s += nb * 2 * (9 * nf * nf + nf)
    hh, ww = h, w
    for _ in range(2 if s == 4 else 1):
        # ConvTranspose FLOPs accounted at the input size (reference rule)
        sl += _conv_flops(3, nf, nf, hh, ww)
        params_s += 9 * nf * nf + nf
        hh, ww = hh * 2, ww * 2
    sl += _conv_flops(3, nf, c, hh, ww)
    params_s += 9 * nf * c + c

    gflops = {"FNet": fl / 1e9, "SRNet": sl / 1e9}
    params = {"FNet": params_f, "SRNet": params_s}
    return gflops, params


def xla_cost(fn, *args):
    """FLOPs/bytes reported by XLA for a jitted callable, if available."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return {
            "flops": float(analysis.get("flops", float("nan"))),
            "bytes_accessed": float(
                analysis.get("bytes accessed", float("nan"))),
        }
    except Exception:
        return None
