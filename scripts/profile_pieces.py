"""Micro-profile of the streaming-inference pipeline pieces on the TPU.

Each piece is timed as a jitted lax.scan of N data-dependent iterations
(amortises dispatch/tunnel latency); prints ms per iteration. Shapes match
the bench protocol: 134x320 LR, 4x, nf=64, nb=10, bf16 compute.

Usage: python scripts/profile_pieces.py [piece ...]
"""

import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timed(name, fn, x0, n_iter=100, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            c = fn(c)
            return c, ()
        c, _ = jax.lax.scan(body, x, None, length=n_iter)
        return jnp.sum(jax.tree.leaves(c)[0].astype(jnp.float32))

    float(run(x0))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0))
        times.append(time.perf_counter() - t0)
    ms = min(times) / n_iter * 1000
    print(f"{name:42s} {ms:8.3f} ms/iter")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from tecogan_tpu import nn
    from tecogan_tpu.models.networks import FRNetConfig, init_frnet
    from tecogan_tpu.models.networks.fnet import fnet_apply
    from tecogan_tpu.models.networks.frnet import _hr_flow
    from tecogan_tpu.models.networks.srnet import srnet_apply
    from tecogan_tpu.ops import space_to_depth
    from tecogan_tpu.ops.warp_pallas import (
        _warp_planes, backward_warp_pallas_packed)

    which = set(sys.argv[1:])
    dt = jnp.bfloat16
    n, h, w, c, s, nf = 1, 134, 320, 3, 4, 64
    hh, ww = s * h, s * w

    cfg = FRNetConfig(nf=nf, nb=10, scale=s, degradation="BD",
                      compute_dtype="bfloat16")
    params = nn.cast_params(init_frnet(jax.random.PRNGKey(0), cfg), dt)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    lr = jax.random.uniform(ks[0], (n, h, w, c), dt)
    lr2 = jax.random.uniform(ks[1], (n, h, w, c), dt)
    flow_lr = (jax.random.uniform(ks[2], (n, h, w, 2), dt) - 0.5) * 10
    # realistic flow: smooth (FNet output is an upsampling-ladder product),
    # a few pixels of HR displacement
    yy = jnp.linspace(0, 6.28, hh)[None, :, None]
    xx = jnp.linspace(0, 6.28, ww)[None, None, :]
    flow_hr = jnp.stack(
        [3.0 * jnp.sin(yy + 2 * xx) + 1.5, 2.0 * jnp.cos(2 * yy + xx) - 0.7],
        axis=-1).astype(jnp.float32) * jnp.ones((n, hh, ww, 2), jnp.float32)
    p2 = jax.random.uniform(ks[4], (n, hh // 2, ww // 2, 4 * c), dt)
    packed_in = jax.random.uniform(ks[5], (n, h, w, s * s * c), dt)
    trunk = jax.random.uniform(ks[6], (n, h, w, nf), dt)
    planes = jax.random.uniform(ks[7], (n, c, hh, ww), dt)

    def want(name):
        return not which or any(k in name for k in which)

    if want("baseline"):
        m = 136 * 328
        a = jax.random.uniform(ks[0], (m, 64), dt)
        timed("baseline scan (x * 1.0001, 5.7MB)",
              lambda x: x * dt(1.0001), a, n_iter=50)
        small = jax.random.uniform(ks[0], (8, 128), dt)
        timed("baseline scan (x * 1.0001, 2KB)",
              lambda x: x * dt(1.0001), small, n_iter=50)

    if want("fnet16"):
        lr16 = jnp.tile(lr, (16, 1, 1, 1))
        lr16b = jnp.tile(lr2, (16, 1, 1, 1))
        timed("fnet (batch 16) [/16 for per-frame]",
              lambda x: x + jnp.sum(
                  fnet_apply(params["fnet"], x, lr16b)).astype(dt) * 0,
              lr16, n_iter=30)

    if want("hrflow16"):
        fl16 = jnp.tile(flow_lr, (16, 1, 1, 1))
        timed("hr_flow upsample (batch 16) [/16]",
              lambda x: x + jnp.sum(
                  _hr_flow(cfg, x, h, w)).astype(dt) * 0,
              fl16, n_iter=30)

    if want("p2planes"):
        def roundtrip(x):
            t = x.reshape(n, hh // 2, ww // 2, 2, 2, c)
            t = t.transpose(0, 5, 1, 3, 2, 4)
            pl = t.reshape(n, c, hh, ww)
            t2 = pl.reshape(n, c, hh // 2, 2, ww // 2, 2)
            t2 = t2.transpose(0, 2, 4, 3, 5, 1)
            return t2.reshape(n, hh // 2, ww // 2, 4 * c)
        timed("packed2 -> planes -> packed2 roundtrip", roundtrip, p2,
              n_iter=50)

    if want("planes2packed4"):
        def planes_to_p4(x):
            t = x.reshape(n, c, hh // s, s, ww // s, s)
            t = t.transpose(0, 2, 4, 3, 5, 1)
            p4 = t.reshape(n, hh // s, ww // s, s * s * c)
            t2 = p4.reshape(n, hh // s, ww // s, s, s, c)
            t2 = t2.transpose(0, 5, 1, 3, 2, 4)
            return t2.reshape(n, c, hh, ww)
        timed("planes -> packed4 -> planes roundtrip", planes_to_p4, planes,
              n_iter=50)

    if want("warpkernel"):
        timed("pallas warp kernel (planes in/out)",
              lambda x: _warp_planes(x, flow_hr).astype(dt), planes,
              n_iter=50)

    if want("warpfull"):
        timed("full packed warp (p2 in, packed4 out)",
              lambda x: x * 0.5 + backward_warp_pallas_packed(
                  x, flow_hr, s).sum() * 0,
              p2, n_iter=50)

    if want("convin"):
        timed("conv_in (51->64)",
              lambda x: x * 0 + nn.relu(nn.conv2d(
                  params["srnet"]["conv_in"],
                  jnp.concatenate([lr, x], -1),
                  padding=1))[..., :48],
              packed_in, n_iter=50)

    if want("resblocks"):
        def res10(x):
            out = x
            for bi in range(10):
                r = nn.relu(nn.conv2d(params["srnet"][f"res{bi}_0"], out,
                                      padding=1))
                r = nn.conv2d(params["srnet"][f"res{bi}_1"], r, padding=1)
                out = out + r
            return out
        timed("10 residual blocks (64ch, 134x320)", res10, trunk, n_iter=30)

    if want("convt0"):
        timed("convT up0 (64->64, 2x to 268x640)",
              lambda x: x * 0 + nn.relu(nn.conv2d_transpose(
                  params["srnet"]["up0"], x))[:, ::2, ::2] * 1e-3,
              trunk, n_iter=30)

    if want("tail"):
        up = jax.random.uniform(key, (n, 2 * h, 2 * w, nf), dt)
        def tail(x):
            outp = nn.relu(nn.conv2d_transpose_packed(
                params["srnet"]["up1"], x))
            wp = nn.pack_conv3x3_kernel(params["srnet"]["conv_out"]["w"])
            wp = jnp.pad(wp, ((0, 0), (0, 0), (0, 0), (0, 128 - 12)))
            o = jax.lax.conv_general_dilated(
                outp, wp.astype(outp.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :12]
            # keep the conv live without adding a dependent consumer
            return x + jnp.sum(o).astype(dt) * 0
        timed("packed tail (convT packed + conv_out)", tail, up, n_iter=30)

    if want("srnet"):
        timed("full srnet_apply (packed in -> packed2 out)",
              lambda x: x * 0.5 + jnp.sum(srnet_apply(
                  params["srnet"], lr, x, 10, s, "BD",
                  return_packed=True)).astype(dt) * 0,
              packed_in, n_iter=30)

    if want("s2d"):
        hr = jax.random.uniform(key, (n, hh, ww, c), dt)
        timed("space_to_depth(4) NHWC",
              lambda x: x * 0.5 + jnp.sum(space_to_depth(x, s)) * 0,
              hr, n_iter=50)

    if want("matmul"):
        # MXU efficiency probes at the trunk's candidate matmul shapes:
        # carry the (M, 64) activation, expand to (M, 9*64) by tiling
        # (same VMEM/HBM traffic class as im2col), contract back to 64.
        m = 136 * 328
        for kk, nn_ in [(576, 64), (64, 64), (576, 128)]:
            b = jax.random.uniform(ks[1], (kk, nn_), dt)
            pback = jax.random.uniform(ks[2], (nn_, 64), dt)
            a = jax.random.uniform(ks[0], (m, 64), dt)
            reps = kk // 64
            gf = 2 * m * kk * nn_ / 1e9

            def step_mm(x, b=b, pback=pback, reps=reps):
                xc = jnp.tile(x, (1, reps)) if reps > 1 else x
                y = jnp.dot(xc, b, preferred_element_type=jnp.float32)
                return jnp.dot(y.astype(dt), pback,
                               preferred_element_type=jnp.float32).astype(dt)

            ms = timed(f"matmul ({m}x{kk})@({kk}x{nn_}) [{gf:.1f} GF]",
                       step_mm, a, n_iter=50)
            print(f"    -> {gf / ms:.1f} TF/s (main matmul only)")

    if want("im2col"):
        # the trunk conv re-expressed as roll-im2col + one matmul, in XLA
        m = 136 * 328
        w576 = jax.random.uniform(ks[1], (576, 64), dt)
        a = jax.random.uniform(ks[0], (m, 64), dt)
        shifts = [dy * 328 + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

        def im2col_conv(x):
            xc = jnp.concatenate(
                [jnp.roll(x, s, axis=0) for s in shifts], axis=1)
            return x + jnp.dot(xc, w576,
                               preferred_element_type=jnp.float32).astype(dt)

        timed("im2col conv (roll+concat+matmul), XLA", im2col_conv, a,
              n_iter=50)

    if want("conv3x3"):
        # one 3x3 64->64 conv at trunk shape, in isolation
        wgt = params["srnet"]["res0_0"]
        timed("single conv3x3 64->64 (134x320)",
              lambda x: nn.conv2d(wgt, x, padding=1), trunk, n_iter=100)

    if want("quant"):
        def quant(x):
            q = jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0), 0, 255
                         ).astype(jnp.uint8)
            from tecogan_tpu.ops import depth_to_space
            o = depth_to_space(q[None], 2)
            return x * 0.5 + jnp.sum(o.astype(jnp.float32)).astype(dt) * 0
        timed("uint8 quantise + d2s(2) (per frame)", quant, p2[0], n_iter=50)


if __name__ == "__main__":
    main()
