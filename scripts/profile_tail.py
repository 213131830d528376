"""Compare SR-tail formulations on the TPU (268-grid convT + conv_out).

Variants:
  A: current — convT-packed (268-grid, 64->256) + conv_out packed padded to
     128 output channels (3x3, 256->128, slice 12).
  B: conv_out exact (3x3, 256->12), no padding.
  C: fully-packed conv_out at the 134-grid: repack (268,640,256) ->
     (134,320,1024), conv (2,2,1024,48).
  D: C but with the repack counted separately.
All include the up1 convT stage so relative numbers are comparable.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def timed(name, fn, x0, n_iter=200, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=n_iter)
        return jnp.sum(c.astype(jnp.float32))

    float(run(x0))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x0))
        times.append(time.perf_counter() - t0)
    tot = min(times) * 1000
    ms = (tot - 25.4) / n_iter  # ~25.4ms fixed per-call tunnel overhead
    print(f"{name:54s} {ms:8.3f} ms/iter")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from tecogan_tpu import nn

    dt = jnp.bfloat16
    n, h2, w2, nf = 1, 268, 640, 64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.uniform(ks[0], (n, h2, w2, nf), dt)
    up1 = {"w": jax.random.uniform(ks[1], (3, 3, nf, nf), dt) * 0.1,
           "b": jax.random.uniform(ks[2], (nf,), dt) * 0.1}
    wout = jax.random.uniform(ks[3], (3, 3, nf, 3), dt) * 0.1
    bout = jnp.zeros((3,), dt)

    def up1_packed(v):
        return nn.relu(nn.conv2d_transpose_packed(up1, v))  # (268,640,256)

    def variant_a(v):
        outp = up1_packed(v)
        wp = nn.pack_conv3x3_kernel(wout)  # (3,3,256,12)
        wpad = jnp.pad(wp, ((0, 0), (0, 0), (0, 0), (0, 116)))
        o = jax.lax.conv_general_dilated(
            outp, wpad.astype(outp.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., :12]
        return v + jnp.sum(o).astype(dt) * 0

    def variant_b(v):
        outp = up1_packed(v)
        wp = nn.pack_conv3x3_kernel(wout)
        o = jax.lax.conv_general_dilated(
            outp, wp.astype(outp.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return v + jnp.sum(o).astype(dt) * 0

    def pack16_weight():
        """(2,2,1024,48): conv_out over the 134-grid fully-packed layout.

        Input packed channel = (ry*2+rx)*256 + q2*64 + ci where the 268-cell
        phase is (ry,rx) and q2=(sy*2+sx) is the 536-phase within the
        268-cell... (constructed numerically from pack_conv3x3_kernel twice)
        """
        w1 = nn.pack_conv3x3_kernel(wout)           # (3,3,256,12) @268-grid
        # pack AGAIN onto the 134-grid: 3x3@268 -> 2x2@134 over 4x channels
        kh, kw, ci, co = w1.shape
        zero = jnp.zeros((ci, co), w1.dtype)
        rows = []
        for ty in range(2):
            cols = []
            for tx in range(2):
                inb = []
                for ry in range(2):
                    for rx in range(2):
                        outb = []
                        for py in range(2):
                            for px in range(2):
                                dy = 2 * ty + ry - py
                                dx = 2 * tx + rx - px
                                if -1 <= dy <= 1 and -1 <= dx <= 1:
                                    outb.append(w1[dy + 1, dx + 1])
                                else:
                                    outb.append(zero)
                        inb.append(jnp.concatenate(outb, -1))
                cols.append(jnp.concatenate(inb, 0))
            rows.append(jnp.stack(cols, 0))
        return jnp.stack(rows, 0)  # (2,2,4*256,4*12)

    w16 = pack16_weight()

    def repack(v256):  # (268,640,256) -> (134,320,1024)
        t = v256.reshape(n, 134, 2, 320, 2, 256)
        t = t.transpose(0, 1, 3, 2, 4, 5)
        return t.reshape(n, 134, 320, 1024)

    def variant_c(v):
        outp = up1_packed(v)
        p = repack(outp)
        o = jax.lax.conv_general_dilated(
            p, w16.astype(p.dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return v + jnp.sum(o).astype(dt) * 0

    def variant_up1_only(v):
        outp = up1_packed(v)
        return v + jnp.sum(outp).astype(dt) * 0

    def variant_repack_only(v):
        outp = up1_packed(v)
        p = repack(outp)
        return v + jnp.sum(p).astype(dt) * 0

    timed("up1 convT-packed only", variant_up1_only, x, n_iter=100)
    timed("up1 + repack to 134-grid", variant_repack_only, x, n_iter=100)
    timed("A: up1 + conv_out padded-128 (current)", variant_a, x, n_iter=100)
    timed("B: up1 + conv_out exact N=12", variant_b, x, n_iter=100)
    timed("C: up1 + repack + packed-134 conv_out N=48", variant_c, x,
          n_iter=100)


if __name__ == "__main__":
    main()
