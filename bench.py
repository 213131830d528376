"""Benchmark: streaming 4x SR inference throughput (frames/sec/chip).

Protocol mirrors the reference's speed measurement (README.md:171-172,
`main.py:248-262`): RGB frames at 134x320 LR with the flagship generator
(FRNet, nf=64, nb=10, 4x, BD bicubic residual path). The reference reports
27 FPS on one GTX 1080Ti; vs_baseline is the speedup over that.

Unlike the reference (one python-level `step` per frame, with a host
round-trip each frame), the TPU path streams a whole chunked sequence
through `lax.scan` with the recurrent HR state resident in HBM, the flow
warp as a Pallas kernel, and bf16 conv compute (fp32 warp coordinates and
fp32 output quantisation).

Execution is forced by fetching a device-side checksum (a bulk D2H of the
frames would measure the host link, not the chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def main():
    import jax

    # persistent compilation cache: repeated bench runs skip the (minutes-
    # long) XLA compile of the chunked scan pipeline
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from tecogan_tpu.models.networks import (
        FRNetConfig, infer_sequence, init_frnet)

    cfg = FRNetConfig(nf=64, nb=10, scale=4, degradation="BD",
                      compute_dtype="bfloat16")
    params = init_frnet(jax.random.PRNGKey(0), cfg)

    t, h, w = 64, 134, 320
    lr = jax.random.uniform(jax.random.PRNGKey(1), (t, h, w, 3), jnp.float32)

    @jax.jit
    def run_checksum(p, x):
        # whole-clip chunking: for the 64-frame protocol clip a single
        # chunk maximises the batched-FNet size and removes outer-scan
        # transitions (chunk sweep: 16 -> 273, 32 -> 285, 64 -> 296 FPS);
        # shorter/odd-length production sequences should pick chunk ~ t/k
        # to bound edge padding
        out = infer_sequence(p, x, cfg, chunk=64)
        return jnp.sum(out.astype(jnp.int32))

    int(run_checksum(params, lr))  # warmup / compile

    times = []
    for rep in range(5):
        x = lr + (rep + 1) * 1e-6  # defeat any input-level caching
        t0 = time.perf_counter()
        int(run_checksum(params, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    fps = t / dt
    print(json.dumps({
        "metric": "vid4_4x_sr_fps_per_chip_134x320",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 27.0, 2),
    }))


if __name__ == "__main__":
    main()
