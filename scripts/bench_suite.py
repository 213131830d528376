"""Consolidated benchmark suite: inference FPS (fp32/bf16, per chunk
geometry), train-step throughput (FRVSR + TecoGAN at the reference batch
geometry), and host loader throughput. Writes BENCHMARKS.md.

Run on the TPU host:  python scripts/bench_suite.py
"""

import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np  # noqa: E402


def _fps_infer(dtype, scale=4, degradation="BD"):
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models.networks import (
        FRNetConfig, infer_sequence, init_frnet)

    t, h, w = 64, 134, 320
    cfg = FRNetConfig(nf=64, nb=10, scale=scale, degradation=degradation,
                      compute_dtype=dtype)
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (t, h, w, 3), jnp.float32)

    @jax.jit
    def run(p, x):
        # whole-clip chunking, matching bench.py's protocol
        return jnp.sum(infer_sequence(p, x, cfg, chunk=t).astype(jnp.int32))

    int(run(params, lr))
    times = []
    for rep in range(4):
        t0 = time.perf_counter()
        int(run(params, lr + (rep + 1) * 1e-6))
        times.append(time.perf_counter() - t0)
    return t / min(times)


def _fps_infer_batch(n_streams: int):
    """Serving mode: concurrent independent streams fill the MXU; reports
    AGGREGATE frames/sec over all streams."""
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models.networks import (
        FRNetConfig, infer_sequence_batch, init_frnet)

    t, h, w = 32, 134, 320
    cfg = FRNetConfig(nf=64, nb=10, scale=4, degradation="BD",
                      compute_dtype="bfloat16")
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (n_streams, t, h, w, 3),
                            jnp.float32)

    @jax.jit
    def run(p, x):
        return jnp.sum(
            infer_sequence_batch(p, x, cfg, chunk=16).astype(jnp.int32))

    int(run(params, lr))
    times = []
    for rep in range(4):
        t0 = time.perf_counter()
        int(run(params, lr + (rep + 1) * 1e-6))
        times.append(time.perf_counter() - t0)
    return n_streams * t / min(times)


def build_train_case(model, mixed_precision=False, train_unroll=None,
                     remat=True, donate=True, scale=4, degradation="BD"):
    """The reference-geometry train-step case (batch 4 x 10 frames x
    128^2-GT-crop) shared by the benchmark suite and trace_report (one
    copy of the recipe — a geometry/TrainConfig change stays in sync
    between the benchmark and the trace that explains it).

    BD carries the 8px blur border on GT (136^2, LR made on-device inside
    the step); BI is the paired pipeline (128^2 GT + pre-degraded LR in
    the batch), matching `experiments_BI/*/train.yml`.

    Returns (step, state, batch, vgg) — vgg is None for frvsr."""
    import jax

    from tecogan_tpu.models.networks import (
        FRNetConfig, STNetConfig, init_frnet, init_stnet, init_vgg19)
    from tecogan_tpu.models.schedules import make_adam
    from tecogan_tpu.models.steps import (
        TrainConfig, frvsr_init_state, frvsr_train_step,
        tecogan_init_state, tecogan_train_step)
    from tecogan_tpu.parallel import batch_sharding, get_mesh, replicated

    mesh = get_mesh()
    rng = np.random.default_rng(0)
    if degradation == "BD":
        batch = {"gt": jax.device_put(
            (rng.random((4, 10, 136, 136, 3)) * 255).astype(np.uint8),
            batch_sharding(mesh))}
    else:
        lhw = 128 // scale
        batch = {"gt": jax.device_put(
            (rng.random((4, 10, 128, 128, 3)) * 255).astype(np.uint8),
            batch_sharding(mesh)),
            "lr": jax.device_put(
                (rng.random((4, 10, lhw, lhw, 3)) * 255).astype(np.uint8),
                batch_sharding(mesh))}
    cfg_g = FRNetConfig(nf=64, nb=10, scale=scale, degradation=degradation,
                        train_unroll=train_unroll, remat=remat)
    base = dict(scale=scale, degradation=degradation, sigma=1.5,
                tempo_extent=10,
                mixed_precision=mixed_precision,
                pixel_crit={"type": "CB", "weight": 1, "reduction": "mean"},
                warping_crit={"type": "CB", "weight": 1, "reduction": "mean"})
    tx_g, _ = make_adam({"lr": 1e-4})
    donate_kw = {"donate_argnums": (0,)} if donate else {}

    if model == "frvsr":
        tcfg = TrainConfig(**base)
        state = jax.device_put(
            frvsr_init_state(init_frnet(jax.random.PRNGKey(0), cfg_g), tx_g),
            replicated(mesh))
        step = jax.jit(functools.partial(
            frvsr_train_step, cfg_g=cfg_g, tcfg=tcfg, tx_g=tx_g),
            **donate_kw)
        vgg = None
    else:
        cfg_d = STNetConfig(spatial_size=128, degradation=degradation,
                            scale=scale)
        tcfg = TrainConfig(
            **base,
            feature_crit={"type": "CosineSimilarity", "weight": 0.2,
                          "feature_layers": [8, 17, 26, 35]},
            pingpong_crit={"type": "CB", "weight": 0.5, "reduction": "mean"},
            gan_crit={"type": "GAN", "weight": 0.01, "reduction": "mean"},
            update_policy="adaptive")
        tx_d, _ = make_adam({"lr": 5e-5})
        vgg = jax.device_put(init_vgg19(jax.random.PRNGKey(2)),
                             replicated(mesh))
        state = jax.device_put(tecogan_init_state(
            init_frnet(jax.random.PRNGKey(0), cfg_g),
            init_stnet(jax.random.PRNGKey(1), cfg_d), tx_g, tx_d),
            replicated(mesh))
        step = jax.jit(functools.partial(
            tecogan_train_step, cfg_g=cfg_g, cfg_d=cfg_d, tcfg=tcfg,
            tx_g=tx_g, tx_d=tx_d), **donate_kw)
    return step, state, batch, vgg


def _train_iter(model, mixed_precision=False, report_mfu=False,
                train_unroll=None, remat=True, scale=4, degradation="BD"):
    step, state, batch, vgg = build_train_case(
        model, mixed_precision=mixed_precision, train_unroll=train_unroll,
        remat=remat, scale=scale, degradation=degradation)
    if vgg is None:
        run = lambda s: step(s, batch)
    else:
        run = lambda s: step(s, batch, vgg_params=vgg)

    state, logs = run(state)
    float(logs["l_pix_G"])
    # pipelined protocol, matching the real train loop: logs are only
    # materialised every log_freq iterations, so consecutive steps enqueue
    # asynchronously and the host/tunnel dispatch latency is hidden
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            state, logs = run(state)
        float(logs["l_pix_G"])
        times.append((time.perf_counter() - t0) / 4)
    t_iter = min(times)
    if report_mfu:
        # XLA's own FLOP count for the whole compiled step -> model FLOP
        # utilisation against the chip's bf16 peak (197 TF/s on v5e/lite)
        if model == "frvsr":
            compiled = step.lower(state, batch).compile()
        else:
            compiled = step.lower(state, batch, vgg_params=vgg).compile()
        flops = compiled.cost_analysis().get("flops", 0.0)
        return t_iter, flops / t_iter
    return t_iter


def _loader_rate(tmpdir, batch_size=4, num_workers=4, threads=None):
    from tecogan_tpu.data import RecordWriter, TrainLoader, UnpairedClipDataset

    rng = np.random.default_rng(0)
    w = RecordWriter(tmpdir)
    for i in range(30):
        w.add_sequence(f"v{i}", (rng.random((10, 448, 448, 3)) * 255).astype(
            np.uint8))
    w.close()
    ds = UnpairedClipDataset(tmpdir, crop_size=136, tempo_extent=10,
                             moving_first_frame=True, moving_factor=0.7,
                             output_dtype=np.uint8)
    prior_threads = None
    if threads is not None:
        from tecogan_tpu.data.native import load_library, set_assembler_threads

        prior_threads = load_library().teco_get_max_threads()
        set_assembler_threads(threads)
    try:
        loader = TrainLoader(ds, batch_size=batch_size, seed=0,
                             num_workers=num_workers)
        n, t0 = 0, time.perf_counter()
        for epoch in range(3):
            for _ in loader.epoch(epoch):
                n += 1
        return batch_size * n / (time.perf_counter() - t0)
    finally:
        if prior_threads is not None:
            # restore the PRIOR cap, not the compiled default — a
            # TECOGAN_LOADER_THREADS override must survive this row
            set_assembler_threads(prior_threads)


_MANUAL_MARKER = ("<!-- manual evidence below: preserved across "
                  "bench_suite regenerations -->")


_CANARY_PATH = osp.join(osp.dirname(osp.abspath(__file__)),
                        "perf_canary.json")


def check_canary(update: bool = False) -> bool:
    """Perf regression canary: re-measure the three headline numbers and
    compare against the committed baselines + tolerance bands in
    `scripts/perf_canary.json`. Returns True when everything is inside
    its band; prints a verdict table either way. With ``update`` the
    measured values REPLACE the baselines (commit the file after a
    deliberate perf change).

    The bands are deliberately generous (15-20%): the chip tunnel adds
    run-to-run noise, and the canary exists to catch real layout/fusion
    regressions shipping silently — not jitter. Reference analogue: none
    (the reference's only perf statement is the static benchmark.png
    table, `/root/reference/README.md:165-172`).
    """
    import json

    with open(_CANARY_PATH) as f:
        canary = json.load(f)

    measured = {
        "infer_bf16_4x_bd_fps": _fps_infer("bfloat16"),
        "frvsr_train_ms": 1000 * _train_iter("frvsr", mixed_precision=True),
        "tecogan_train_ms": 1000 * _train_iter("tecogan",
                                               mixed_precision=True),
    }

    ok = True
    print(f"{'metric':<24} {'measured':>10} {'baseline':>10} "
          f"{'bound':>12}  verdict")
    for name, val in measured.items():
        spec = canary[name]
        base = spec["baseline"]
        if "min_ratio" in spec:                      # higher is better
            bound = base * spec["min_ratio"]
            good = val >= bound
            bound_s = f">= {bound:.1f}"
        else:                                        # lower is better
            bound = base * spec["max_ratio"]
            good = val <= bound
            bound_s = f"<= {bound:.1f}"
        ok &= good
        print(f"{name:<24} {val:>10.1f} {base:>10.1f} {bound_s:>12}  "
              f"{'ok' if good else 'REGRESSION'}")
        if update:
            spec["baseline"] = round(val, 1)
    if update:
        with open(_CANARY_PATH, "w") as f:
            json.dump(canary, f, indent=2)
            f.write("\n")
        print(f"updated baselines -> {_CANARY_PATH}")
    print("PERF_CANARY " + ("PASS" if ok else "FAIL"))
    return ok


def main():
    import argparse
    import tempfile

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="perf canary: re-measure the headline numbers "
                         "against scripts/perf_canary.json tolerances; "
                         "exit 1 on regression (no BENCHMARKS rewrite)")
    ap.add_argument("--update", action="store_true",
                    help="with --check: write the measured values back "
                         "as the new committed baselines")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if args.update and not args.check:
        ap.error("--update only applies to the canary path; pass --check "
                 "--update to refresh scripts/perf_canary.json baselines")
    if args.check:
        raise SystemExit(0 if check_canary(update=args.update) else 1)

    rows = []
    dev = str(jax.devices()[0])
    fps16 = _fps_infer("bfloat16")
    rows.append(("4x SR streaming inference, 134x320 LR, bf16",
                 f"{fps16:.1f} frames/s", "reference: 27 FPS on 1080Ti"))
    fps32 = _fps_infer("float32")
    rows.append(("4x SR streaming inference, 134x320 LR, fp32",
                 f"{fps32:.1f} frames/s", ""))
    fps_b4 = _fps_infer_batch(4)
    rows.append(("4x SR batched serving, 4 concurrent streams, bf16",
                 f"{fps_b4:.1f} frames/s aggregate",
                 f"{fps_b4 / fps16:.2f}x one stream's throughput: a single "
                 "stream already deploys the chip at this shape, so serve "
                 "concurrent clips sequentially, not batched (PARITY.md "
                 "round-3 serving analysis)"))
    # model-family matrix (BASELINE.md north star covers 2x and 4x under
    # BD and BI): same 134x320 LR protocol, bf16 streaming
    for scale, deg in ((2, "BD"), (4, "BI"), (2, "BI")):
        fps = _fps_infer("bfloat16", scale=scale, degradation=deg)
        note = ("one upsample stage" if scale == 2 else
                "bilinear residual path")
        rows.append((f"{scale}x SR streaming inference, 134x320 LR, bf16, "
                     f"{deg}", f"{fps:.1f} frames/s",
                     f"family matrix: {note}"))
    t_fr = _train_iter("frvsr", mixed_precision=True)
    rows.append(("FRVSR train step (batch 4 x 10 frames x 128^2 GT, "
                 "mixed precision — the default)",
                 f"{t_fr * 1000:.1f} ms/iter = {4 / t_fr:.1f} clips/s",
                 "the reference's full 2-GPU geometry on one chip"))
    t_mx, fps_mx = _train_iter("tecogan", mixed_precision=True,
                               report_mfu=True)
    rows.append(("TecoGAN GAN step (same geometry, all losses, mixed "
                 "precision — the default)",
                 f"{t_mx * 1000:.1f} ms/iter = {4 / t_mx:.1f} clips/s",
                 f"{fps_mx / 1e12:.1f} TF/s sustained = "
                 f"{100 * fps_mx / 197e12:.0f}% of bf16 peak"))
    # GAN-step train row per model family (2x/BI geometry from the
    # shipped experiments_BD|BI configs: BI is the paired 128^2-GT +
    # pre-degraded-LR pipeline, BD degrades on-device)
    for scale, deg in ((2, "BD"), (4, "BI"), (2, "BI")):
        t_f = _train_iter("tecogan", mixed_precision=True, scale=scale,
                          degradation=deg)
        rows.append((f"TecoGAN GAN step, {scale}x {deg} (batch 4 x 10 "
                     "frames x 128^2 GT, mixed precision)",
                     f"{t_f * 1000:.1f} ms/iter = {4 / t_f:.1f} clips/s",
                     "family matrix"))
    t_nr = _train_iter("tecogan", mixed_precision=True, remat=False)
    rows.append(("TecoGAN GAN step, generator.remat: false (memory is "
                 "ample at this geometry)",
                 f"{t_nr * 1000:.1f} ms/iter = {4 / t_nr:.1f} clips/s", ""))
    t_tg = _train_iter("tecogan")
    rows.append(("TecoGAN GAN step, mixed_precision: false (fp32 escape "
                 "hatch)",
                 f"{t_tg * 1000:.0f} ms/iter = {4 / t_tg:.1f} clips/s", ""))
    with tempfile.TemporaryDirectory() as d:
        rate = _loader_rate(d)
    rows.append(("host input pipeline (native fused assembler: "
                 "gather+crop+aug+dtype straight into batch slots)",
                 f"{rate:.0f} clips/s", "not a bottleneck"))
    # pod-host scenario (SURVEY §7 hard part 8): one host assembles a
    # dp=8 global batch of 32 clips. Thread geometry adapts to the host:
    # a real pod host has tens of cores (8 workers x 8 assembler threads
    # via the TECOGAN_LOADER_THREADS knob); THIS bench host may expose
    # very few, where oversubscription only adds contention (measured 10x
    # worse at 64 threads on 1 core).
    import os

    ncpu = os.cpu_count() or 1
    nw = max(1, min(8, ncpu))
    th = max(1, min(8, ncpu // nw))
    with tempfile.TemporaryDirectory() as d:
        rate32 = _loader_rate(d, batch_size=32, num_workers=nw, threads=th)
    t_iter_ms = 1000 * 32 / rate32
    keeps_ahead = t_iter_ms < t_mx * 1000
    rows.append((f"host input pipeline at dp-scale global batch 32 "
                 f"({nw} workers x {th} assembler threads on a "
                 f"{ncpu}-core host)",
                 f"{rate32:.0f} clips/s = {t_iter_ms:.1f} ms/batch",
                 f"vs {t_mx * 1000:.0f} ms GAN step at batch 4: assembly "
                 + ("keeps ahead of an 8-chip mesh"
                    if keeps_ahead else "NEEDS more host cores")))

    lines = [
        "# BENCHMARKS — measured on " + dev,
        "",
        "Generated by `python scripts/bench_suite.py`.",
        "",
        "Protocols: streaming-inference rows chunk the 64-frame clip as",
        "ONE whole-clip scan (chunk=64; round-2 numbers <=285 FPS used",
        "chunk=32, so part of that round's 285->296 delta was protocol).",
        "Train-step rows use the pipelined protocol (several steps",
        "enqueued, one sync) matching the real loop's log_freq cadence,",
        "and the training scan runs fully unrolled on TPU (the",
        "`train_unroll` auto default; one-time ~10 min XLA compile,",
        "persistently cached).",
        "",
        "| Benchmark | Result | Notes |",
        "|---|---|---|",
    ]
    for name, result, note in rows:
        lines.append(f"| {name} | {result} | {note} |")
    out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "BENCHMARKS.md")
    # preserve hand-recorded evidence (real-loop/campaign rows) below the
    # marker across regenerations
    manual = ""
    if osp.exists(out):
        with open(out) as f:
            prev = f.read()
        if _MANUAL_MARKER in prev:
            manual = prev[prev.index(_MANUAL_MARKER):]
    if not manual:
        manual = _MANUAL_MARKER + "\n"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n\n" + manual)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
