"""Capture a jax.profiler trace of a pipeline and print a per-op time table.

Usage:
    python scripts/trace_report.py infer   # streaming inference (bench shape)
    python scripts/trace_report.py tecogan # TecoGAN GAN step, fp32 variant
    python scripts/trace_report.py tecogan_bf16  # the DEFAULT (mixed) step
    python scripts/trace_report.py frvsr_bf16    # FRVSR, mixed (default)

NOTE: the bare model names trace the fp32 escape-hatch variant; the
shipped default is mixed precision — suffix `_bf16` to trace the program
the benchmarks time (and `_noremat` for generator.remat: false).

Parses the XLA-op lines of the xplane proto (via tensorflow's profiler
protos, present in this environment) and aggregates device time by HLO
category / op name, so kernel-level optimisation work has numbers to aim at.
"""

import glob
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def _capture(fn, *args):
    """Run fn once compiled, then trace 3 executions; return trace dir."""
    import jax

    tmp = tempfile.mkdtemp(prefix="tecogan_trace_")
    fn(*args)  # compile + warmup
    with jax.profiler.trace(tmp):
        for _ in range(3):
            jax.block_until_ready(fn(*args))
    return tmp


def _report(trace_dir, top=40):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(osp.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xspace.ParseFromString(f.read())

    # The device plane's 'XLA Ops' line nests envelope events (while/fusion
    # bodies inside while ops): compute SELF time per event by subtracting
    # enclosed children, then aggregate by op name.
    agg = {}
    total_ps = 0
    for plane in xspace.planes:
        if "/device:TPU" not in plane.name:
            continue
        md = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(line.events,
                         key=lambda e: (e.offset_ps, -e.duration_ps))
            stack = []  # (end_ps, [child_total])
            for ev in evs:
                start, dur = ev.offset_ps, ev.duration_ps
                while stack and start >= stack[-1][0]:
                    stack.pop()
                if stack:
                    stack[-1][1][0] += dur
                child_acc = [0]
                stack.append((start + dur, child_acc))
                name = md[ev.metadata_id].name
                # defer self-time: record (name, dur, child_acc)
                ev_rec = (name, dur, child_acc)
                agg.setdefault(name, []).append(ev_rec)
    flat = {}
    for name, recs in agg.items():
        self_ps = sum(dur - acc[0] for _, dur, acc in recs)
        flat[name] = self_ps
        total_ps += self_ps
    rows = sorted(flat.items(), key=lambda kv: -kv[1])[:top]
    print(f"{'self us (3 runs)':>18s}  {'%':>5s}  op")
    for name, ps in rows:
        print(f"{ps / 1e6:18.1f}  {100 * ps / max(total_ps, 1):5.1f}  "
              f"{name[:130]}")
    print(f"{total_ps / 1e6:18.1f}  100.0  TOTAL")
    return flat


def infer_case():
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models.networks import (FRNetConfig, infer_sequence,
                                             init_frnet)
    cfg = FRNetConfig(nf=64, nb=10, scale=4, degradation="BD",
                      compute_dtype="bfloat16")
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jax.random.uniform(jax.random.PRNGKey(1), (64, 134, 320, 3),
                            jnp.float32)

    @jax.jit
    def run(p, x):
        return jnp.sum(infer_sequence(p, x, cfg, chunk=32).astype(jnp.int32))

    return run, (params, lr)


def serve_case(n_streams: int = 4):
    import jax
    import jax.numpy as jnp

    from tecogan_tpu.models.networks import (FRNetConfig,
                                             infer_sequence_batch,
                                             init_frnet)
    cfg = FRNetConfig(nf=64, nb=10, scale=4, degradation="BD",
                      compute_dtype="bfloat16")
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jax.random.uniform(jax.random.PRNGKey(1),
                            (n_streams, 32, 134, 320, 3), jnp.float32)

    @jax.jit
    def run(p, x):
        return jnp.sum(
            infer_sequence_batch(p, x, cfg, chunk=16).astype(jnp.int32))

    return run, (params, lr)


def _train_case(model_name):
    """Trace the SAME train-step case the benchmark suite times — the
    construction is imported from bench_suite.build_train_case so the
    trace always explains the benchmarked program (donation off: the
    trace loop re-runs one fixed state)."""
    import jax

    from bench_suite import build_train_case

    noremat = model_name.endswith("_noremat")
    model_name = model_name.removesuffix("_noremat")
    mixed = model_name.endswith("_bf16")
    model_name = model_name.removesuffix("_bf16")
    step, state, batch, vgg = build_train_case(
        model_name, mixed_precision=mixed, remat=not noremat, donate=False)
    if vgg is None:
        run = lambda s: step(s, batch)  # noqa: E731
    else:
        run = lambda s: step(s, batch, vgg_params=vgg)[1]  # noqa: E731

    def run_block(state=state):
        out = run(state)
        jax.block_until_ready(out)
        return out

    return run_block, ()


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "infer"
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      osp.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    if which == "infer":
        fn, args = infer_case()
    elif which.startswith("serve"):
        fn, args = serve_case(int(which.removeprefix("serve") or 4))
    else:
        fn, args = _train_case(which)
    trace_dir = _capture(fn, *args)
    print(f"trace: {trace_dir}")
    _report(trace_dir)


if __name__ == "__main__":
    main()
