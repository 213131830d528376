"""Multi-host paths: the metric allgather across two REAL spawned JAX
processes (local CPU coordinator), and the rank round-robin in
`_run_test_sets` under a process-count shim.

Reference surface certified: sequence round-robin over ranks
(`codes/main.py:93,169`) and metric reduction to rank 0
(`codes/metrics/metric_calculator.py:99-102`).
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
import types

import numpy as np


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_WORKER = textwrap.dedent("""
    import json, os, sys, types
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    # the documented multi-host launch contract (see
    # parallel/mesh.py::maybe_init_distributed): coordinator + explicit
    # process count/id via env vars
    coord, nproc, pid = sys.argv[1], sys.argv[2], sys.argv[3]
    os.environ["JAX_COORDINATOR_ADDRESS"] = coord
    os.environ["JAX_NUM_PROCESSES"] = nproc
    os.environ["JAX_PROCESS_ID"] = pid
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tecogan_tpu.parallel import maybe_init_distributed
    maybe_init_distributed()
    maybe_init_distributed()  # idempotent re-entry must be a no-op
    assert jax.process_count() == int(nproc)
    from tecogan_tpu.main import _allgather_metrics
    calc = types.SimpleNamespace(
        avg_metric_dict={f"seq_{pid}": {"PSNR": 20.0 + int(pid)}})
    _allgather_metrics(calc)
    print("MERGED:" + json.dumps(calc.avg_metric_dict))
""")


def test_allgather_metrics_two_processes(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process is fine
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=repo)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            assert p.returncode == 0, err.decode()[-2000:]
            outs.append(out.decode())
    finally:
        # never orphan a worker on timeout/assert — it would hold the
        # coordinator port and hang the session
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MERGED:")][0]
        merged = json.loads(line[len("MERGED:"):])
        # every process ends with BOTH sequences' metrics, sorted
        assert list(merged) == ["seq_0", "seq_1"]
        assert merged["seq_0"]["PSNR"] == 20.0
        assert merged["seq_1"]["PSNR"] == 21.0


def test_run_test_sets_round_robin_shim(tmp_path, rng, monkeypatch):
    """With a world=2 shim, each rank only infers its own sequences and the
    allgather merge produces the full metric dict."""
    import cv2

    import tecogan_tpu.main as main_mod
    from tecogan_tpu.models import define_model

    gt_root = tmp_path / "GT"
    for name in ("seq_a", "seq_b", "seq_c"):
        d = gt_root / name
        d.mkdir(parents=True)
        base = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        for i in range(3):
            cv2.imwrite(str(d / f"{i:04d}.png"), np.roll(base, i, axis=1))

    opt = {
        "scale": 4, "manual_seed": 0, "is_train": False,
        "dataset": {
            "degradation": {"type": "BD", "sigma": 1.5},
            "test": {"name": "Toy", "gt_seq_dir": str(gt_root)},
        },
        "model": {"name": "FRVSR",
                  "generator": {"name": "FRNet", "in_nc": 3, "out_nc": 3,
                                "nf": 8, "nb": 2, "load_path": None}},
        "test": {"save_res": False, "res_dir": None, "save_json": False,
                 "json_dir": None, "padding_mode": "reflect",
                 "num_pad_front": 1},
        "metric": {"PSNR": {"colorspace": "y"}},
    }
    model = define_model(opt)

    seen_by_rank = {}
    merged_calls = []

    def fake_allgather(calc):
        merged_calls.append(dict(calc.avg_metric_dict))

    monkeypatch.setattr(main_mod, "_allgather_metrics", fake_allgather)

    import jax

    for rank in range(2):
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        merged_calls.clear()
        main_mod._run_test_sets(opt, model, "G_iter0")
        assert len(merged_calls) == 1
        seen_by_rank[rank] = sorted(merged_calls[0])

    # round-robin: rank 0 gets seqs 0 and 2, rank 1 gets seq 1; disjoint
    assert seen_by_rank[0] == ["seq_a", "seq_c"]
    assert seen_by_rank[1] == ["seq_b"]
