"""Perf canary (round-4 verdict next-step #7): the committed BENCHMARKS
headline numbers are regression-GUARDED, not just recorded — a
layout/fusion regression now fails `bench_suite.py --check` loudly
instead of silently shipping.

The comparison logic is covered on CPU with stubbed measurements; the
real re-measurement runs TPU-gated (TECOGAN_TEST_TPU=1, alone on the
chip). Reference analogue: none — the reference's only perf statement is
the static benchmark.png table (`/root/reference/README.md:165-172`).
"""

import importlib.util
import json
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_suite():
    spec = importlib.util.spec_from_file_location(
        "bench_suite", os.path.join(REPO, "scripts", "bench_suite.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_canary_spec_is_well_formed():
    with open(os.path.join(REPO, "scripts", "perf_canary.json")) as f:
        canary = json.load(f)
    metrics = {k: v for k, v in canary.items() if not k.startswith("_")}
    assert set(metrics) == {"infer_bf16_4x_bd_fps", "frvsr_train_ms",
                            "tecogan_train_ms"}
    for name, spec in metrics.items():
        assert spec["baseline"] > 0
        assert ("min_ratio" in spec) != ("max_ratio" in spec), name
        ratio = spec.get("min_ratio", spec.get("max_ratio"))
        assert 0.5 < ratio < 2.0, (name, ratio)


def test_canary_logic_detects_regressions(monkeypatch, capsys):
    """Stubbed measurements: inside-band passes, outside-band fails, and
    --update rewrites the committed baselines."""
    suite = _load_suite()
    with open(suite._CANARY_PATH) as f:
        committed = json.load(f)
    base_fps = committed["infer_bf16_4x_bd_fps"]["baseline"]
    base_fr = committed["frvsr_train_ms"]["baseline"]
    base_tg = committed["tecogan_train_ms"]["baseline"]

    def stub(fps, fr_ms, tg_ms):
        monkeypatch.setattr(suite, "_fps_infer", lambda *a, **k: fps)
        monkeypatch.setattr(
            suite, "_train_iter",
            lambda model, **k: (fr_ms if model == "frvsr" else tg_ms)
            / 1000.0)

    # at the committed baselines: pass
    stub(base_fps, base_fr, base_tg)
    assert suite.check_canary() is True
    assert "PERF_CANARY PASS" in capsys.readouterr().out

    # FPS collapses below the floor: fail
    stub(base_fps * 0.5, base_fr, base_tg)
    assert suite.check_canary() is False
    out = capsys.readouterr().out
    assert "REGRESSION" in out and "PERF_CANARY FAIL" in out

    # train step blows past the ceiling: fail
    stub(base_fps, base_fr, base_tg * 1.5)
    assert suite.check_canary() is False
    capsys.readouterr()

    # --update writes measured values back (to a temp copy)
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        tmp = os.path.join(d, "perf_canary.json")
        shutil.copy(suite._CANARY_PATH, tmp)
        monkeypatch.setattr(suite, "_CANARY_PATH", tmp)
        stub(base_fps * 1.1, base_fr * 0.9, base_tg)
        assert suite.check_canary(update=True) is True
        with open(tmp) as f:
            updated = json.load(f)
        assert updated["infer_bf16_4x_bd_fps"]["baseline"] == round(
            base_fps * 1.1, 1)
        assert updated["frvsr_train_ms"]["baseline"] == round(
            base_fr * 0.9, 1)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="real-hardware canary: run alone on the chip "
                           "with TECOGAN_TEST_TPU=1")
def test_canary_passes_on_hardware():
    """The actual regression gate: fresh measurements of the three
    headline numbers must sit inside the committed tolerance bands."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_suite.py"),
         "--check"],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "PERF_CANARY PASS" in r.stdout
