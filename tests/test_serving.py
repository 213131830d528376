"""AOT serving export (tecogan_tpu/serving.py): export -> reload -> exact
output parity with the live jitted path, plus the artifact file format and
the CLI exporter."""

import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tecogan_tpu.models.networks import (FRNetConfig, infer_sequence_batch,
                                         init_frnet)
from tecogan_tpu.serving import (export_stream, load_artifact, load_stream,
                                 save_artifact)

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def small_case():
    cfg = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD")
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jnp.asarray(np.random.default_rng(0).random((1, 5, 16, 24, 3)),
                     jnp.float32)
    return cfg, params, lr


def test_export_reload_matches_live(small_case):
    cfg, params, lr = small_case
    blob = export_stream(params, cfg, 1, 5, 16, 24, chunk=4)
    run = load_stream(blob)
    got = run(params, lr)
    want = infer_sequence_batch(params, lr, cfg, chunk=4)
    assert got.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_artifact_roundtrip(tmp_path, small_case):
    cfg, params, lr = small_case
    blob = export_stream(params, cfg, 1, 5, 16, 24, chunk=4)
    path = str(tmp_path / "m.tecosrv")
    save_artifact(path, blob, {"h": 16, "w": 24, "scale": 4})
    run, meta = load_artifact(path)
    assert meta["w"] == 24 and meta["scale"] == 4
    want = infer_sequence_batch(params, lr, cfg, chunk=4)
    np.testing.assert_array_equal(np.asarray(run(params, lr)),
                                  np.asarray(want))


def test_artifact_rejects_non_artifact(tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(b"not an artifact at all")
    with pytest.raises(ValueError, match="bad magic"):
        load_artifact(str(p))


def test_exported_shape_mismatch_is_loud(small_case):
    cfg, params, lr = small_case
    blob = export_stream(params, cfg, 1, 5, 16, 24, chunk=4)
    run = load_stream(blob)
    with pytest.raises(Exception):
        jax.block_until_ready(run(params, lr[:, :, :8]))  # wrong height


def test_cli_exporter(tmp_path, small_case):
    cfg, params, _ = small_case
    from tecogan_tpu.utils.ckpt import save_pytree
    ckpt = str(tmp_path / "G_iter1.npz")
    save_pytree(params, ckpt)
    out = str(tmp_path / "m.tecosrv")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "scripts", "export_serving.py"),
         "--ckpt", ckpt, "--out", out, "--height", "16", "--width", "24",
         "--frames", "5", "--chunk", "4", "--nf", "8", "--nb", "2",
         "--compute_dtype", "float32"],
        capture_output=True, text=True,
        env={**__import__("os").environ, "JAX_PLATFORM_NAME": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "exported" in r.stdout
    run, meta = load_artifact(out)
    assert meta["nf"] == 8 and meta["t"] == 5


def test_export_bf16_compute_path(tmp_path):
    """The production artifact is the bf16 streaming path — pin that the
    exported program matches the live bf16 path exactly too."""
    cfg = FRNetConfig(nf=8, nb=2, scale=4, degradation="BD",
                      compute_dtype="bfloat16")
    params = init_frnet(jax.random.PRNGKey(0), cfg)
    lr = jnp.asarray(np.random.default_rng(1).random((1, 5, 16, 24, 3)),
                     jnp.float32)
    blob = export_stream(params, cfg, 1, 5, 16, 24, chunk=4)
    run = load_stream(blob)
    want = infer_sequence_batch(params, lr, cfg, chunk=4)
    np.testing.assert_array_equal(np.asarray(run(params, lr)),
                                  np.asarray(want))


def test_cross_platform_export_bakes_target_kernels(small_case):
    """Exporting FROM this (CPU) box FOR TPU must bake the TPU kernel
    dispatch — the Pallas warp as a Mosaic custom call — instead of the
    ambient backend's slow XLA-gather warp (ADVICE r4: a cpu-traced
    'tpu' artifact silently shipped the ~6x slower warp). And a
    multi-platform request is rejected: kernel dispatch differs per
    platform, one traced program cannot carry both."""
    from jax import export as jax_export

    cfg, params, _lr = small_case
    if jax.default_backend() == "tpu":
        pytest.skip("needs a non-TPU exporting host to prove the threading")
    blob = export_stream(params, cfg, 1, 5, 16, 24, chunk=4,
                         platforms=("tpu",))
    exp = jax_export.deserialize(blob)
    assert exp.platforms == ("tpu",)
    assert "tpu_custom_call" in exp.mlir_module()  # Pallas warp baked in

    # and a cpu-target artifact must NOT embed Mosaic custom calls
    blob_cpu = export_stream(params, cfg, 1, 5, 16, 24, chunk=4,
                             platforms=("cpu",))
    assert "tpu_custom_call" not in jax_export.deserialize(
        blob_cpu).mlir_module()

    with pytest.raises(ValueError, match="one platform"):
        export_stream(params, cfg, 1, 5, 16, 24, platforms=("cpu", "tpu"))
