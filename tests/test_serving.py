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
    run, meta, params_back = load_artifact(path)
    assert meta["w"] == 24 and meta["scale"] == 4
    assert params_back is None  # weights-free save
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
    run, meta, params_back = load_artifact(out)
    assert meta["nf"] == 8 and meta["t"] == 5
    # the CLI embeds weights by default -> self-contained bundle
    import jax as _jax
    for a, b in zip(_jax.tree.leaves(params_back),
                    _jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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

    # case-insensitive: "TPU" must lower to the name jax.export matches
    # case-sensitively, not crash inside lowering
    exp_up = jax_export.deserialize(
        export_stream(params, cfg, 1, 5, 16, 24, chunk=4,
                      platforms=("TPU",)))
    assert exp_up.platforms == ("tpu",)

    # an empty sequence is a loud error, not an IndexError
    with pytest.raises(ValueError, match="at least one"):
        export_stream(params, cfg, 1, 5, 16, 24, platforms=())


# ---------------------------------------------------------------- serve CLI


def test_serve_cli_end_to_end(tmp_path, small_case):
    """python -m tecogan_tpu.serve: PNG-in -> PNG-out purely from a
    self-contained artifact (embedded weights), exactly matching the live
    batched streaming path — incl. a short sequence (tail-pad + trim) and
    the reflect pre-roll trim."""
    import cv2

    from tecogan_tpu.ops import save_sequence

    cfg, params, _ = small_case
    t, h, w = 6, 16, 24
    blob = export_stream(params, cfg, 1, t, h, w, chunk=4)
    art = str(tmp_path / "m.tecosrv")
    save_artifact(art, blob, {"n": 1, "t": t, "h": h, "w": w, "scale": 4,
                              "nf": 8, "nb": 2}, params=params)

    rng = np.random.default_rng(7)
    in_root = tmp_path / "lr"
    seq_frames = {}
    for name, t_seq in (("clipA", t), ("clipB", t - 2)):  # full + short
        frames = (rng.random((t_seq, h, w, 3)) * 255).astype(np.uint8)
        save_sequence(str(in_root / name), frames, to_bgr=True)
        seq_frames[name] = frames

    out_root = tmp_path / "sr"
    r = subprocess.run(
        [sys.executable, "-m", "tecogan_tpu.serve", art, str(in_root),
         str(out_root)],
        capture_output=True, text=True, cwd=REPO,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "JAX_PLATFORM_NAME": "cpu"})
    assert r.returncode == 0, r.stderr

    for name, frames in seq_frames.items():
        lr = frames.astype(np.float32) / 255.0
        t_seq = len(lr)
        padded = np.concatenate(
            [lr] + [lr[-1:]] * (t - t_seq), axis=0)[None]
        want = np.asarray(infer_sequence_batch(
            params, jnp.asarray(padded), cfg, chunk=4))[0, :t_seq]
        got = np.stack([
            cv2.imread(str(out_root / name / f"{i:04d}.png"))[..., ::-1]
            for i in range(t_seq)])
        np.testing.assert_array_equal(got, want)


def test_serve_cli_pad_front_and_ckpt_override(tmp_path, small_case):
    """--pad_front reproduces the test-mode reflect pre-roll (padded
    frames trimmed), and --ckpt overrides on a weights-free artifact."""
    import cv2

    from tecogan_tpu.ops import save_sequence
    from tecogan_tpu.serve import serve
    from tecogan_tpu.utils.ckpt import save_pytree

    cfg, params, _ = small_case
    t, h, w, pad = 7, 16, 24, 2
    blob = export_stream(params, cfg, 1, t, h, w, chunk=4)
    art = str(tmp_path / "nw.tecosrv")
    save_artifact(art, blob, {"n": 1, "t": t, "h": h, "w": w, "scale": 4,
                              "nf": 8, "nb": 2})  # weights-free

    # no embedded weights and no --ckpt -> loud
    rng = np.random.default_rng(3)
    frames = (rng.random((t - pad, h, w, 3)) * 255).astype(np.uint8)
    save_sequence(str(tmp_path / "lr" / "clip"), frames, to_bgr=True)
    with pytest.raises(ValueError, match="no embedded weights"):
        serve(art, str(tmp_path / "lr"), str(tmp_path / "sr0"), quiet=True)

    ckpt = str(tmp_path / "G.npz")
    save_pytree(params, ckpt)
    serve(art, str(tmp_path / "lr"), str(tmp_path / "sr"), ckpt=ckpt,
          pad_front=pad, quiet=True)

    lr = frames.astype(np.float32) / 255.0
    pre = lr[1:1 + pad][::-1]                      # reflect pre-roll
    want = np.asarray(infer_sequence_batch(
        params, jnp.asarray(np.concatenate([pre, lr])[None]), cfg,
        chunk=4))[0, pad:]
    got = np.stack([
        cv2.imread(str(tmp_path / "sr" / "clip" / f"{i:04d}.png"))[..., ::-1]
        for i in range(t - pad)])
    np.testing.assert_array_equal(got, want)

    # a pre-roll longer than the clip is the same loud contract as test
    # mode (base.pad_sequence), NOT a silent clamp that would serve
    # different outputs than `--mode test`
    with pytest.raises(ValueError, match="pad_front"):
        serve(art, str(tmp_path / "lr"), str(tmp_path / "sr2"), ckpt=ckpt,
              pad_front=t - pad, quiet=True)


def test_serve_ambiguous_layout_is_loud(tmp_path):
    """A stray loose image next to sequence sub-directories must not
    silently shadow (or be shadowed by) the real sequences."""
    import cv2

    from tecogan_tpu.serve import discover_sequences

    root = tmp_path / "lr"
    (root / "clipA").mkdir(parents=True)
    img = np.zeros((4, 4, 3), np.uint8)
    cv2.imwrite(str(root / "clipA" / "0000.png"), img)
    cv2.imwrite(str(root / "thumbnail.png"), img)  # the stray
    with pytest.raises(ValueError, match="loose image frames"):
        discover_sequences(str(root))


def test_serve_jpeg_in_png_out(tmp_path, small_case):
    """jpeg inputs are accepted but outputs are always PNG (lossless) —
    bit-exact vs the live path fed the same decoded jpeg frames."""
    import cv2

    cfg, params, _ = small_case
    t, h, w = 6, 16, 24
    blob = export_stream(params, cfg, 1, t, h, w, chunk=4)
    art = str(tmp_path / "m.tecosrv")
    save_artifact(art, blob, {"n": 1, "t": t, "h": h, "w": w, "scale": 4,
                              "nf": 8, "nb": 2}, params=params)

    from tecogan_tpu.serve import serve

    rng = np.random.default_rng(11)
    seq_dir = tmp_path / "lr" / "clipJ"
    seq_dir.mkdir(parents=True)
    for i in range(t):
        fr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(seq_dir / f"{i:04d}.jpg"), fr)

    serve(art, str(tmp_path / "lr"), str(tmp_path / "sr"), quiet=True)

    out_dir = tmp_path / "sr" / "clipJ"
    names = sorted(p.name for p in out_dir.iterdir())
    assert names == [f"{i:04d}.png" for i in range(t)]

    # exactness vs the live path on the DECODED (lossy-in, that's fine)
    # jpeg frames — the output encoding itself must be lossless
    lr = np.stack([
        cv2.imread(str(seq_dir / f"{i:04d}.jpg"))[..., ::-1]
        for i in range(t)]).astype(np.float32) / 255.0
    want = np.asarray(infer_sequence_batch(
        params, jnp.asarray(lr[None]), cfg, chunk=4))[0]
    got = np.stack([
        cv2.imread(str(out_dir / f"{i:04d}.png"))[..., ::-1]
        for i in range(t)])
    np.testing.assert_array_equal(got, want)
