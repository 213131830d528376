"""Official metric harness tests on synthetic sequences."""

import os
import os.path as osp

import cv2
import numpy as np
from tecogan_tpu.official_metrics.metrics import (
    crop_32,
    evaluate_folders,
    list_png,
    psnr_y,
)
from tecogan_tpu.metrics.ssim import ssim


def _write_seq(root, n=8, h=96, w=120, seed=0, noise=0.0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.float64)
    for i in range(n):
        img = np.roll(base, i * 3, axis=1)
        if noise:
            img = img + rng.normal(0, noise, img.shape)
        cv2.imwrite(osp.join(root, f"{i:04d}.png"),
                    np.clip(img, 0, 255).astype(np.uint8)[..., ::-1])


def test_crop_32_rules():
    img = np.zeros((96, 120, 3))
    c, y, x = crop_32(img)
    # keeps >=16 px margins: 96 -> 64, 120 -> 96
    assert c.shape == (64, 96, 3) and y == 16 and x == 12


def test_psnr_identity_and_known_value(rng):
    img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    assert psnr_y(img, img) == float("inf")
    noisy = np.clip(img.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    v = psnr_y(img, noisy)
    assert 20 < v < 40


def test_ssim_matches_definition(rng):
    a = (rng.random((64, 64)) * 255).astype(np.float64)
    assert abs(ssim(a, a, data_range=255.0) - 1.0) < 1e-9
    b = a + rng.normal(0, 20, a.shape)
    v = ssim(a, b, data_range=255.0)
    assert 0 < v < 1


def test_evaluate_folders_end_to_end(tmp_path):
    gt = str(tmp_path / "gt_seq")
    sr = str(tmp_path / "sr_seq")
    _write_seq(gt, seed=3)
    _write_seq(sr, seed=3, noise=6.0)
    out = str(tmp_path / "log")

    summary = evaluate_folders([sr], [gt], out)
    # 8 frames, cutfr=2 -> 4 scored frames; tOF skips one more
    assert summary["PSNR"][0] == 4
    assert summary["tOF"][0] == 3
    assert 20 < summary["PSNR"][1] < 45
    assert 0 < summary["SSIM"][1] <= 1
    assert osp.exists(osp.join(out, "metrics.csv"))
    assert osp.exists(osp.join(out, "metricsfile.txt"))

    # identical sequences -> zero tOF
    summary2 = evaluate_folders([gt], [gt], str(tmp_path / "log2"))
    assert summary2["tOF"][1] == 0.0
    assert summary2["SSIM"][1] == 1.0


def test_evaluate_folders_parent_dir_expansion(tmp_path):
    """A parent dir of sequence subdirs expands pairwise instead of
    silently scoring 0 frames."""
    for seq in ("a", "b"):
        _write_seq(str(tmp_path / "gt" / seq), seed=3)
        _write_seq(str(tmp_path / "sr" / seq), seed=3, noise=6.0)
    summary = evaluate_folders([str(tmp_path / "sr")], [str(tmp_path / "gt")],
                               str(tmp_path / "log"))
    assert summary["PSNR"][0] == 8  # 2 seqs x 4 scored frames


def test_list_png_numeric_sort(tmp_path):
    d = str(tmp_path / "d")
    os.makedirs(d)
    for name in ["frame10.png", "frame2.png", "frame1.png", "IBx.png",
                 "notes.txt"]:
        open(osp.join(d, name), "w").close()
    files = [osp.basename(f) for f in list_png(d)]
    assert files == ["frame1.png", "frame2.png", "frame10.png"]


def test_short_sequence_does_not_poison_folder_avg(tmp_path):
    """A <=5-frame sequence scores no tOF frames; its empty series must
    not turn the cross-folder averages into NaN."""
    _write_seq(str(tmp_path / "gt_long"), n=8, seed=3)
    _write_seq(str(tmp_path / "sr_long"), n=8, seed=3, noise=6.0)
    _write_seq(str(tmp_path / "gt_short"), n=5, seed=4)
    _write_seq(str(tmp_path / "sr_short"), n=5, seed=4, noise=6.0)

    summary = evaluate_folders(
        [str(tmp_path / "sr_long"), str(tmp_path / "sr_short")],
        [str(tmp_path / "gt_long"), str(tmp_path / "gt_short")],
        str(tmp_path / "log"))
    for k, (n, frame_avg, folder_avg) in summary.items():
        assert np.isfinite(frame_avg), (k, frame_avg)
        assert np.isfinite(folder_avg), (k, folder_avg)
    # the long sequence still contributes its 3 tOF frames
    assert summary["tOF"][0] == 3


def test_crop_32_rejects_tiny_images():
    """Dims < 48 px leave no 32-multiple inside the 16 px margins; an
    empty crop used to emit NaN metrics with only a numpy warning."""
    import pytest

    with pytest.raises(ValueError, match="too small"):
        crop_32(np.zeros((40, 64, 3), np.uint8))


def test_evaluate_folders_refuses_empty_pair_list(tmp_path):
    """With nothing scorable, appending 0.0 Avg rows to a (possibly
    stale) metrics.csv would read as a successful zero-score run."""
    import pytest

    out = tmp_path / "out"
    with pytest.raises(SystemExit, match="no scorable"):
        evaluate_folders([str(tmp_path / "missing_r")],
                         [str(tmp_path / "missing_t")], str(out))


def test_missing_leading_frame_pairs_by_basename(tmp_path):
    """A result dir lacking frame 0000 must not shift every comparison by
    one (index-zipped common prefix); frames pair by basename and score
    identically to the full-sequence run minus the dropped frame."""
    gt = str(tmp_path / "gt_seq")
    sr = str(tmp_path / "sr_seq")
    _write_seq(gt, n=9, seed=3)
    _write_seq(sr, n=9, seed=3, noise=6.0)
    os.remove(osp.join(sr, "0000.png"))

    summary = evaluate_folders([sr], [gt], str(tmp_path / "log"))
    # 8 matched frames (0001..0008), cutfr=2 -> 4 scored
    assert summary["PSNR"][0] == 4
    # aligned pairs: SR vs its own GT frame differs only by the noise, so
    # PSNR stays in the ~6-noise band; a one-frame misalignment (roll by
    # 3 px) would collapse it far below
    assert 25 < summary["PSNR"][1] < 45

    # disjoint names with unequal counts refuse loudly
    import pytest

    ren = str(tmp_path / "sr_ren")
    os.makedirs(ren)
    for i, f in enumerate(sorted(os.listdir(sr))):
        cv2.imwrite(osp.join(ren, f"out{i:03d}.png"),
                    cv2.imread(osp.join(sr, f)))
    with pytest.raises(SystemExit, match="no basenames match"):
        evaluate_folders([ren], [gt], str(tmp_path / "log2"))


def test_unequal_dir_lists_refuse(tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="pair positionally"):
        evaluate_folders(["a", "b"], ["c"], str(tmp_path / "log"))


def test_all_sequences_too_short_is_loud(tmp_path):
    """Every sequence <=4 frames (2*cutfr) -> nothing scorable; a 0.0
    summary would read as a real zero-score evaluation."""
    import pytest

    _write_seq(str(tmp_path / "gt"), n=4, seed=4)
    _write_seq(str(tmp_path / "sr"), n=4, seed=4, noise=6.0)
    with pytest.raises(SystemExit, match="no frames were scorable"):
        evaluate_folders([str(tmp_path / "sr")], [str(tmp_path / "gt")],
                         str(tmp_path / "log"))


def test_metric_calculator_accepts_empty_yaml_body():
    """'metric:\\n  PSNR:' parses to {'PSNR': None} — defaults apply
    instead of an AttributeError on NoneType."""
    from tecogan_tpu.metrics.metric_calculator import MetricCalculator

    mc = MetricCalculator({"metric": {"PSNR": None, "SSIM": None}})
    assert mc.psnr_colorspace == "y"


def test_unreadable_png_raises_with_filename(tmp_path):
    import pytest

    from tecogan_tpu.official_metrics.metrics import _read_rgb

    bad = tmp_path / "trunc.png"
    bad.write_bytes(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(IOError, match="trunc.png"):
        _read_rgb(str(bad))


def test_metric_calculator_rejects_unknown_metric():
    import pytest

    from tecogan_tpu.metrics.metric_calculator import MetricCalculator

    with pytest.raises(ValueError, match="tLP100"):
        MetricCalculator({"metric": {"PSNR": {}, "tLP100": {}}})


def test_metric_calculator_single_frame_tof_does_not_poison_average(rng):
    """tOF needs >=2 frames; a 1-frame sequence's NaN must not NaN the
    dataset-wide average."""
    from tecogan_tpu.metrics.metric_calculator import MetricCalculator

    calc = MetricCalculator(
        {"metric": {"PSNR": {"colorspace": "y"}, "tOF": {}}})
    two = (rng.random((2, 48, 48, 3)) * 255).astype(np.uint8)
    one = (rng.random((1, 48, 48, 3)) * 255).astype(np.uint8)
    calc.compute_sequence_metrics("two", two, two)
    calc.compute_sequence_metrics("one", one, one)
    calc.gather(["two", "one"])
    avg = calc.average()
    assert np.isnan(calc.avg_metric_dict["one"]["tOF"])
    assert not np.isnan(avg["tOF"]), avg
    assert not np.isnan(avg["PSNR"])


def test_ssim_rejects_sub_window_images():
    import pytest

    with pytest.raises(ValueError, match="win_size"):
        ssim(np.ones((5, 5)), np.ones((5, 5)), 255.0)


def test_evaluate_cli_refuses_bad_or_missing_model(tmp_path, monkeypatch):
    import pytest

    from tecogan_tpu.official_metrics import evaluate

    with pytest.raises(SystemExit, match="TecoGAN"):
        evaluate.main(["-m", "TecoGAN"])  # malformed name
    monkeypatch.chdir(tmp_path)  # no results/ anywhere
    with pytest.raises(SystemExit, match="no results"):
        evaluate.main(["-m", "TecoGAN_BD_iter500000"])


# ---------------------------------------------------------------------------
# SSIM pinning (round-5 verdict #5): skimage is absent in this environment,
# so the estimator is pinned three independent ways — closed-form analytic
# cases, a literal per-window textbook oracle (verifying the 7x7 uniform
# window, N/(N-1) sample covariance and the half-window border crop that
# skimage's compare_ssim documents), and a committed golden value for a
# fixed random pair as the regression stand-in for the absent oracle.
# Reference column: `official_metrics/metrics.py:74-75`.
# ---------------------------------------------------------------------------

def _brute_ssim(x, y, data_range, win=7, k1=0.01, k2=0.03):
    """Independent SSIM oracle: Wang et al. (2004) eq. 13 evaluated by a
    literal loop over every FULL window (np.var/np.cov with ddof=1), then
    the plain mean over windows — which is exactly skimage's documented
    crop of the (win//2)-pixel border before averaging."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    vals = []
    for i in range(x.shape[0] - win + 1):
        for j in range(x.shape[1] - win + 1):
            px = x[i:i + win, j:j + win].ravel()
            py = y[i:i + win, j:j + win].ravel()
            mx, my = px.mean(), py.mean()
            vx, vy = px.var(ddof=1), py.var(ddof=1)
            vxy = np.cov(px, py, ddof=1)[0, 1]
            vals.append(((2 * mx * my + c1) * (2 * vxy + c2))
                        / ((mx * mx + my * my + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_ssim_constant_images_analytic():
    """For constant images a, b every window is identical and SSIM is the
    closed form (2ab+c1)/(a^2+b^2+c1) (variances and covariance vanish,
    the c2 terms cancel)."""
    a, b = 100.0, 120.0
    c1 = (0.01 * 255.0) ** 2
    want = (2 * a * b + c1) / (a * a + b * b + c1)
    got = ssim(np.full((16, 16), a), np.full((16, 16), b), 255.0)
    assert abs(got - want) < 1e-12
    # luminance-only shift: adding a constant changes only the mean term
    img = np.linspace(0, 255, 16 * 16).reshape(16, 16)
    got2 = ssim(img, img + 0.0, 255.0)
    assert abs(got2 - 1.0) < 1e-12


def test_ssim_matches_brute_force_window_oracle(rng):
    """Machine-epsilon agreement with the literal per-window textbook
    implementation on random, structured and mixed images — pins the
    window size, sample-covariance normalisation AND the border-crop
    convention at once."""
    a = np.round(rng.random((24, 26)) * 255.0)
    b = np.clip(np.round(a + rng.normal(0, 12, a.shape)), 0, 255)
    step = np.zeros((20, 22))
    step[:, 11:] = 200.0
    cases = [(a, b), (step, np.roll(step, 1, axis=1)),
             (a[:20, :22], step)]
    for x, y in cases:
        assert abs(ssim(x, y, 255.0) - _brute_ssim(x, y, 255.0)) < 1e-12


def test_ssim_golden_value_pinned():
    """Committed golden value for a FIXED image pair — the regression
    stand-in for the absent skimage oracle (the value was cross-checked
    against the brute-force window oracle at machine epsilon when
    committed). Any estimator change that moves a published-parity
    column fails here first. The inputs are closed-form (sin/cos
    lattices), NOT an rng stream — NEP 19 allows numpy to change
    Generator bit streams across feature releases, which would shift
    rng-derived inputs and fail the pin with no estimator change."""
    i, j = np.meshgrid(np.arange(24.0), np.arange(26.0), indexing="ij")
    a = np.round((np.sin(0.7 * i) * np.cos(1.3 * j) * 0.5 + 0.5) * 255.0)
    b = np.clip(np.round(a + 12.0 * np.sin(2.1 * i + 0.3 * j)), 0.0, 255.0)
    assert abs(_brute_ssim(a, b, 255.0) - ssim(a, b, data_range=255.0)) \
        < 1e-12
    assert abs(ssim(a, b, data_range=255.0) - 0.99110234271506) < 1e-12
