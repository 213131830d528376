"""Training-monitor e2e (scripts/monitor_training.py, SURVEY §2 #34).

The monitor regex-parses the train.log loss-line format — part of the
de-facto API (`format_train_msg`, reference `base_model.py:191-202`) — and
the validation JSON keyed `G_iter{N}`. The test writes both artifacts with
the REAL producers (format_train_msg, MetricCalculator's JSON layout) and
drives the script end-to-end, so a format drift on either side fails here
instead of silently producing empty plots.
"""

import json
import os.path as osp
import subprocess
import sys

REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
SCRIPT = osp.join(REPO_ROOT, "scripts", "monitor_training.py")


def _write_artifacts(exp_dir):
    from tecogan_tpu.utils.logging_utils import format_train_msg

    train_dir = osp.join(exp_dir, "train")
    json_dir = osp.join(exp_dir, "test", "metrics")
    import os

    os.makedirs(train_dir)
    os.makedirs(json_dir)

    with open(osp.join(train_dir, "train.log"), "w") as f:
        f.write("2026-08-19 12:00:00 [INFO]: start\n")  # non-loss line
        for i, it in enumerate(range(100, 600, 100)):
            msg = format_train_msg(
                epoch=i, it=it, lr_dict={"lr_G": 5e-5, "lr_D": 5e-5},
                running_log={"l_pix_G": 0.1 / (i + 1), "l_gan_G": 0.3,
                             "p_real_D": 1.2, "p_fake_D": -0.8})
            f.write(f"2026-08-19 12:00:0{i} [INFO]: {msg}\n")

    metrics = {f"G_iter{it}": {"PSNR": 24.0 + it / 1000.0,
                               "tOF": 0.30 - it / 10000.0}
               for it in (10000, 20000)}
    with open(osp.join(json_dir, "Vid4_avg.json"), "w") as f:
        json.dump(metrics, f)


def test_monitor_parses_real_log_format_and_plots(tmp_path):
    exp_dir = tmp_path / "experiments_BD" / "TecoGAN" / "Exp"
    _write_artifacts(str(exp_dir))

    # parse layer: the real log format round-trips through the regex
    sys.path.insert(0, osp.join(REPO_ROOT, "scripts"))
    try:
        import monitor_training as mt
    finally:
        sys.path.pop(0)
    series = mt.parse_log(str(exp_dir / "train" / "train.log"))
    assert set(series) == {"l_pix_G", "l_gan_G", "p_real_D", "p_fake_D"}
    assert [it for it, _ in series["l_pix_G"]] == list(range(100, 600, 100))
    assert series["p_fake_D"][0][1] == -0.8  # signed values survive

    mets = mt.parse_metrics_json(
        str(exp_dir / "test" / "metrics" / "Vid4_avg.json"))
    assert mets["PSNR"] == [(10000, 34.0), (20000, 44.0)]

    # e2e: the CLI writes the plot
    r = subprocess.run(
        [sys.executable, SCRIPT, "-m", "TecoGAN", "-d", "BD", "-e", "Exp"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
    assert r.returncode == 0, r.stderr
    assert (exp_dir / "monitor.png").exists()


def test_monitor_fails_loudly_when_nothing_to_plot(tmp_path):
    r = subprocess.run(
        [sys.executable, SCRIPT, "-m", "TecoGAN", "-d", "BD", "-e", "Nope"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
    assert r.returncode != 0
    assert "nothing to plot" in (r.stderr + r.stdout)
