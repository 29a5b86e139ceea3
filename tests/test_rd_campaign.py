"""Micro end-to-end run of the flagship RD-campaign driver.

Exercises the whole chain the reference's ``reconstructing_eae_kodak.py``
study needs - training, statistics collection, lossless-coded RD sweep,
plot - through ``scripts/rd_campaign.py`` on tiny shapes (one ladder
gamma), the way a user reproduces the paper's figure.
"""

import os
import subprocess
import sys


def test_micro_campaign(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, AEIC_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)  # no need for 8 virtual devices here
    result = subprocess.run(
        [sys.executable, os.path.join(repo_root, "scripts", "rd_campaign.py"),
         "--smoke", "--gammas", "10000",
         "--data_root", str(tmp_path / "data"),
         "--results_root", str(tmp_path / "results"),
         "--out", str(tmp_path / "out")],
        cwd=repo_root, env=env, capture_output=True, text=True, timeout=900)
    assert result.returncode == 0, result.stdout + result.stderr
    out = tmp_path / "out"
    assert (out / "rate_distortion.png").is_file(), result.stdout
    # Three EAE curve families (the single-gamma ladder + both sweeps)
    # were evaluated and cached.
    cached = list(out.glob("*.npy"))
    assert len(cached) >= 6, (cached, result.stdout)
    # Trained params-only artifacts exported for both sweep models.
    assert (tmp_path / "results" / "learning_bw" / "0dot5_10000"
            / "params_trained.npz").is_file()
    assert (tmp_path / "results" / "fixed_bw" / "1_10000"
            / "params_trained.npz").is_file()
