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
    # --gammas excludes 10000 on purpose: the fixed-bw (1.0, 10000)
    # sweep model must still be trained (it feeds the stats collection,
    # the params export and the multiplier sweep unconditionally);
    # this used to crash with FileNotFoundError after training.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, AEIC_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)  # no need for 8 virtual devices here
    result = subprocess.run(
        [sys.executable, os.path.join(repo_root, "scripts", "rd_campaign.py"),
         "--smoke", "--gammas", "12000",
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
    # Trained params-only artifacts exported for both sweep models,
    # step-stamped consistently with the coding-statistics marker.
    import json

    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        params_artifact_step)

    for exp in ("learning_bw/0dot5_10000", "fixed_bw/1_10000"):
        artifact = tmp_path / "results" / exp / "params_trained.npz"
        assert artifact.is_file()
        step = params_artifact_step(str(artifact))
        assert step is not None and step > 0
        marker = tmp_path / "results" / exp / "statistics" / "stats_model_idx.json"
        assert json.loads(marker.read_text())["step"] == step


def test_build_data_regenerates_stale_stacks(tmp_path):
    """A smoke-sized stack left in --data_root must not be silently
    reused by a full-config run (shape validation regenerates it)."""
    import numpy

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.rd_campaign import build_data

    root = str(tmp_path / "data")
    build_data(root, 4, 2, 2, 64, (2, 128, 192))
    assert numpy.load(os.path.join(root, "training_data.npy")).shape == (4, 64, 64, 1)
    build_data(root, 6, 2, 2, 32, (2, 64, 96))
    assert numpy.load(os.path.join(root, "training_data.npy")).shape == (6, 32, 32, 1)
    assert numpy.load(os.path.join(root, "kodak.npy")).shape == (2, 64, 96)


def test_reconstruct_kodak_ladder_flags(tmp_path, capsys):
    """Bare anchor-ladder flags mean 'default ladder', and explicit
    JPEG2000 values pin the Pillow backend when none is named (their
    semantics differ per backend, so 'auto' must not reinterpret
    them)."""
    import numpy

    from autoencoder_based_image_compression_tpu.cli import reconstruct_kodak

    kodak = str(tmp_path / "kodak.npy")
    numpy.save(kodak, numpy.zeros((0, 32, 32), numpy.uint8))
    reconstruct_kodak.main(["--jpeg2000_ladder", "24", "26", "28", "30",
                            "--path_to_kodak", kodak,
                            "--results_root", str(tmp_path / "none"),
                            "--cache_dir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "Pillow/OpenJPEG compression" in out
    # Only the (empty-stack) JPEG2000 anchor ran - no model curves.
    assert "1 RD curves written" in out


def test_reconstruct_kodak_anchor_curves_cached(tmp_path):
    """The JPEG2000 anchor is cached keyed by backend+ladder+content:
    a second run must not recompute it, and a different ladder must
    miss the cache (anchor recomputation dominated study-regeneration
    time in round 3)."""
    import numpy

    from autoencoder_based_image_compression_tpu.cli import reconstruct_kodak

    rng = numpy.random.default_rng(0)
    kodak = str(tmp_path / "kodak.npy")
    numpy.save(kodak, rng.integers(16, 236, size=(2, 32, 32)).astype(numpy.uint8))
    out = tmp_path / "out"
    args = ["--jpeg2000_ladder", "24", "12",
            "--path_to_kodak", kodak,
            "--results_root", str(tmp_path / "none"),
            "--cache_dir", str(out)]
    reconstruct_kodak.main(args)
    cached = sorted(out.glob("rates_jpeg2000_*.npy"))
    assert len(cached) == 1
    mtime = cached[0].stat().st_mtime_ns
    reconstruct_kodak.main(args)
    assert cached[0].stat().st_mtime_ns == mtime  # untouched: cache hit
    reconstruct_kodak.main(["--jpeg2000_ladder", "24", "16",
                            "--path_to_kodak", kodak,
                            "--results_root", str(tmp_path / "none"),
                            "--cache_dir", str(out)])
    assert len(sorted(out.glob("rates_jpeg2000_*.npy"))) == 2  # new key


def test_micro_campaign_ladder_vmap(tmp_path):
    """Same micro campaign driven through the vmapped whole-ladder
    trainer (one program trains every fixed-bw gamma simultaneously)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, AEIC_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)
    result = subprocess.run(
        [sys.executable, os.path.join(repo_root, "scripts", "rd_campaign.py"),
         "--smoke", "--gammas", "10000", "12000", "--ladder_vmap",
         "--data_root", str(tmp_path / "data"),
         "--results_root", str(tmp_path / "results"),
         "--out", str(tmp_path / "out")],
        cwd=repo_root, env=env, capture_output=True, text=True, timeout=900)
    assert result.returncode == 0, result.stdout + result.stderr
    assert "one vmapped program" in result.stdout, result.stdout
    assert (tmp_path / "out" / "rate_distortion.png").is_file(), result.stdout
    # Ladder-trained checkpoints feed the standard pipeline.
    for gamma_dir in ("1_10000", "1_12000"):
        assert (tmp_path / "results" / "fixed_bw" / gamma_dir
                / "model_1.npz").is_file()


def test_part_done_rejects_interrupted_checkpoints(tmp_path):
    """Per-epoch saves are intermediate; only a completion-stamped
    checkpoint counts as a trained part (an interrupted part is removed
    and retrained instead of silently feeding the RD study)."""
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.rd_campaign import _part_done

    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        mark_checkpoint_complete,
        save_checkpoint,
    )
    from autoencoder_based_image_compression_tpu.train.state import (
        init_train_state)

    state = init_train_state(jax.random.PRNGKey(0), 10000.0, 1.0, False)
    path = str(tmp_path / "model_1")
    save_checkpoint(path, state)
    assert not _part_done(path)              # interrupted: removed...
    assert not os.path.isfile(path + ".npz")
    save_checkpoint(path, state)
    mark_checkpoint_complete(path)
    assert _part_done(path)                  # ...finished: accepted


def test_reconstruct_kodak_from_params_exports(tmp_path, capsys):
    """With no train-state checkpoints on disk, the RD sweep regenerates
    every model curve from the version-controlled params_trained.npz
    exports alone (the repo's committed model zoo)."""
    import jax
    import numpy

    from autoencoder_based_image_compression_tpu.cli import reconstruct_kodak
    from autoencoder_based_image_compression_tpu.models import conv_eae
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        save_params_artifact)
    from autoencoder_based_image_compression_tpu.utils.naming import (
        experiment_suffix)

    results = tmp_path / "results"
    # A two-gamma fixed-bw ladder + the learned-bw sweep model, as
    # params-only exports.
    for (bw_init, gamma, learn_bw) in [(1.0, 10000.0, False),
                                       (1.0, 24000.0, False),
                                       (0.5, 10000.0, True)]:
        params = conv_eae.init_conv_eae_params(
            jax.random.PRNGKey(int(gamma) % 97), learn_bw)
        bin_widths = numpy.full(128, bw_init, numpy.float32)
        save_params_artifact(
            str(results / experiment_suffix(bw_init, gamma, learn_bw)
                / "params_trained.npz"),
            params, bin_widths, step=4321)
    kodak = str(tmp_path / "kodak.npy")
    rng = numpy.random.default_rng(0)
    numpy.save(kodak, rng.integers(16, 236, (4, 32, 48), numpy.uint8))

    reconstruct_kodak.main(["--path_to_kodak", kodak,
                            "--results_root", str(results),
                            "--cache_dir", str(tmp_path / "out")])
    out = capsys.readouterr().out
    assert "using the params export" in out
    # vary-gamma + learned-bw sweep + fixed-bw sweep + JPEG2000 anchor.
    assert "4 RD curves written" in out
    assert (tmp_path / "out" / "rate_distortion.png").is_file()
    # The cache keys carry the artifact step (stale-curve guard).
    assert any("s4321" in p.name for p in (tmp_path / "out").glob("*.npy"))
