"""RD-sweep driver tests (small model, CPU)."""

import jax
import numpy

from autoencoder_based_image_compression_tpu.eval import rd_sweep
from autoencoder_based_image_compression_tpu.models import conv_eae


def _setup(seed=0):
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(seed), True)
    rng = numpy.random.default_rng(seed)
    images = rng.integers(16, 236, size=(4, 32, 32)).astype(numpy.uint8)
    return (params, images)


def test_compute_rate_psnr_shapes_and_positive():
    (params, images) = _setup()
    bin_widths = numpy.ones(128, numpy.float32)
    (rates, psnrs, reconstructions, nb_deads) = rd_sweep.compute_rate_psnr(
        images, params, bin_widths, True, batch_size=4)
    assert rates.shape == (4,) and psnrs.shape == (4,)
    assert numpy.all(rates >= 0.0) and numpy.all(psnrs > 0.0)
    assert reconstructions.shape == (4, 32, 32)
    assert nb_deads.shape == (4,)


def test_rate_decreases_with_coarser_bins():
    (params, images) = _setup(1)
    fine = rd_sweep.compute_rate_psnr(images, params,
                                      numpy.full(128, 0.5, numpy.float32), True, 4)
    coarse = rd_sweep.compute_rate_psnr(images, params,
                                        numpy.full(128, 4.0, numpy.float32), True, 4)
    assert numpy.mean(coarse[0]) < numpy.mean(fine[0])


def test_fix_gamma_caches(tmp_path):
    (params, images) = _setup(2)
    bin_widths = numpy.ones(128, numpy.float32)
    multipliers = [1.0, 4.0]
    (rates_1, psnrs_1, deads_1) = rd_sweep.fix_gamma(
        images, params, bin_widths, True, multipliers, 4, str(tmp_path))
    assert rates_1.shape == (2, 4)
    # Second call must come from the .npy cache (mutate params to prove it).
    params_mutated = dict(params)
    params_mutated["weights_1"] = 0.0 * params_mutated["weights_1"]
    (rates_2, psnrs_2, deads_2) = rd_sweep.fix_gamma(
        images, params_mutated, bin_widths, True, multipliers, 4, str(tmp_path))
    numpy.testing.assert_array_equal(rates_1, rates_2)
    numpy.testing.assert_array_equal(psnrs_1, psnrs_2)
    assert deads_1.shape == (2, 4)
    numpy.testing.assert_array_equal(deads_1, deads_2)


def test_fix_gamma_cache_keyed_on_experiment_identity(tmp_path):
    """A different experiment_id must MISS the cache: re-running with
    another model/step cannot return the previous model's curves."""
    (params, images) = _setup(3)
    bin_widths = numpy.ones(128, numpy.float32)
    multipliers = [1.0, 4.0]
    (rates_1, _, _) = rd_sweep.fix_gamma(images, params, bin_widths, True,
                                         multipliers, 4, str(tmp_path),
                                         experiment_id="0dot5_10000_s100")
    params_mutated = dict(params)
    params_mutated["weights_1"] = 0.0 * params_mutated["weights_1"]
    (rates_2, _, _) = rd_sweep.fix_gamma(images, params_mutated, bin_widths, True,
                                         multipliers, 4, str(tmp_path),
                                         experiment_id="0dot5_10000_s200")
    assert not numpy.array_equal(rates_1, rates_2)


def test_bjontegaard_summary_identical_curves(tmp_path):
    rates = numpy.tile(numpy.array([[0.1], [0.3], [0.6], [1.0]]), (1, 3))
    psnrs = numpy.tile(numpy.array([[28.0], [31.0], [34.0], [37.0]]), (1, 3))
    delta = rd_sweep.bjontegaard_summary(rates, psnrs, rates.T, psnrs.T,
                                         path=str(tmp_path / "bd.pkl"))
    numpy.testing.assert_allclose(delta, 0.0, atol=1e-9)
    import pickle

    with open(tmp_path / "bd.pkl", "rb") as file:
        assert "bjontegaard_percent_saving" in pickle.load(file)


def test_plot_rate_distortion_writes(tmp_path):
    path = str(tmp_path / "rd.png")
    rd_sweep.plot_rate_distortion(
        [(numpy.array([0.1, 0.5]), numpy.array([30.0, 36.0]), "a", "o-"),
         (numpy.array([0.2, 0.6]), numpy.array([31.0, 37.0]), "b", "x--")],
        "test", path)
    import os

    assert os.path.getsize(path) > 0
