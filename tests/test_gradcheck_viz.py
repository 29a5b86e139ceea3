"""Gradient-check utility tests (the reference's gradient-checking
feature, ``svhn/test_eae.py:12,42``) and visualization smoke tests."""

import os

import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.ops import density as dens
from autoencoder_based_image_compression_tpu.ops.gradcheck import check_grad

PPI = 4
MAX_ITVS = 8


def test_gradcheck_density_loss_wrt_parameters():
    # The MISE surrogate's gradient w.r.t. the density parameters goes
    # through the take_along_axis gather - the trickiest autodiff path.
    rng = numpy.random.default_rng(0)
    samples = jnp.asarray(rng.uniform(-3.0, 3.0, size=(1, 40)).astype(numpy.float32))
    table = dens.init_density_table(1, PPI, MAX_ITVS, nb_itvs_init=4)
    mask = dens.active_mask(table.nb_itvs_per_side, PPI, MAX_ITVS)

    def loss(parameters):
        prob = dens.approximate_probability(samples, parameters, PPI, MAX_ITVS)
        return dens.loss_density_approximation(prob, parameters, mask, PPI)

    check_grad(loss, numpy.asarray(table.parameters), rtol=2e-2, atol=1e-4)


def test_gradcheck_entropy_wrt_samples():
    # The entropy gradient that the reference injects at the latent
    # layer by hand (svhn/eae/EntropyAutoencoder.py:975-980).
    rng = numpy.random.default_rng(1)
    table = dens.init_density_table(1, PPI, MAX_ITVS, nb_itvs_init=4)
    samples0 = rng.uniform(-2.0, 2.0, size=(1, 12)).astype(numpy.float32)
    # Keep samples away from grid knots where the piecewise-linear pdf
    # is non-differentiable.
    samples0 = numpy.round(samples0 * PPI) / PPI + 0.11

    def entropy(samples):
        prob = dens.approximate_probability(jnp.asarray(samples), table.parameters,
                                            PPI, MAX_ITVS)
        return dens.approximate_entropy(prob, jnp.ones((1,), jnp.float32))

    check_grad(entropy, samples0, rtol=2e-2, atol=1e-4)


def test_visualizations_write_files(tmp_path):
    from autoencoder_based_image_compression_tpu.eval import visualization as viz

    rng = numpy.random.default_rng(2)
    grid = dens.table_grid(PPI, MAX_ITVS)
    data = rng.normal(size=(2, 8, 8, 3)).astype(numpy.float32)
    pdfs = numpy.tile(1.0 / (numpy.pi * (1.0 + grid ** 2)), (3, 1))
    paths = [str(tmp_path / f"hist_{i}.png") for i in range(3)]
    viz.normed_histogram(data, grid, pdfs, [f"map {i}" for i in range(3)], paths)
    weights = rng.normal(size=(9, 9, 1, 8)).astype(numpy.float32)
    viz.visualize_weights(weights, 4, str(tmp_path / "weights.png"))
    latents = rng.normal(size=(4, 6, 8)).astype(numpy.float32)
    viz.visualize_representation(latents, 4, str(tmp_path / "latents.png"))
    viz.plot_nb_dead_feature_maps([0.1, 0.2, 0.4], [30, 12, 3],
                                  str(tmp_path / "deads.png"))
    viz.plot_training_curves({"rec": [3.0, 2.0, 1.5], "entropy": [5.0, 4.0, 3.9]},
                             str(tmp_path / "curves.png"))
    for name in ("hist_0.png", "weights.png", "latents.png", "deads.png", "curves.png"):
        assert os.path.getsize(tmp_path / name) > 0
