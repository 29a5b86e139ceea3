"""Tests of the fixed-capacity piecewise-linear density model.

Oracles follow the reference test strategy
(``kodak_tensorflow/test_tfutils.py``): manual-interpolation checks and
a statistical check that, after fitting, the approximate cumulated
entropy tracks the discrete entropy of the quantized samples
(``test_tfutils.py:49-134``).
"""

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.ops import density as dens
from autoencoder_based_image_compression_tpu.ops.metrics import discrete_entropy

PPI = 5
MAX_ITVS = 16


def test_table_geometry():
    grid = dens.table_grid(PPI, MAX_ITVS)
    assert grid.shape == (2 * PPI * MAX_ITVS + 1,)
    assert grid[0] == -MAX_ITVS
    assert grid[-1] == MAX_ITVS
    assert grid[PPI * MAX_ITVS] == 0.0


def test_init_density_table_cauchy_inside_low_outside():
    table = dens.init_density_table(3, PPI, MAX_ITVS, nb_itvs_init=4)
    params = numpy.asarray(table.parameters)
    grid = dens.table_grid(PPI, MAX_ITVS)
    center = PPI * MAX_ITVS
    # Live cell: Cauchy pdf value.
    expected = 1.0 / (numpy.pi * (1.0 + grid[center + 3] ** 2))
    numpy.testing.assert_allclose(params[0, center + 3], expected, rtol=1e-6)
    # Dead cell: the LOW_PROJECTION padding value.
    numpy.testing.assert_allclose(params[1, 0], csts.LOW_PROJECTION, rtol=1e-6)
    assert int(table.nb_itvs_per_side) == 4


def test_approximate_probability_manual_interpolation():
    table = dens.init_density_table(1, PPI, MAX_ITVS, nb_itvs_init=8)
    params = numpy.asarray(table.parameters)
    x = 0.73
    samples = jnp.asarray([[x]], jnp.float32)
    prob = float(dens.approximate_probability(samples, table.parameters, PPI, MAX_ITVS)[0, 0])
    center = PPI * MAX_ITVS
    idx = int(numpy.floor(PPI * x)) + center
    left_bound = numpy.floor(PPI * x) / PPI
    expected = (params[0, idx + 1] - params[0, idx]) * (x - left_bound) * PPI + params[0, idx]
    numpy.testing.assert_allclose(prob, expected, rtol=1e-5)


def test_approximate_probability_exact_at_grid_points():
    table = dens.init_density_table(1, PPI, MAX_ITVS, nb_itvs_init=8)
    grid = dens.table_grid(PPI, MAX_ITVS)
    center = PPI * MAX_ITVS
    pts = grid[center - 10:center + 10].astype(numpy.float32)
    probs = numpy.asarray(dens.approximate_probability(
        jnp.asarray(pts[None, :]), table.parameters, PPI, MAX_ITVS))[0]
    expected = numpy.asarray(table.parameters)[0, center - 10:center + 10]
    numpy.testing.assert_allclose(probs, expected, rtol=1e-5, atol=1e-7)


def test_area_under_cauchy_init():
    # Integral of the standard Cauchy pdf over [-8, 8] = (2/pi)*atan(8).
    table = dens.init_density_table(2, PPI, MAX_ITVS, nb_itvs_init=8)
    area = numpy.asarray(dens.area_under_piecewise_linear_functions(
        table.parameters, table.nb_itvs_per_side, PPI, MAX_ITVS))
    expected = (2.0 / numpy.pi) * numpy.arctan(8.0)
    numpy.testing.assert_allclose(area, expected, rtol=1e-2)


def test_expand_table_growth_and_saturation():
    table = dens.init_density_table(1, PPI, MAX_ITVS, nb_itvs_init=4)
    # No expansion below the boundary.
    same = dens.expand_table(table, jnp.asarray(3.2), PPI, MAX_ITVS)
    assert int(same.nb_itvs_per_side) == 4
    # Reference arithmetic: new extent = ceil(max_abs) + 1.
    grown = dens.expand_table(table, jnp.asarray(5.3), PPI, MAX_ITVS)
    assert int(grown.nb_itvs_per_side) == 7
    # Equality triggers expansion too (tfutils.py:273: >=).
    eq = dens.expand_table(table, jnp.asarray(4.0), PPI, MAX_ITVS)
    assert int(eq.nb_itvs_per_side) == 5
    # Saturates at capacity.
    capped = dens.expand_table(table, jnp.asarray(1000.0), PPI, MAX_ITVS)
    assert int(capped.nb_itvs_per_side) == MAX_ITVS


def test_project_density_parameters_pins_dead_cells():
    table = dens.init_density_table(1, PPI, MAX_ITVS, nb_itvs_init=4)
    mask = dens.active_mask(table.nb_itvs_per_side, PPI, MAX_ITVS)
    dirty = table.parameters - 0.5  # some live cells now negative
    projected = numpy.asarray(dens.project_density_parameters(dirty, mask))
    assert projected.min() >= csts.LOW_PROJECTION - 1e-12
    numpy.testing.assert_allclose(projected[0, 0], csts.LOW_PROJECTION, rtol=1e-6)


def test_density_fit_tracks_discrete_entropy():
    """Statistical oracle (reference ``test_tfutils.py:49-134``): fit the
    piecewise-linear pdf to noisy Laplace samples by SGD; the resulting
    approximate cumulated entropy must track the discrete entropy of the
    quantized samples."""
    rng = numpy.random.default_rng(0)
    nb_maps, n = 2, 80000
    scale = 1.5
    samples_clean = rng.laplace(0.0, scale, size=(nb_maps, n)).astype(numpy.float32)
    noise = rng.uniform(-0.5, 0.5, size=(nb_maps, n)).astype(numpy.float32)
    samples = jnp.asarray(samples_clean + noise)
    bin_widths = jnp.ones((nb_maps,), jnp.float32)

    table = dens.init_density_table(nb_maps, PPI, MAX_ITVS)
    max_abs = jnp.max(jnp.abs(samples)) + 0.5
    table = dens.expand_table(table, max_abs, PPI, MAX_ITVS)
    mask = dens.active_mask(table.nb_itvs_per_side, PPI, MAX_ITVS)

    @jax.jit
    def sgd_step(parameters):
        def loss(p):
            prob = dens.approximate_probability(samples, p, PPI, MAX_ITVS)
            return dens.loss_density_approximation(prob, p, mask, PPI)
        grads = jax.grad(loss)(parameters)
        return dens.project_density_parameters(parameters - csts.LR_FCT * grads, mask)

    parameters = table.parameters
    for _ in range(200):
        parameters = sgd_step(parameters)

    prob = dens.approximate_probability(samples, parameters, PPI, MAX_ITVS)
    approx_cumulated = float(dens.approximate_entropy(prob, bin_widths))
    quantized = numpy.round(samples_clean)
    disc_cumulated = sum(discrete_entropy(quantized[i], 1.0) for i in range(nb_maps))
    # The approximation error of the entropy surrogate is small but
    # nonzero (the reference prints the same comparison for human
    # inspection; here it is asserted at 5%).
    assert abs(approx_cumulated - disc_cumulated) / disc_cumulated < 0.05
