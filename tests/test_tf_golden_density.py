"""Golden tests: our density/entropy math vs the REFERENCE ``tfutils.py``.

Unlike ``test_tf_parity.py`` (which re-expresses the reference formulas
in TF ops), these tests import and execute the reference's own
``kodak_tensorflow/tfutils/tfutils.py`` under ``tf.compat.v1`` graph
mode, and assert that ``ops/density.py`` agrees to ~1e-6 on shared
inputs (VERDICT round 1, item 2):

* ``approximate_probability`` / ``index_linear_piece`` — the fixed-
  capacity table must reproduce the reference's live-table gather
  arithmetic up to the static center offset;
* ``differential_entropy`` / ``approximate_entropy``;
* ``loss_density_approximation`` (MISE surrogate) — our masked
  quadratic term vs the reference's full live table;
* ``area_under_piecewise_linear_functions``;
* ``expand_all`` / ``expand_parameters`` — scalar-bump expansion vs
  the reference's concat-grown table.

Reference: ``tfutils/tfutils.py:45-361,399-443,511-552``.
"""

import importlib.util
import os
import sys

import numpy
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.ops import density

_REF_TFUTILS = "/root/reference/kodak_tensorflow/tfutils/tfutils.py"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(_REF_TFUTILS),
    reason="reference tfutils.py not available")

PPI = csts.NB_POINTS_PER_INTERVAL
MAX_ITVS = 24  # fixed-table capacity for these tests
NB_ITVS = 10   # live half-width (the reference's initial value)
CENTER = PPI * MAX_ITVS


@pytest.fixture(scope="module")
def ref_tfutils():
    """Imports the unmodified reference tfutils with ``tensorflow``
    resolving to ``tf.compat.v1`` (the module uses TF1 API names:
    tf.log, tf.ceil, tf.random_uniform, tf.assert_*)."""
    tf1 = tf.compat.v1
    spec = importlib.util.spec_from_file_location("ref_tfutils", _REF_TFUTILS)
    module = importlib.util.module_from_spec(spec)
    original = sys.modules.get("tensorflow")
    sys.modules["tensorflow"] = tf1
    try:
        spec.loader.exec_module(module)
    finally:
        if original is not None:
            sys.modules["tensorflow"] = original
    return module


def _run_graph(build):
    """Builds `fetches = build(tf1)` inside a fresh TF1 graph and runs it."""
    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        fetches = build(tf1)
        with tf1.Session(graph=graph) as sess:
            return sess.run(fetches)


def _random_live_inputs(seed, nb_maps=8, nb_samples=400):
    """Shared inputs: live-table pdf parameters (Cauchy + jitter) and
    samples strictly inside the live extent."""
    rng = numpy.random.default_rng(seed)
    live_width = 2 * PPI * NB_ITVS + 1
    grid = (numpy.arange(live_width) - PPI * NB_ITVS) / PPI
    pdf = 1.0 / (numpy.pi * (1.0 + grid ** 2))
    parameters = numpy.maximum(
        pdf[None, :] * rng.uniform(0.7, 1.3, (nb_maps, live_width)),
        csts.LOW_PROJECTION).astype(numpy.float32)
    samples = numpy.clip(rng.laplace(0.0, 2.5, (nb_maps, nb_samples)),
                         -NB_ITVS + 1e-3, NB_ITVS - 1e-3).astype(numpy.float32)
    return (samples, parameters)


def _embed_live(parameters_live):
    """Places a live-sized reference table into our fixed-capacity one."""
    nb_maps = parameters_live.shape[0]
    width = density.table_width(PPI, MAX_ITVS)
    full = numpy.full((nb_maps, width), csts.LOW_PROJECTION, numpy.float32)
    lo = CENTER - PPI * NB_ITVS
    hi = CENTER + PPI * NB_ITVS + 1
    full[:, lo:hi] = parameters_live
    return full


def test_index_linear_piece_matches_reference(ref_tfutils):
    (samples, _) = _random_live_inputs(0)
    ref_idx = _run_graph(lambda tf1: ref_tfutils.index_linear_piece(
        tf1.constant(samples), PPI,
        tf1.constant(NB_ITVS, dtype=tf1.int64)))
    ours = numpy.asarray(density.index_linear_piece(
        jnp.asarray(samples), PPI, MAX_ITVS))
    # Same arithmetic, shifted by the static center offset.
    shift = PPI * (MAX_ITVS - NB_ITVS)
    numpy.testing.assert_array_equal(ours, ref_idx + shift)


def test_approximate_probability_matches_reference(ref_tfutils):
    (samples, parameters_live) = _random_live_inputs(1)
    ref_prob = _run_graph(lambda tf1: ref_tfutils.approximate_probability(
        tf1.constant(samples), tf1.constant(parameters_live), PPI,
        tf1.constant(NB_ITVS, dtype=tf1.int64)))
    ours = numpy.asarray(density.approximate_probability(
        jnp.asarray(samples), jnp.asarray(_embed_live(parameters_live)),
        PPI, MAX_ITVS))
    numpy.testing.assert_allclose(ours, ref_prob, rtol=1e-6, atol=1e-7)


def test_differential_and_approximate_entropy_match_reference(ref_tfutils):
    (samples, parameters_live) = _random_live_inputs(2)
    bin_widths = numpy.linspace(0.8, 2.5, samples.shape[0]).astype(numpy.float32)

    def build(tf1):
        prob = ref_tfutils.approximate_probability(
            tf1.constant(samples), tf1.constant(parameters_live), PPI,
            tf1.constant(NB_ITVS, dtype=tf1.int64))
        return (ref_tfutils.differential_entropy(prob),
                ref_tfutils.approximate_entropy(prob, tf1.constant(bin_widths)))

    (ref_diff, ref_approx) = _run_graph(build)
    our_prob = density.approximate_probability(
        jnp.asarray(samples), jnp.asarray(_embed_live(parameters_live)),
        PPI, MAX_ITVS)
    our_diff = numpy.asarray(density.differential_entropy(our_prob))
    our_approx = float(density.approximate_entropy(our_prob,
                                                   jnp.asarray(bin_widths)))
    numpy.testing.assert_allclose(our_diff, ref_diff, rtol=1e-5)
    numpy.testing.assert_allclose(our_approx, ref_approx, rtol=1e-5)


def test_loss_density_approximation_matches_reference(ref_tfutils):
    (samples, parameters_live) = _random_live_inputs(3)

    def build(tf1):
        prob = ref_tfutils.approximate_probability(
            tf1.constant(samples), tf1.constant(parameters_live), PPI,
            tf1.constant(NB_ITVS, dtype=tf1.int64))
        return ref_tfutils.loss_density_approximation(
            prob, tf1.constant(parameters_live), PPI)

    ref_loss = _run_graph(build)
    table = jnp.asarray(_embed_live(parameters_live))
    our_prob = density.approximate_probability(jnp.asarray(samples), table,
                                               PPI, MAX_ITVS)
    mask = density.active_mask(jnp.asarray(NB_ITVS, jnp.int32), PPI, MAX_ITVS)
    our_loss = float(density.loss_density_approximation(our_prob, table,
                                                        mask, PPI))
    # NOTE: our masked quadratic term excludes the LOW_PROJECTION-pinned
    # dead cells; the reference has no dead cells. The residual is
    # (W_dead * LOW_PROJECTION^2)/ppi ~ 1e-10 -- far below float32 noise.
    numpy.testing.assert_allclose(our_loss, ref_loss, rtol=1e-5)


def test_area_under_piecewise_linear_functions_matches_reference(ref_tfutils):
    (_, parameters_live) = _random_live_inputs(4)
    ref_area = _run_graph(lambda tf1: ref_tfutils.area_under_piecewise_linear_functions(
        tf1.constant(parameters_live), PPI,
        tf1.constant(NB_ITVS, dtype=tf1.int64)))
    ours = numpy.asarray(density.area_under_piecewise_linear_functions(
        jnp.asarray(_embed_live(parameters_live)),
        jnp.asarray(NB_ITVS, jnp.int32), PPI, MAX_ITVS))
    numpy.testing.assert_allclose(ours, ref_area, rtol=1e-5)


@pytest.mark.parametrize("max_abs,expect_expansion", [(13.7, True),
                                                      (10.0, True),
                                                      (5.2, False)])
def test_expand_all_matches_reference(ref_tfutils, max_abs, expect_expansion):
    """Our scalar-bump expansion reproduces the reference's grown table:
    same new live half-width, and the grown parameters (padded with
    LOW_PROJECTION) equal our live cells."""
    (_, parameters_live) = _random_live_inputs(5)
    live_width = 2 * PPI * NB_ITVS + 1
    grid = ((numpy.arange(live_width) - PPI * NB_ITVS) / PPI).astype(numpy.float32)

    def build(tf1):
        return ref_tfutils.expand_all(
            tf1.constant(grid), tf1.constant(parameters_live),
            csts.LOW_PROJECTION, PPI,
            tf1.constant(NB_ITVS, dtype=tf1.int64),
            tf1.constant(max_abs, dtype=tf1.float32))

    (ref_grid, ref_params, ref_nb_itvs) = _run_graph(build)

    table = density.DensityTable(
        parameters=jnp.asarray(_embed_live(parameters_live)),
        nb_itvs_per_side=jnp.asarray(NB_ITVS, jnp.int32))
    expanded = density.expand_table(table, jnp.asarray(max_abs, jnp.float32),
                                    PPI, MAX_ITVS)
    assert int(expanded.nb_itvs_per_side) == int(ref_nb_itvs)
    assert (int(ref_nb_itvs) > NB_ITVS) == expect_expansion

    # The reference's expanded table must equal our live cells.
    new_nb = int(ref_nb_itvs)
    lo = CENTER - PPI * new_nb
    hi = CENTER + PPI * new_nb + 1
    our_live = numpy.asarray(expanded.parameters)[:, lo:hi]
    assert ref_params.shape[1] == hi - lo
    numpy.testing.assert_allclose(our_live, ref_params, rtol=1e-7)
    assert ref_grid.shape[0] == 2 * PPI * new_nb + 1


def test_reconstruction_error_matches_reference(ref_tfutils):
    """Reference rec error = mean over batch of per-image summed squared
    error (tfutils.py:554-579); our RD loss uses the same definition."""
    rng = numpy.random.default_rng(6)
    visible = rng.normal(size=(3, 8, 8, 1)).astype(numpy.float32)
    rec = rng.normal(size=(3, 8, 8, 1)).astype(numpy.float32)
    ref_err = _run_graph(lambda tf1: ref_tfutils.reconstruction_error(
        tf1.constant(visible), tf1.constant(rec)))
    ours = float(jnp.mean(jnp.sum(jnp.square(jnp.asarray(visible) -
                                             jnp.asarray(rec)),
                                  axis=(1, 2, 3))))
    numpy.testing.assert_allclose(ours, ref_err, rtol=1e-6)
