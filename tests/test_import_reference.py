"""Reference-checkpoint importer tests.

The dict-level test validates the name map and density-table embedding;
the TF test writes a real TF checkpoint with the reference's variable
scopes and round-trips it through the importer.
"""

import numpy
import pytest

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.ops import density as dens
from autoencoder_based_image_compression_tpu.utils.import_reference import (
    import_reference_variables,
)


def _fake_reference_variables(learn_bin_widths, nb_itvs=12, ppi=5, nb_maps=128):
    rng = numpy.random.default_rng(0)
    n = nb_maps
    variables = {
        "encoder/weights_1": rng.normal(size=(9, 9, 1, n)).astype(numpy.float32),
        "encoder/biases_1": numpy.zeros(n, numpy.float32),
        "encoder/gamma_1": rng.uniform(2e-5, 0.01, (n, n)).astype(numpy.float32),
        "encoder/beta_1": numpy.ones(n, numpy.float32),
        "encoder/weights_2": rng.normal(size=(5, 5, n, n)).astype(numpy.float32),
        "encoder/biases_2": numpy.zeros(n, numpy.float32),
        "encoder/gamma_2": rng.uniform(2e-5, 0.01, (n, n)).astype(numpy.float32),
        "encoder/beta_2": numpy.ones(n, numpy.float32),
        "encoder/weights_3": rng.normal(size=(5, 5, n, n)).astype(numpy.float32),
        "encoder/biases_3": numpy.zeros(n, numpy.float32),
        "decoder/weights_4": rng.normal(size=(5, 5, n, n)).astype(numpy.float32),
        "decoder/biases_4": numpy.zeros(n, numpy.float32),
        "decoder/gamma_5": rng.uniform(2e-5, 0.01, (n, n)).astype(numpy.float32),
        "decoder/beta_5": numpy.ones(n, numpy.float32),
        "decoder/weights_5": rng.normal(size=(5, 5, n, n)).astype(numpy.float32),
        "decoder/biases_5": numpy.zeros(n, numpy.float32),
        "decoder/gamma_6": rng.uniform(2e-5, 0.01, (n, n)).astype(numpy.float32),
        "decoder/beta_6": numpy.ones(n, numpy.float32),
        "decoder/weights_6": rng.normal(size=(9, 9, 1, n)).astype(numpy.float32),
        "piecewise_linear_function/bin_widths":
            rng.uniform(0.8, 4.0, n).astype(numpy.float32),
        "piecewise_linear_function/parameters":
            rng.uniform(1e-6, 0.3, (n, 2 * ppi * nb_itvs + 1)).astype(numpy.float32),
        "piecewise_linear_function/nb_intervals_per_side":
            numpy.asarray(nb_itvs, numpy.int64),
        "piecewise_linear_function/grid":
            numpy.linspace(-nb_itvs, nb_itvs, 2 * ppi * nb_itvs + 1,
                           dtype=numpy.float32),
        "decaying_lr/global_step": numpy.asarray(123456, numpy.int32),
    }
    if not learn_bin_widths:
        variables["encoder/gamma_3"] = rng.uniform(2e-5, 0.01, (n, n)).astype(numpy.float32)
        variables["encoder/beta_3"] = numpy.ones(n, numpy.float32)
        variables["decoder/gamma_4"] = rng.uniform(2e-5, 0.01, (n, n)).astype(numpy.float32)
        variables["decoder/beta_4"] = numpy.ones(n, numpy.float32)
    return variables


def test_import_learned_bw_variables():
    variables = _fake_reference_variables(learn_bin_widths=True)
    imported = import_reference_variables(variables, ppi=5, max_itvs=32)
    assert imported["learn_bin_widths"] is True
    assert imported["step"] == 123456
    assert "gamma_3" not in imported["params"]
    numpy.testing.assert_allclose(numpy.asarray(imported["bin_widths"]),
                                  variables["piecewise_linear_function/bin_widths"])
    # Density table embedding: center slice equals the live parameters,
    # outside pinned at LOW_PROJECTION.
    table = numpy.asarray(imported["density"].parameters)
    center = 5 * 32
    live = variables["piecewise_linear_function/parameters"]
    numpy.testing.assert_allclose(
        table[:, center - 60:center + 61], live, rtol=1e-6)
    assert table[0, 0] == numpy.float32(csts.LOW_PROJECTION)
    assert int(imported["density"].nb_itvs_per_side) == 12
    # The imported model must run through the codec transforms.
    import jax.numpy as jnp

    from autoencoder_based_image_compression_tpu.models import conv_eae

    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    y = conv_eae.encode(imported["params"], x, True)
    assert y.shape == (1, 2, 2, 128)


def test_import_fixed_bw_variables():
    variables = _fake_reference_variables(learn_bin_widths=False)
    imported = import_reference_variables(variables, ppi=5, max_itvs=32)
    assert imported["learn_bin_widths"] is False
    assert "gamma_3" in imported["params"] and "gamma_4" in imported["params"]


def test_import_rejects_oversized_grid():
    variables = _fake_reference_variables(learn_bin_widths=True, nb_itvs=40)
    with pytest.raises(ValueError):
        import_reference_variables(variables, ppi=5, max_itvs=32)


def test_import_real_tf_checkpoint(tmp_path):
    tf = pytest.importorskip("tensorflow")
    tf1 = tf.compat.v1
    variables = _fake_reference_variables(learn_bin_widths=True, nb_maps=8)
    path = str(tmp_path / "model_1.ckpt")
    # Build inside an explicit graph so eager mode stays enabled for
    # the rest of the test process (disable_eager_execution is global).
    graph = tf1.Graph()
    with graph.as_default():
        for (name, value) in variables.items():
            (scope, var) = name.split("/")
            with tf1.variable_scope(scope, reuse=tf1.AUTO_REUSE):
                tf1.get_variable(var, initializer=tf1.constant(value))
        saver = tf1.train.Saver()
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, path)
    from autoencoder_based_image_compression_tpu.utils.import_reference import (
        import_reference_checkpoint)

    imported = import_reference_checkpoint(path, ppi=5, max_itvs=32)
    numpy.testing.assert_allclose(numpy.asarray(imported["bin_widths"]),
                                  variables["piecewise_linear_function/bin_widths"])
    numpy.testing.assert_allclose(numpy.asarray(imported["params"]["weights_1"]),
                                  variables["encoder/weights_1"])
