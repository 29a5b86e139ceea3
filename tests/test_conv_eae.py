"""Tests of the conv EAE transforms.

The transpose-conv adjoint test is the guard for the TF-SAME padding
land-mine (SURVEY.md section 7): TF defines ``conv2d_transpose`` as the
gradient of ``conv2d``, so our transposed conv must satisfy the adjoint
identity ``<conv(x), y> == <x, tconv(y)>`` exactly.
"""

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.models import conv_eae


def test_conv_transpose_is_exact_adjoint():
    rng = numpy.random.default_rng(0)
    for (stride, kernel) in [(4, 9), (2, 5)]:
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(numpy.float32))
        w = jnp.asarray(rng.normal(size=(kernel, kernel, 3, 5)).astype(numpy.float32))
        y = jnp.asarray(
            rng.normal(size=(2, 16 // stride, 16 // stride, 5)).astype(numpy.float32))
        conv_out = conv_eae._conv_same(x, w, stride)
        tconv_out = conv_eae.conv_transpose_same(y, w, stride)
        lhs = float(jnp.vdot(conv_out, y))
        rhs = float(jnp.vdot(x, tconv_out))
        numpy.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_parameter_count_matches_reference():
    # Reference eae/note_eae.txt: 1,758,848 parameters (fixed-bw variant
    # with the extra GDN_3/IGDN_4 pair).
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), learn_bin_widths=False)
    assert conv_eae.nb_parameters(params) == 1758848


def test_encode_decode_shapes():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), learn_bin_widths=True)
    x = jnp.zeros((2, 64, 96, 1), jnp.float32)
    y = conv_eae.encode(params, x, learn_bin_widths=True)
    assert y.shape == (2, 64 // csts.STRIDE_PROD, 96 // csts.STRIDE_PROD, csts.NB_MAPS_3)
    rec = conv_eae.decode(params, y, learn_bin_widths=True)
    assert rec.shape == x.shape


def test_encode_decode_shapes_fixed_bw():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(1), learn_bin_widths=False)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    y = conv_eae.encode(params, x, learn_bin_widths=False)
    assert y.shape == (1, 2, 2, 128)
    rec = conv_eae.decode(params, y, learn_bin_widths=False)
    assert rec.shape == x.shape


def test_fully_convolutional_any_multiple_of_16():
    # The reference accepts any H, W divisible by STRIDE_PROD
    # (EntropyAutoencoder.py:77-80) - the spatial scale axis.
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(2), learn_bin_widths=True)
    for (h, w) in [(16, 16), (48, 80)]:
        x = jnp.zeros((1, h, w, 1), jnp.float32)
        y = conv_eae.encode(params, x, learn_bin_widths=True)
        assert y.shape == (1, h // 16, w // 16, 128)


def test_weight_l2_norm_matches_manual():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(3), learn_bin_widths=True)
    expected = sum(
        0.5 * float(jnp.sum(jnp.square(params[f"weights_{i}"]))) for i in range(1, 7))
    numpy.testing.assert_allclose(float(conv_eae.weight_l2_norm(params)), expected, rtol=1e-6)
