"""Golden numerical-parity tests against TensorFlow's own ops.

SURVEY.md section 7 lists TF 'SAME' padding asymmetry and
conv2d_transpose scatter semantics as the parity land-mines for the
0.05 dB PSNR gate. TensorFlow (CPU) is available here, so these tests
compare our JAX transforms against the exact TF ops the reference uses
(``tf.nn.conv2d``/``tf.nn.conv2d_transpose`` with SAME padding,
``tfutils.gdn`` as a channel matmul) on random tensors - including the
odd-sized/stride-4 cases where SAME splits pads asymmetrically.
"""

import numpy
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops.gdn import gdn, inverse_gdn


def _tf_conv_same(x, w, stride):
    return tf.nn.conv2d(tf.constant(x), tf.constant(w),
                        strides=[1, stride, stride, 1], padding="SAME").numpy()


def _tf_conv_transpose_same(y, w, stride, out_hw):
    (batch, _, _, _) = y.shape
    output_shape = [batch, out_hw[0], out_hw[1], w.shape[2]]
    return tf.nn.conv2d_transpose(tf.constant(y), tf.constant(w), output_shape,
                                  strides=[1, stride, stride, 1],
                                  padding="SAME").numpy()


@pytest.mark.parametrize("stride,kernel,size", [(4, 9, 64), (2, 5, 32), (4, 9, 48),
                                                (2, 5, 48)])
def test_conv_same_matches_tf(stride, kernel, size):
    rng = numpy.random.default_rng(0)
    x = rng.normal(size=(2, size, size, 3)).astype(numpy.float32)
    w = rng.normal(size=(kernel, kernel, 3, 5)).astype(numpy.float32)
    ours = numpy.asarray(conv_eae._conv_same(jnp.asarray(x), jnp.asarray(w), stride))
    theirs = _tf_conv_same(x, w, stride)
    numpy.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,kernel,size", [(4, 9, 16), (2, 5, 16), (4, 9, 12),
                                                (2, 5, 24)])
def test_conv_transpose_same_matches_tf(stride, kernel, size):
    # Kernel layout (kh, kw, out_ch, in_ch) == TF conv2d_transpose filters.
    rng = numpy.random.default_rng(1)
    y = rng.normal(size=(2, size, size, 5)).astype(numpy.float32)
    w = rng.normal(size=(kernel, kernel, 3, 5)).astype(numpy.float32)
    ours = numpy.asarray(conv_eae.conv_transpose_same(jnp.asarray(y), jnp.asarray(w),
                                                      stride))
    theirs = _tf_conv_transpose_same(y, w, stride, (stride * size, stride * size))
    numpy.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_gdn_matches_tf_reference_formula():
    # The reference computes GDN as reshape-to-2D matmul
    # (tfutils.py:363-397); replicate it with TF ops.
    rng = numpy.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, 16)).astype(numpy.float32)
    gamma = rng.uniform(2e-5, 0.01, (16, 16)).astype(numpy.float32)
    beta = numpy.ones(16, numpy.float32)
    flat = tf.reshape(tf.constant(x), [2 * 4 * 4, 16])
    tf_out = tf.reshape(
        flat / tf.sqrt(tf.matmul(flat ** 2, tf.constant(gamma)) + beta[None, :]),
        [2, 4, 4, 16]).numpy()
    ours = numpy.asarray(gdn(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))
    numpy.testing.assert_allclose(ours, tf_out, rtol=1e-5, atol=1e-6)
    flat_inv = tf.reshape(tf.constant(x), [2 * 4 * 4, 16])
    tf_inv = tf.reshape(
        flat_inv * tf.sqrt(tf.matmul(flat_inv ** 2, tf.constant(gamma)) + beta[None, :]),
        [2, 4, 4, 16]).numpy()
    ours_inv = numpy.asarray(inverse_gdn(jnp.asarray(x), jnp.asarray(gamma),
                                         jnp.asarray(beta)))
    numpy.testing.assert_allclose(ours_inv, tf_inv, rtol=1e-5, atol=1e-6)


def test_full_encoder_decoder_matches_tf_composition():
    """End-to-end: our encode/decode vs the same composition written in TF."""
    import jax

    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    np_params = {k: numpy.asarray(v) for (k, v) in params.items()}
    rng = numpy.random.default_rng(3)
    x = rng.integers(16, 236, size=(1, 48, 48, 1)).astype(numpy.float32)

    def tf_gdn(t, gamma, beta, inverse=False):
        shape = t.shape
        flat = tf.reshape(t, [-1, shape[-1]])
        pool = tf.sqrt(tf.matmul(flat ** 2, tf.constant(gamma)) + beta[None, :])
        out = flat * pool if inverse else flat / pool
        return tf.reshape(out, shape)

    t = tf.nn.conv2d(tf.constant(x), np_params["weights_1"], [1, 4, 4, 1], "SAME")
    t = tf_gdn(tf.nn.bias_add(t, np_params["biases_1"]),
               np_params["gamma_1"], np_params["beta_1"])
    t = tf.nn.conv2d(t, np_params["weights_2"], [1, 2, 2, 1], "SAME")
    t = tf_gdn(tf.nn.bias_add(t, np_params["biases_2"]),
               np_params["gamma_2"], np_params["beta_2"])
    t = tf.nn.conv2d(t, np_params["weights_3"], [1, 2, 2, 1], "SAME")
    y_tf = tf.nn.bias_add(t, np_params["biases_3"])

    y_ours = conv_eae.encode(params, jnp.asarray(x), True)
    numpy.testing.assert_allclose(numpy.asarray(y_ours), y_tf.numpy(),
                                  rtol=1e-4, atol=1e-4)

    d = tf.nn.conv2d_transpose(y_tf, np_params["weights_4"], [1, 6, 6, 128],
                               [1, 2, 2, 1], "SAME")
    d = tf_gdn(tf.nn.bias_add(d, np_params["biases_4"]),
               np_params["gamma_5"], np_params["beta_5"], inverse=True)
    d = tf.nn.conv2d_transpose(d, np_params["weights_5"], [1, 12, 12, 128],
                               [1, 2, 2, 1], "SAME")
    d = tf_gdn(tf.nn.bias_add(d, np_params["biases_5"]),
               np_params["gamma_6"], np_params["beta_6"], inverse=True)
    rec_tf = tf.nn.conv2d_transpose(d, np_params["weights_6"], [1, 48, 48, 1],
                                    [1, 4, 4, 1], "SAME")

    rec_ours = conv_eae.decode(params, y_ours, True)
    # Relative to the (IGDN-amplified) output scale.
    scale = numpy.abs(rec_tf.numpy()).max()
    assert numpy.abs(numpy.asarray(rec_ours) - rec_tf.numpy()).max() < 1e-4 * scale
