"""Latent-analysis tests (Laplace-fit statistical oracle, probes)."""

import jax
import numpy

from autoencoder_based_image_compression_tpu.eval import analysis
from autoencoder_based_image_compression_tpu.models import conv_eae


def test_fit_maps_recovers_laplace_parameters():
    rng = numpy.random.default_rng(0)
    scales = numpy.array([0.5, 1.5, 3.0])
    locs = numpy.array([-1.0, 0.0, 2.0])
    y = numpy.stack([
        rng.laplace(locs[i], scales[i], size=(4, 32, 32)) for i in range(3)
    ], axis=3).astype(numpy.float32)
    (fit_locs, fit_scales) = analysis.fit_maps(y)
    numpy.testing.assert_allclose(fit_locs, locs, atol=0.1)
    numpy.testing.assert_allclose(fit_scales, scales, rtol=0.1)


def test_fit_latents_jointly():
    rng = numpy.random.default_rng(1)
    y = rng.laplace(0.5, 2.0, size=(2, 8, 8, 4)).astype(numpy.float32)
    (loc, scale) = analysis.fit_latents_jointly(y)
    assert abs(loc - 0.5) < 0.3
    assert abs(scale - 2.0) / 2.0 < 0.2


def test_activate_latent_variable_output():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    map_mean = numpy.zeros(128, numpy.float32)
    rec = analysis.activate_latent_variable(
        params, True, 8, 8, 2, 3, 5, 10.0, map_mean)
    assert rec.shape == (128, 128) and rec.dtype == numpy.uint8
    # Translation covariance (the probe's purpose): activating at a
    # shifted position yields a shifted response away from borders.
    rec_shifted = analysis.activate_latent_variable(
        params, True, 8, 8, 4, 5, 5, 10.0, map_mean)
    center = rec[16:96, 16:96]
    shifted_center = rec_shifted[48:128, 48:128]
    numpy.testing.assert_array_equal(center[:64, :64], shifted_center[:64, :64])


def test_mask_maps_keeps_only_selected_map():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(1), True)
    rng = numpy.random.default_rng(2)
    y = rng.normal(0, 5, size=(1, 4, 4, 128)).astype(numpy.float32)
    map_mean = numpy.mean(y, axis=(0, 1, 2))
    masked = analysis.mask_maps(y, params, True, 7, map_mean)
    assert masked.shape == (1, 64, 64) and masked.dtype == numpy.uint8
    # Contract: decode of (means everywhere, y on map 7).
    import jax.numpy as jnp

    from autoencoder_based_image_compression_tpu.ops.quantization import cast_bt601

    expected_latents = numpy.tile(map_mean.reshape(1, 1, 1, -1),
                                  (1, 4, 4, 1)).astype(numpy.float32)
    expected_latents[:, :, :, 7] = y[:, :, :, 7]
    expected = cast_bt601(numpy.asarray(
        conv_eae.decode(params, jnp.asarray(expected_latents), True)))[:, :, :, 0]
    numpy.testing.assert_array_equal(masked, expected)
