"""Tests of the quantizer utilities (oracle: direct numpy formulas)."""

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.ops.quantization import (
    add_uniform_noise,
    cast_bt601,
    cast_float_to_int16,
    quantize_per_map,
)


def test_quantize_per_map_matches_numpy():
    rng = numpy.random.default_rng(0)
    data = rng.normal(size=(2, 4, 4, 3)).astype(numpy.float32)
    bin_widths = numpy.array([0.5, 1.0, 2.0], dtype=numpy.float32)
    expected = bin_widths * numpy.round(data / bin_widths)
    out = numpy.asarray(quantize_per_map(jnp.asarray(data), jnp.asarray(bin_widths)))
    numpy.testing.assert_allclose(out, expected, rtol=1e-6)


def test_quantize_idempotent():
    rng = numpy.random.default_rng(1)
    data = rng.normal(size=(1, 8, 8, 2)).astype(numpy.float32)
    bw = numpy.array([0.75, 1.5], dtype=numpy.float32)
    once = quantize_per_map(jnp.asarray(data), jnp.asarray(bw))
    twice = quantize_per_map(once, jnp.asarray(bw))
    numpy.testing.assert_allclose(numpy.asarray(once), numpy.asarray(twice), rtol=1e-6)


def test_add_uniform_noise_bounds_and_mean():
    key = jax.random.PRNGKey(0)
    data = jnp.zeros((64, 8, 8, 4), jnp.float32)
    bw = jnp.array([0.5, 1.0, 2.0, 4.0], jnp.float32)
    noisy = numpy.asarray(add_uniform_noise(key, data, bw))
    half = numpy.array([0.25, 0.5, 1.0, 2.0])
    for i in range(4):
        channel = noisy[..., i]
        assert numpy.all(numpy.abs(channel) <= half[i] + 1e-6)
        # Mean of U(-d/2, d/2) over 4096 samples: |mean| < 4 sigma.
        sigma = (2 * half[i]) / numpy.sqrt(12 * channel.size)
        assert abs(channel.mean()) < 4 * sigma


def test_cast_bt601():
    arr = numpy.array([[0.0, 15.9, 16.4, 235.6, 255.0]])
    out = cast_bt601(arr)
    numpy.testing.assert_array_equal(out, numpy.array([[16, 16, 16, 235, 235]], dtype=numpy.uint8))
    assert out.dtype == numpy.uint8


def test_cast_float_to_int16():
    arr = numpy.array([1.4, -2.6, 0.5])
    out = cast_float_to_int16(arr)
    assert out.dtype == numpy.int16
    numpy.testing.assert_array_equal(out, numpy.round(arr).astype(numpy.int16))


def test_cast_float_to_int16_overflow_guard():
    try:
        cast_float_to_int16(numpy.array([40000.0]))
    except AssertionError:
        return
    raise AssertionError("expected overflow guard to fire")
