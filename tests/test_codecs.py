"""Anchor-codec tests (Pillow backend, in-process)."""

import numpy
import pytest

from autoencoder_based_image_compression_tpu.codecs.jpeg import (
    compress_rgb,
    evaluate_jpeg,
)
from autoencoder_based_image_compression_tpu.codecs.jpeg2000 import (
    compress_jpeg2000,
    evaluate_jpeg2000,
)


def _smooth_luminance(height, width, seed=0):
    rng = numpy.random.default_rng(seed)
    (yy, xx) = numpy.meshgrid(numpy.linspace(0, 1, height),
                              numpy.linspace(0, 1, width), indexing="ij")
    image = 100.0 + 80.0 * xx + 40.0 * yy + rng.normal(0, 3, (height, width))
    return numpy.round(image.clip(16, 235)).astype(numpy.uint8)


def test_jpeg2000_rate_monotone_in_ratio():
    image = _smooth_luminance(128, 128)
    (rate_hi, rec_hi) = compress_jpeg2000(image, 8)
    (rate_lo, rec_lo) = compress_jpeg2000(image, 64)
    assert rate_hi > rate_lo
    assert rec_hi.shape == image.shape and rec_lo.shape == image.shape


def test_jpeg2000_sweep_rd_monotone():
    images = numpy.stack([_smooth_luminance(64, 64, s) for s in range(2)])
    (rates, psnrs) = evaluate_jpeg2000(images, ratios=(48, 12))
    assert rates.shape == (2, 2) and psnrs.shape == (2, 2)
    # Higher rate -> higher PSNR per image.
    assert numpy.all(rates[:, 1] > rates[:, 0])
    assert numpy.all(psnrs[:, 1] > psnrs[:, 0])


def test_jpeg_rgb_roundtrip():
    rng = numpy.random.default_rng(1)
    rgb = rng.integers(0, 256, size=(32, 32, 3)).astype(numpy.uint8)
    (rate, reconstruction) = compress_rgb(rgb, 80, codec="jpeg")
    assert rate > 0 and reconstruction.shape == rgb.shape


def test_evaluate_jpeg_quality_sweep():
    rng = numpy.random.default_rng(2)
    rows = rng.integers(0, 256, size=(3, 3072)).astype(numpy.uint8)
    (rates, psnrs) = evaluate_jpeg(rows, [20, 80], codec="jpeg")
    assert rates.shape == (2,) and psnrs.shape == (2,)
    assert rates[1] > rates[0] and psnrs[1] > psnrs[0]


def test_compress_rgb_rejects_unknown_codec():
    rgb = numpy.zeros((32, 32, 3), numpy.uint8)
    with pytest.raises(ValueError):
        compress_rgb(rgb, 50, codec="webp")
