"""Dataset-builder and image-utility tests."""

import os
import pickle

import numpy
import PIL.Image
import pytest

from autoencoder_based_image_compression_tpu.data.kodak import create_kodak
from autoencoder_based_image_compression_tpu.data.svhn import (
    compute_preprocessing_stats,
    preprocess_svhn,
    synthetic_svhn,
)
from autoencoder_based_image_compression_tpu.data.synthetic import (
    synthetic_kodak,
    synthetic_luminance_stack,
)
from autoencoder_based_image_compression_tpu.utils import image as img


def test_rgb_to_ycbcr_matches_matlab_convention():
    # Pure white -> Y=235, pure black -> Y=16 (BT.601 studio range).
    white = numpy.full((2, 2, 3), 255, numpy.uint8)
    black = numpy.zeros((2, 2, 3), numpy.uint8)
    assert img.rgb_to_ycbcr(white)[0, 0, 0] == 235
    assert img.rgb_to_ycbcr(black)[0, 0, 0] == 16
    # Neutral gray: chroma at 128.
    gray = numpy.full((2, 2, 3), 128, numpy.uint8)
    ycbcr = img.rgb_to_ycbcr(gray)
    assert ycbcr[0, 0, 1] == 128 and ycbcr[0, 0, 2] == 128
    # Known red conversion: Y = 16 + 65.481*255/255 = 81.48 -> 81.
    red = numpy.zeros((1, 1, 3), numpy.uint8)
    red[0, 0, 0] = 255
    assert img.rgb_to_ycbcr(red)[0, 0, 0] == 81


def test_crop_option_2d_center_and_random():
    luminance = numpy.arange(100, dtype=numpy.uint8).reshape(10, 10)
    center = img.crop_option_2d(luminance, 4, is_random=False)
    numpy.testing.assert_array_equal(center, luminance[3:7, 3:7])
    rng = numpy.random.default_rng(0)
    random_crop = img.crop_option_2d(luminance, 4, is_random=True, rng=rng)
    assert random_crop.shape == (4, 4)


def test_crop_repeat_2d():
    image = numpy.arange(100 * 100, dtype=numpy.int32).astype(numpy.uint8).reshape(100, 100)
    crop = img.crop_repeat_2d(image, 0, 0)
    assert crop.shape == (160, 160)
    assert crop[0, 0] == crop[1, 1] == image[0, 0]


def test_read_image_mode_rejects_wrong_mode(tmp_path):
    path = str(tmp_path / "gray.png")
    PIL.Image.fromarray(numpy.zeros((8, 8), numpy.uint8)).save(path)
    with pytest.raises(ValueError):
        img.read_image_mode(path, "RGB")
    assert img.read_image_mode(path, "L").shape == (8, 8)


def test_subdivide_set():
    assert img.subdivide_set(20, 5) == 4
    with pytest.raises(ValueError):
        img.subdivide_set(21, 5)


def test_create_kodak_from_pngs(tmp_path):
    source = tmp_path / "pngs"
    source.mkdir()
    rng = numpy.random.default_rng(0)
    for i in range(24):
        # Half landscape (512x768), half portrait (768x512, must rotate).
        shape = (512, 768, 3) if i % 2 == 0 else (768, 512, 3)
        rgb = rng.integers(0, 256, size=shape).astype(numpy.uint8)
        PIL.Image.fromarray(rgb).save(source / f"kodim{i:02d}.png")
    path_npy = str(tmp_path / "kodak.npy")
    path_rot = str(tmp_path / "list_rotation.pkl")
    create_kodak(str(source), path_npy, path_rot)
    stack = numpy.load(path_npy)
    assert stack.shape == (24, 512, 768) and stack.dtype == numpy.uint8
    with open(path_rot, "rb") as file:
        rotation = pickle.load(file)
    assert rotation == [i for i in range(24) if i % 2 == 1]
    # Idempotent second call.
    create_kodak(str(source), path_npy, path_rot)


def test_synthetic_stacks_shapes_and_range():
    stack = synthetic_luminance_stack(3, 64, 96, seed=0)
    assert stack.shape == (3, 64, 96, 1) and stack.dtype == numpy.uint8
    assert stack.min() >= 16 and stack.max() <= 235
    kodak = synthetic_kodak()
    assert kodak.shape == (24, 512, 768, 1)


def test_svhn_preprocessing_roundtrip():
    digits = synthetic_svhn(50, seed=1)
    (mean, std) = compute_preprocessing_stats(digits)
    assert mean.shape == (3072,) and std > 0
    pre = preprocess_svhn(digits, mean, std)
    # Centered and reduced: overall mean ~0, std ~1.
    assert abs(pre.mean()) < 0.05
    assert abs(pre.std() - 1.0) < 0.1
    # Chunked computation matches unchunked.
    (mean2, std2) = compute_preprocessing_stats(digits, chunk=7)
    numpy.testing.assert_allclose(mean, mean2, rtol=1e-6)
    numpy.testing.assert_allclose(std, std2, rtol=1e-6)
