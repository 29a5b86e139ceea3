"""Tests of the small parity utilities (reshapes, sorting, tar
extraction, dense-side metrics, mosaic visualizations)."""

import os
import tarfile

import numpy
import PIL.Image
import pytest

from autoencoder_based_image_compression_tpu.eval import visualization as viz
from autoencoder_based_image_compression_tpu.ops.metrics import (
    count_zero_columns,
    mean_psnr,
)
from autoencoder_based_image_compression_tpu.utils.image import (
    clean_sort_list_strings,
    images_to_rows,
    rows_to_images,
    untar_archive,
)


def test_images_rows_roundtrip_and_planar_layout():
    rng = numpy.random.default_rng(0)
    images = rng.integers(0, 256, size=(8, 6, 3, 5)).astype(numpy.uint8)
    rows = images_to_rows(images)
    assert rows.shape == (5, 3 * 8 * 6)
    # Planar layout: the first H*W entries of row i are image i's R plane
    # (reference svhn/tools/tools.py:599-606).
    numpy.testing.assert_array_equal(rows[2, :48],
                                     images[:, :, 0, 2].reshape(-1))
    numpy.testing.assert_array_equal(rows[2, 48:96],
                                     images[:, :, 1, 2].reshape(-1))
    numpy.testing.assert_array_equal(rows_to_images(rows, 8, 6), images)


def test_rows_to_images_validates():
    with pytest.raises(ValueError):
        rows_to_images(numpy.zeros((2, 100), numpy.uint8), 8, 6)
    with pytest.raises(TypeError):
        images_to_rows(numpy.zeros((8, 6, 3, 2), numpy.float32))


def test_clean_sort_list_strings():
    strings = ["b.png", "a.png", "c.jpg", "README"]
    assert clean_sort_list_strings(strings, ".png") == ["a.png", "b.png"]
    assert clean_sort_list_strings(strings, (".png", ".jpg")) == \
        ["a.png", "b.png", "c.jpg"]


def test_untar_archive(tmp_path):
    src = tmp_path / "payload.txt"
    src.write_text("hello")
    tar_path = tmp_path / "archive.tar"
    with tarfile.open(tar_path, "w") as archive:
        archive.add(src, arcname="payload.txt")
    out = tmp_path / "out"
    out.mkdir()
    untar_archive(str(out), str(tar_path))
    assert (out / "payload.txt").read_text() == "hello"


def test_untar_archive_rejects_escape(tmp_path):
    tar_path = tmp_path / "evil.tar"
    src = tmp_path / "x.txt"
    src.write_text("x")
    with tarfile.open(tar_path, "w") as archive:
        archive.add(src, arcname="../escape.txt")
    out = tmp_path / "out"
    out.mkdir()
    with pytest.raises(ValueError):
        untar_archive(str(out), str(tar_path))


def test_mean_psnr_known_value():
    reference = numpy.full((3, 100), 100, numpy.uint8)
    reconstruction = reference.copy()
    reconstruction[:, :] += 2  # uniform error of 2 -> mse 4
    expected = 10.0 * numpy.log10(255.0 ** 2 / 4.0)
    assert mean_psnr(reference, reconstruction) == pytest.approx(expected)
    with pytest.raises(ValueError):
        mean_psnr(reference, reference)


def test_count_zero_columns():
    array = numpy.array([[1.0, 0.0, -2.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    assert count_zero_columns(array) == 2


def test_visualize_luminances_mosaic(tmp_path):
    luminances = numpy.arange(2 * 4 * 3).reshape(2, 4, 3, 1).astype(numpy.uint8)
    path = str(tmp_path / "mosaic.png")
    viz.visualize_luminances(luminances, 2, path)
    mosaic = numpy.asarray(PIL.Image.open(path))
    assert mosaic.shape == (2 * 5 + 1, 1 * 4 + 1)
    numpy.testing.assert_array_equal(mosaic[1:5, 1:4], luminances[0, :, :, 0])
    numpy.testing.assert_array_equal(mosaic[6:10, 1:4], luminances[1, :, :, 0])
    assert mosaic[0, 0] == 255  # white separator border


def test_visualize_dead_colors(tmp_path):
    samples = numpy.array([[-1.0, 0.0, 2.0]])
    path = str(tmp_path / "dead.png")
    viz.visualize_dead(samples, path)
    image = numpy.asarray(PIL.Image.open(path))
    numpy.testing.assert_array_equal(image[0, 0], [0, 0, 255])   # negative: blue
    numpy.testing.assert_array_equal(image[0, 1], [0, 0, 0])     # zero: black
    numpy.testing.assert_array_equal(image[0, 2], [255, 0, 0])   # positive: red


def test_visualize_rows_roundtrips_pixels(tmp_path):
    rng = numpy.random.default_rng(3)
    rows = rng.integers(0, 256, size=(4, 3 * 5 * 5)).astype(numpy.uint8)
    path = str(tmp_path / "rows.png")
    viz.visualize_rows(rows, 5, 5, 2, path)
    mosaic = numpy.asarray(PIL.Image.open(path))
    images = rows_to_images(rows, 5, 5)
    numpy.testing.assert_array_equal(mosaic[1:6, 1:6, :], images[:, :, :, 0])


def test_visualize_crops_and_rotated(tmp_path):
    image = numpy.arange(200 * 200, dtype=numpy.int64).astype(numpy.uint8) \
        .reshape(200, 200)
    positions = numpy.array([[0], [10]], numpy.int32)
    crop_path = str(tmp_path / "crop.png")
    viz.visualize_crops(image, positions, [crop_path])
    crop = numpy.asarray(PIL.Image.open(crop_path))
    assert crop.shape == (160, 160)
    # 2x pixel repetition of the 80x80 crop at (0, 10).
    numpy.testing.assert_array_equal(crop[0:2, 0:2],
                                     numpy.full((2, 2), image[0, 10]))
    paths = [str(tmp_path / "rot.png"), str(tmp_path / "rot_crop.png")]
    viz.visualize_rotated_luminance(image, True, positions, paths)
    rotated = numpy.asarray(PIL.Image.open(paths[0]))
    numpy.testing.assert_array_equal(rotated, numpy.rot90(image, k=3))


def test_histogram_artifact(tmp_path):
    path = str(tmp_path / "hist.png")
    viz.histogram(numpy.random.default_rng(0).normal(size=500), "title", path)
    assert os.path.getsize(path) > 0


def test_visualize_dense_weights(tmp_path):
    weights = numpy.random.default_rng(1).normal(size=(4, 3 * 6 * 6))
    path = str(tmp_path / "weights.png")
    viz.visualize_dense_weights(weights, 6, 6, 2, path)
    assert numpy.asarray(PIL.Image.open(path)).shape == (2 * 7 + 1, 2 * 7 + 1, 3)
