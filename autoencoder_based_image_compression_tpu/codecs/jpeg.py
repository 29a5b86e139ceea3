"""JPEG / JPEG2000 anchors for RGB digits (the SVHN comparison).

Reference ``svhn/jpeg/jpeg.py:75-303``: ImageMagick quality sweep on
32x32 RGB digits for both codecs; rate from the compressed file size,
PSNR over the RGB round trip.
"""

import os
import subprocess
import tempfile

import numpy

from autoencoder_based_image_compression_tpu.codecs.common import find_imagemagick
from autoencoder_based_image_compression_tpu.utils.image import read_image_mode, save_image


def _psnr_rgb(reference_uint8, reconstruction_uint8):
    mse = numpy.mean((reference_uint8.astype(numpy.float64)
                      - reconstruction_uint8.astype(numpy.float64)) ** 2)
    if mse == 0.0:
        raise ValueError("The mean squared error is 0.")
    return 10.0 * numpy.log10((255.0 ** 2) / mse)


def compress_rgb(rgb_uint8, quality, extension, work_dir):
    """One RGB image through ImageMagick at one quality.

    ``extension`` selects the codec: "jpg" or "jp2". Returns
    ``(rate_bpp, reconstruction_uint8)`` where rate is per pixel
    (H*W, all three channels charged to the pixel budget like the
    reference).
    """
    magick = find_imagemagick()
    path_png = os.path.join(work_dir, "in.png")
    path_coded = os.path.join(work_dir, f"out.{extension}")
    path_back = os.path.join(work_dir, "back.png")
    save_image(path_png, rgb_uint8)
    subprocess.check_call([magick, path_png, "-quality", str(quality), path_coded],
                          stderr=subprocess.DEVNULL)
    rate = 8.0 * os.path.getsize(path_coded) / (rgb_uint8.shape[0] * rgb_uint8.shape[1])
    subprocess.check_call([magick, path_coded, path_back], stderr=subprocess.DEVNULL)
    reconstruction = read_image_mode(path_back, "RGB")
    return (rate, reconstruction)


def evaluate_jpeg(rows_uint8, qualities, extension="jpg"):
    """Quality sweep over flattened (N, 3072) digit rows.

    Returns mean ``(rates, psnrs)`` per quality (reference
    ``svhn/jpeg/jpeg.py:191-303``).
    """
    nb_images = rows_uint8.shape[0]
    rates = numpy.zeros((nb_images, len(qualities)))
    psnrs = numpy.zeros((nb_images, len(qualities)))
    with tempfile.TemporaryDirectory() as work_dir:
        for i in range(nb_images):
            rgb = rows_uint8[i].reshape(32, 32, 3)
            for (j, quality) in enumerate(qualities):
                (rates[i, j], reconstruction) = compress_rgb(
                    rgb, quality, extension, work_dir)
                psnrs[i, j] = _psnr_rgb(rgb, reconstruction)
    return (numpy.mean(rates, axis=0), numpy.mean(psnrs, axis=0))
