"""JPEG2000 anchor via ImageMagick.

Reference ``kodak_tensorflow/jpeg2000/jpeg2000.py:50-291``: luminance
image -> ``magick convert -quality q`` -> ``.jp2``; rate = 8 *
file_bytes / pixels; PSNR from the decoded ``.jp2`` read back. The
read-back uses ImageMagick again (the reference uses glymur; not baked
into this environment).
"""

import os
import subprocess
import tempfile

import numpy

from autoencoder_based_image_compression_tpu.codecs.common import find_imagemagick
from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
from autoencoder_based_image_compression_tpu.utils.image import read_image_mode, save_image


def compress_jpeg2000(luminance_uint8, quality, work_dir):
    """Compresses one luminance image at one quality.

    Returns ``(rate_bpp, reconstruction_uint8)``.
    """
    magick = find_imagemagick()
    path_png = os.path.join(work_dir, "in.png")
    path_jp2 = os.path.join(work_dir, "out.jp2")
    path_back = os.path.join(work_dir, "back.png")
    save_image(path_png, luminance_uint8)
    subprocess.check_call([magick, path_png, "-quality", str(quality), path_jp2],
                          stderr=subprocess.DEVNULL)
    rate = 8.0 * os.path.getsize(path_jp2) / luminance_uint8.size
    subprocess.check_call([magick, path_jp2, path_back], stderr=subprocess.DEVNULL)
    reconstruction = read_image_mode(path_back, "L")
    return (rate, reconstruction)


def evaluate_jpeg2000(luminances_uint8, qualities):
    """Quality sweep over an image stack.

    Returns ``(rates, psnrs)`` of shape (nb_images, nb_qualities)
    (reference ``jpeg2000.py:201-291``).
    """
    nb_images = luminances_uint8.shape[0]
    rates = numpy.zeros((nb_images, len(qualities)))
    psnrs = numpy.zeros((nb_images, len(qualities)))
    with tempfile.TemporaryDirectory() as work_dir:
        for i in range(nb_images):
            luminance = luminances_uint8[i]
            if luminance.ndim == 3:
                luminance = luminance[:, :, 0]
            for (j, quality) in enumerate(qualities):
                (rates[i, j], reconstruction) = compress_jpeg2000(
                    luminance, quality, work_dir)
                psnrs[i, j] = psnr_2d(luminance, reconstruction)
    return (rates, psnrs)
