"""HEVC anchor via the vendored HM reference encoder binary.

Reference ``kodak_tensorflow/hevc/hevc.py``: luminance -> raw YUV 4:0:0
file (``write_400`` ``:370``), shell out to HM ``TAppEncoderStatic``
with an all-intra config + QP (``:90-115``), read the reconstructed YUV
(``read_400`` ``:313``), rate = 8 * bitstream_bytes / (H*W)
(``:211-212``). HM itself is a third-party benchmark binary - not
re-implemented (SURVEY.md section 2.3 item 6); its path is injected.
"""

import os
import subprocess
import tempfile

import numpy

from autoencoder_based_image_compression_tpu.codecs.common import CodecUnavailableError
from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d

# All-intra main-RExt configuration equivalent to the reference's
# hevc/configuration/intra.cfg essentials.
INTRA_CFG = """\
Profile: main-RExt
InputBitDepth: 8
InputChromaFormat: 400
FrameRate: 30
FramesToBeEncoded: 1
GOPSize: 1
IntraPeriod: 1
DecodingRefreshType: 1
QuadtreeTULog2MaxSize: 5
TransformSkip: 1
TransformSkipFast: 1
SEIDecodedPictureHash: 1
"""


def write_400(path, luminance_uint8):
    """Writes a luminance image as a raw YUV 4:0:0 frame."""
    luminance_uint8.astype(numpy.uint8).tofile(path)


def read_400(path, height, width):
    """Reads a raw YUV 4:0:0 frame back into a luminance image."""
    data = numpy.fromfile(path, dtype=numpy.uint8)
    return data[:height * width].reshape(height, width)


def compress_hevc(luminance_uint8, qp, path_to_encoder, work_dir):
    """One image through HM at one QP; returns (rate_bpp, reconstruction)."""
    if not (path_to_encoder and os.path.isfile(path_to_encoder)):
        raise CodecUnavailableError(
            f"HM encoder binary not found at {path_to_encoder!r}; build "
            "HM-16.15 TAppEncoderStatic and pass its path.")
    (height, width) = luminance_uint8.shape
    path_cfg = os.path.join(work_dir, "intra.cfg")
    path_in = os.path.join(work_dir, "in.yuv")
    path_bin = os.path.join(work_dir, "out.bin")
    path_rec = os.path.join(work_dir, "rec.yuv")
    with open(path_cfg, "w") as file:
        file.write(INTRA_CFG)
    write_400(path_in, luminance_uint8)
    subprocess.check_call(
        [path_to_encoder, "-c", path_cfg,
         "-i", path_in, "-b", path_bin, "-o", path_rec,
         "-wdt", str(width), "-hgt", str(height), "-q", str(qp)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    rate = 8.0 * os.path.getsize(path_bin) / (height * width)
    reconstruction = read_400(path_rec, height, width)
    return (rate, reconstruction)


def evaluate_hevc(luminances_uint8, qps, path_to_encoder):
    """QP sweep over an image stack; returns (rates, psnrs) per image/QP
    (reference ``hevc/hevc.py:223-311``)."""
    nb_images = luminances_uint8.shape[0]
    rates = numpy.zeros((nb_images, len(qps)))
    psnrs = numpy.zeros((nb_images, len(qps)))
    with tempfile.TemporaryDirectory() as work_dir:
        for i in range(nb_images):
            luminance = luminances_uint8[i]
            if luminance.ndim == 3:
                luminance = luminance[:, :, 0]
            for (j, qp) in enumerate(qps):
                (rates[i, j], reconstruction) = compress_hevc(
                    luminance, qp, path_to_encoder, work_dir)
                psnrs[i, j] = psnr_2d(luminance, reconstruction)
    return (rates, psnrs)
