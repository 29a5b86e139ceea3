"""End-to-end file-level codec CLI: image -> .aeic bitstream -> image.

Uses the checked-in TRAINED model artifact and its extra-set statistics,
so the test exercises exactly what a user of the codec runs.
"""

import os

import numpy
import pytest

from autoencoder_based_image_compression_tpu.cli import codec

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MODEL = os.path.join(REPO, "results", "eae", "learning_bw", "0dot5_10000",
                     "params_trained.npz")

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(os.path.dirname(MODEL), "statistics",
                                    "map_mean.npy")),
    reason="sweep-model coding statistics not present (mid-campaign tree); "
           "regenerate with cli.collect_stats --from_params")


def test_compress_decompress_roundtrip(tmp_path):
    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_luminance_stack)
    from autoencoder_based_image_compression_tpu.utils.image import save_image

    luminance = synthetic_luminance_stack(1, 64, 96, seed=5)[0, :, :, 0]
    path_in = str(tmp_path / "input.png")
    path_bin = str(tmp_path / "image.aeic")
    path_out = str(tmp_path / "output.png")
    save_image(path_in, luminance)

    codec.main(["compress", path_in, path_bin, "--model", MODEL])
    assert os.path.getsize(path_bin) > 0
    # The bitstream is a real compressed file: far below the raw size.
    assert os.path.getsize(path_bin) < luminance.size

    codec.main(["decompress", path_bin, path_out, "--model", MODEL,
                "--reference", path_in])

    from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
    from autoencoder_based_image_compression_tpu.utils.image import (
        read_image_mode)

    reconstruction = read_image_mode(path_out, "L")
    assert reconstruction.shape == luminance.shape
    # Trained model at gamma=10000 reaches ~28 dB on this content class;
    # loose bound that still catches a broken coding/decoding chain.
    assert psnr_2d(luminance, reconstruction) > 20.0


def test_decompress_matches_direct_decode(tmp_path):
    """The file round trip must reproduce the in-memory pipeline
    bit-exactly (quantized latents are coded losslessly)."""
    import jax.numpy as jnp

    from autoencoder_based_image_compression_tpu.cli.codec import (
        _load_model,
        _load_statistics,
    )
    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_luminance_stack)
    from autoencoder_based_image_compression_tpu.models import conv_eae
    from autoencoder_based_image_compression_tpu.ops.quantization import (
        cast_bt601,
        quantize_per_map,
    )
    from autoencoder_based_image_compression_tpu.utils.image import (
        read_image_mode,
        save_image,
    )

    luminance = synthetic_luminance_stack(1, 64, 64, seed=6)[0, :, :, 0]
    path_in = str(tmp_path / "input.png")
    path_bin = str(tmp_path / "image.aeic")
    path_out = str(tmp_path / "output.png")
    save_image(path_in, luminance)
    codec.main(["compress", path_in, path_bin, "--model", MODEL])
    codec.main(["decompress", path_bin, path_out, "--model", MODEL])

    (params, bin_widths, learn_bw) = _load_model(MODEL)
    (map_mean, _, _) = _load_statistics(MODEL, 1.0)
    y = numpy.asarray(conv_eae.encode(
        params, jnp.asarray(luminance[None, :, :, None], jnp.float32),
        learn_bw))[0]
    centered_q = numpy.asarray(quantize_per_map(
        y - map_mean.reshape(1, 1, -1), numpy.asarray(bin_widths)))
    expected = cast_bt601(numpy.asarray(conv_eae.decode(
        params, jnp.asarray((centered_q + map_mean.reshape(1, 1, -1))[None]),
        learn_bw))[0, :, :, 0])
    numpy.testing.assert_array_equal(read_image_mode(path_out, "L"), expected)
