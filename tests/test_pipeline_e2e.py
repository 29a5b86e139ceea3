"""End-to-end true-rate pipeline test.

Small-scale version of BASELINE config[3] ("Kodak-24 batch with
lossless arithmetic coding"): encode images, collect coding statistics
on a held-out set, then run the pipelined compressor - device decode
overlapped with host arithmetic coding - asserting bit-exact coding and
sane rates.
"""

import jax
import numpy

from autoencoder_based_image_compression_tpu.coding import stats
from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.parallel.inference import (
    PipelinedCompressor,
)
from autoencoder_based_image_compression_tpu.train.loop import encode_mini_batches


def test_pipelined_compressor_end_to_end(tmp_path):
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    bin_widths = numpy.full(128, 1.0, numpy.float32)
    rng = numpy.random.default_rng(1)
    held_out = rng.integers(16, 236, size=(4, 32, 32, 1)).astype(numpy.uint8)
    test_images = rng.integers(16, 236, size=(4, 32, 32, 1)).astype(numpy.uint8)

    # Statistics on the held-out set (the reference's "extra" set role).
    y_held_out = encode_mini_batches(held_out, params, True, batch_size=4)
    map_mean = numpy.mean(y_held_out, axis=(0, 1, 2))
    probabilities = stats.compute_binary_probabilities(
        y_held_out, bin_widths, map_mean, truncated_unary_length=10)
    idx_exception = stats.find_index_map_exception(y_held_out)

    compressor = PipelinedCompressor(
        params, bin_widths, True, probabilities, map_mean,
        idx_map_exception=idx_exception, batch_size=2)
    (reconstructions, nb_bits) = compressor(test_images)

    assert reconstructions.shape == (4, 32, 32, 1)
    assert nb_bits.shape == (4,)
    assert numpy.all(nb_bits > 0)
    rates = nb_bits / (32 * 32)
    # Random-init latents are far from Laplacian, so only sanity-bound
    # the true coded rate (bit-exactness is asserted inside the coder).
    assert numpy.all(rates < 200.0)

    # The pipelined reconstructions must equal the plain decode of the
    # centered-quantized latents.
    from autoencoder_based_image_compression_tpu.ops.quantization import (
        quantize_per_map)
    from autoencoder_based_image_compression_tpu.train.loop import (
        decode_mini_batches)

    y = encode_mini_batches(test_images, params, True, batch_size=4)
    centered_q = numpy.asarray(quantize_per_map(y - map_mean, bin_widths))
    expected = decode_mini_batches(centered_q + map_mean, params, True, 4)
    from autoencoder_based_image_compression_tpu.ops.quantization import cast_bt601

    numpy.testing.assert_array_equal(cast_bt601(reconstructions), expected)
