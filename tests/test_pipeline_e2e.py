"""End-to-end true-rate pipeline test.

Small-scale version of BASELINE config[3] ("Kodak-24 batch with
lossless arithmetic coding"): encode images, collect coding statistics
on a held-out set, then run the pipelined compressor - device decode
overlapped with host arithmetic coding - asserting bit-exact coding and
sane rates.
"""

import jax
import numpy
import pytest

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
    assert reconstructions.dtype == numpy.uint8  # device-side BT.601 cast
    numpy.testing.assert_array_equal(reconstructions, expected)

    # Compress-only serving mode: no decode dispatch, no reconstruction
    # fetch, identical verified bitstream sizes.
    compress_only = PipelinedCompressor(
        params, bin_widths, True, probabilities, map_mean,
        idx_map_exception=idx_exception, batch_size=2, reconstruct=False)
    (recs_none, nb_bits_only) = compress_only(test_images)
    assert recs_none is None
    numpy.testing.assert_array_equal(nb_bits_only, nb_bits)


def test_pipelined_compressor_window_bounds_in_flight_batches():
    """Streaming over many batches (>=10x the window) must keep the
    dispatched-but-uncoded window at max_in_flight, produce the same
    bits as an unbounded pass, and the no-verify serving mode must
    report identical bit counts (same encoder, no verify-decode)."""
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(5), True)
    bin_widths = numpy.full(128, 1.0, numpy.float32)
    rng = numpy.random.default_rng(6)
    held_out = rng.integers(16, 236, size=(4, 32, 32, 1)).astype(numpy.uint8)
    # 24 images at batch_size 1 = 24 batches against a window of 2.
    test_images = rng.integers(16, 236, size=(24, 32, 32, 1)).astype(numpy.uint8)

    y_held_out = encode_mini_batches(held_out, params, True, batch_size=4)
    map_mean = numpy.mean(y_held_out, axis=(0, 1, 2))
    probabilities = stats.compute_binary_probabilities(
        y_held_out, bin_widths, map_mean, truncated_unary_length=10)

    kwargs = dict(batch_size=1, reconstruct=False)
    windowed = PipelinedCompressor(params, bin_widths, True, probabilities,
                                   map_mean, max_in_flight=2, **kwargs)
    (_, bits_windowed) = windowed(test_images)
    assert windowed.peak_in_flight == 2

    wide = PipelinedCompressor(params, bin_widths, True, probabilities,
                               map_mean, max_in_flight=64, **kwargs)
    (_, bits_wide) = wide(test_images)
    assert wide.peak_in_flight == 24  # window never binds here
    numpy.testing.assert_array_equal(bits_windowed, bits_wide)

    no_verify = PipelinedCompressor(params, bin_widths, True, probabilities,
                                    map_mean, max_in_flight=2, verify=False,
                                    **kwargs)
    (_, bits_no_verify) = no_verify(test_images)
    numpy.testing.assert_array_equal(bits_no_verify, bits_windowed)

    with pytest.raises(ValueError):
        PipelinedCompressor(params, bin_widths, True, probabilities, map_mean,
                            max_in_flight=0)


def test_device_symbols_match_reference_host_quantization():
    """The on-device symbol extraction (round((y - mean)/delta) as int16)
    must reproduce the reference-style host chain: quantize_per_map on
    the centered latents, divide by delta, cast_float_to_int16
    (``lossless/compression.py:137-142``)."""
    import jax.numpy as jnp

    from autoencoder_based_image_compression_tpu.ops.quantization import (
        cast_float_to_int16, quantize_per_map)

    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(3), True)
    rng = numpy.random.default_rng(4)
    images = rng.integers(16, 236, size=(2, 32, 32, 1)).astype(numpy.uint8)
    bin_widths = numpy.asarray(0.5 + rng.random(128), numpy.float32)
    map_mean = rng.normal(size=(128,)).astype(numpy.float32)

    compressor = PipelinedCompressor(
        params, bin_widths, True, numpy.full((128, 10), 0.5), map_mean,
        batch_size=2)
    (symbols_dev, symbols_dev8, max_abs) = compressor.encode_symbols_fn(
        params, jnp.asarray(images),
        compressor.bin_widths, compressor.map_mean)
    symbols_dev = numpy.asarray(symbols_dev)
    assert symbols_dev.dtype == numpy.int16
    assert float(max_abs) < 32767.0
    if float(max_abs) <= 127.0:
        # The narrow fetch image must agree exactly where it is used.
        numpy.testing.assert_array_equal(
            numpy.asarray(symbols_dev8).astype(numpy.int16), symbols_dev)

    y = encode_mini_batches(images, params, True, batch_size=2)
    centered_q = numpy.asarray(quantize_per_map(y - map_mean, bin_widths))
    expected = numpy.stack([
        cast_float_to_int16(centered_q[i] / bin_widths.reshape(1, 1, -1))
        for i in range(centered_q.shape[0])])
    numpy.testing.assert_array_equal(symbols_dev, expected)


def test_pipelined_compressor_fast_path_matches_parity_path():
    """bf16w serving path through the true-bitstream pipeline: real
    coded bits, reconstructions near the fp32 parity path (TRAINED
    weights - low-precision fidelity is distribution-dependent)."""
    import os
    import pickle

    from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
    from autoencoder_based_image_compression_tpu.parallel.inference import (
        PipelinedCompressor)
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp_dir = os.path.join(repo, "results", "eae", "learning_bw", "0dot5_10000")
    stats_dir = os.path.join(exp_dir, "statistics")
    if not os.path.isfile(os.path.join(stats_dir, "map_mean.npy")):
        pytest.skip("sweep-model coding statistics not present "
                    "(mid-campaign tree); regenerate with "
                    "cli.collect_stats --from_params")
    (params, bin_widths) = load_params_artifact(
        os.path.join(exp_dir, "params_trained.npz"))
    map_mean = numpy.load(os.path.join(stats_dir, "map_mean.npy"))
    probabilities = numpy.load(
        os.path.join(stats_dir, "binary_probabilities_1.npy"))
    with open(os.path.join(stats_dir, "idx_map_exception.pkl"), "rb") as file:
        idx_exc = pickle.load(file)

    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_luminance_stack)

    images = synthetic_luminance_stack(2, 64, 96, seed=7)

    kwargs = dict(idx_map_exception=idx_exc, batch_size=2)
    (recs_fp32, bits_fp32) = PipelinedCompressor(
        params, bin_widths, True, probabilities, map_mean, **kwargs)(images)
    # All low-precision variants; int8 rounds harder than bf16w, so
    # its fidelity bound is looser; bf16w+ (the serving default with
    # the fp32 encoder/decoder tails) must track the parity path at
    # least as closely as plain bf16w (BASELINE.md tabulates all).
    for (variant, min_psnr) in [("bf16w+", 30.0), ("bf16w", 30.0),
                                ("int8", 25.0)]:
        (recs_fast, bits_fast) = PipelinedCompressor(
            params, bin_widths, True, probabilities, map_mean,
            fast_path=variant, **kwargs)(images)
        assert recs_fast.shape == recs_fp32.shape
        assert recs_fast.dtype == numpy.uint8
        assert numpy.all(bits_fast > 0)
        assert abs(int(bits_fast.sum()) - int(bits_fp32.sum())) <= \
            0.08 * int(bits_fp32.sum()), variant
        for i in range(images.shape[0]):
            assert psnr_2d(recs_fp32[i, :, :, 0],
                           recs_fast[i, :, :, 0]) > min_psnr, variant


    with pytest.raises(ValueError):
        PipelinedCompressor(params, bin_widths, True, probabilities, map_mean,
                            fast_path="bf16", **kwargs)


def test_pipelined_compressor_fast_path_rejects_fixed_bw():

    from autoencoder_based_image_compression_tpu.parallel.inference import (
        PipelinedCompressor)

    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), False)
    with pytest.raises(ValueError):
        PipelinedCompressor(params, numpy.ones(128, numpy.float32), False,
                            numpy.full((128, 10), 0.5),
                            numpy.zeros(128, numpy.float32),
                            fast_path="bf16w")
