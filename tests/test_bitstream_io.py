"""Bitstream container tests: real file write/read round trips."""

import numpy

from autoencoder_based_image_compression_tpu.coding import stats
from autoencoder_based_image_compression_tpu.coding.bitstream_io import (
    decode_map_from_bytes,
    encode_map_to_bytes,
    read_compressed_latents,
    write_compressed_latents,
)


def _probabilities_for(symbols, tu_len=10):
    (zeros, ones) = stats.count_binary_decisions(
        numpy.absolute(symbols.astype(numpy.float32)), 1.0, tu_len)
    total = zeros + ones
    with numpy.errstate(invalid="ignore"):
        probs = zeros.astype(numpy.float64) / total.astype(numpy.float64)
    probs[numpy.isnan(probs)] = 0.5
    return numpy.clip(probs, 0.01, 0.99)


def test_map_stream_roundtrip():
    rng = numpy.random.default_rng(0)
    symbols = numpy.round(rng.laplace(0, 2.0, 32 * 48)).astype(numpy.int16)
    probs = _probabilities_for(symbols)
    (bac, bac_bits, byp, byp_bits) = encode_map_to_bytes(symbols, probs)
    assert bac_bits + byp_bits > 0
    decoded = decode_map_from_bytes(symbols.size, probs, bac, bac_bits, byp, byp_bits)
    numpy.testing.assert_array_equal(decoded, symbols)


def test_file_roundtrip_with_exception_map(tmp_path):
    rng = numpy.random.default_rng(1)
    nb_maps = 6
    bin_widths = rng.uniform(0.8, 2.0, nb_maps).astype(numpy.float32)
    map_mean = rng.normal(0, 1, nb_maps).astype(numpy.float32)
    symbols = numpy.round(rng.laplace(0, 2.0, (8, 12, nb_maps)))
    centered_quantized = (symbols * bin_widths.reshape(1, 1, -1)).astype(numpy.float32)
    probs = numpy.stack([
        _probabilities_for(symbols[:, :, i].astype(numpy.int16).ravel())
        for i in range(nb_maps)])

    path = str(tmp_path / "image.aeic")
    nb_bits = write_compressed_latents(path, centered_quantized, bin_widths,
                                       map_mean, probs, idx_map_exception=3)
    assert nb_bits > 0
    (decoded, bw_out, mean_out) = read_compressed_latents(path, probs)
    numpy.testing.assert_array_equal(decoded, centered_quantized)
    numpy.testing.assert_array_equal(bw_out, bin_widths)
    numpy.testing.assert_array_equal(mean_out, map_mean)


def test_file_size_tracks_coder_cost(tmp_path):
    # The container overhead over the raw coded bits is the header +
    # byte alignment; assert it is small for realistic maps.
    rng = numpy.random.default_rng(2)
    nb_maps = 8
    bin_widths = numpy.ones(nb_maps, numpy.float32)
    map_mean = numpy.zeros(nb_maps, numpy.float32)
    symbols = numpy.round(rng.laplace(0, 1.5, (16, 24, nb_maps)))
    centered_quantized = symbols.astype(numpy.float32)
    probs = numpy.stack([
        _probabilities_for(symbols[:, :, i].astype(numpy.int16).ravel())
        for i in range(nb_maps)])
    path = str(tmp_path / "image.aeic")
    nb_bits_file = write_compressed_latents(path, centered_quantized, bin_widths,
                                            map_mean, probs)
    from autoencoder_based_image_compression_tpu.coding.compression import (
        compress_lossless_maps)

    (_, nb_bits_each) = compress_lossless_maps(
        centered_quantized.astype(numpy.int16), probs)
    overhead = nb_bits_file - int(numpy.sum(nb_bits_each))
    # header 4+16 bytes + 2*4*nb_maps side info + per-map 8-byte length
    # fields + <=2 bytes alignment per stream.
    assert 0 < overhead <= 8 * (20 + 8 * nb_maps + 8 * nb_maps + 2 * 2 * nb_maps)
