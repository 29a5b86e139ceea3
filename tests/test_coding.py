"""Cross-layer coding tests: Python -> ctypes -> C++ coder.

Modeled on the reference's ``test_lossless.py``: synthesize
Laplace-distributed maps and compare the coded cost to the theoretical
entropy cost (``test_lossless.py:18-88``), assert bit-exact round trips,
and exercise the statistics pipeline end-to-end.
"""

import numpy
import pytest

from autoencoder_based_image_compression_tpu.coding import native, stats
from autoencoder_based_image_compression_tpu.coding.compression import (
    compress_lossless_maps,
    rescale_compress_lossless_maps,
)
from autoencoder_based_image_compression_tpu.ops import metrics


def _laplace_maps(rng, shape, scale):
    return rng.laplace(0.0, scale, size=shape).astype(numpy.float32)


def _tu_probabilities(symbols, tu_len):
    (zeros, ones) = stats.count_binary_decisions(numpy.absolute(symbols.astype(numpy.float32)),
                                                 1.0, tu_len)
    total = zeros + ones
    with numpy.errstate(invalid="ignore"):
        probs = zeros.astype(numpy.float64) / total.astype(numpy.float64)
    probs[numpy.isnan(probs)] = 0.5
    probs[probs == 0.0] = 0.01
    probs[probs == 1.0] = 0.99
    return probs


def test_single_map_roundtrip_bit_exact():
    rng = numpy.random.default_rng(0)
    symbols = numpy.round(_laplace_maps(rng, (32 * 48,), 2.0)).astype(numpy.int16)
    probs = _tu_probabilities(symbols, 10)
    (rec, nb_bits) = native.compress_lossless_flattened_map(symbols, probs)
    numpy.testing.assert_array_equal(rec, symbols)
    assert nb_bits > 0


def test_coded_cost_close_to_entropy():
    # With matched truncated-unary probabilities, the arithmetic-coded
    # cost of Laplace symbols approaches the entropy cost (the EG0/sign
    # bypass bits add overhead; the reference test tolerates the same).
    rng = numpy.random.default_rng(1)
    symbols = numpy.round(_laplace_maps(rng, (64 * 96,), 1.2)).astype(numpy.int16)
    probs = _tu_probabilities(symbols, 12)
    (_, nb_bits) = native.compress_lossless_flattened_map(symbols, probs)
    entropy_cost = symbols.size * metrics.discrete_entropy(
        symbols.astype(numpy.float32), 1.0)
    assert nb_bits >= entropy_cost * 0.98  # cannot beat entropy (up to flush slack)
    assert nb_bits <= entropy_cost * 1.25  # and stays within modest overhead


def test_batch_matches_sequential():
    rng = numpy.random.default_rng(2)
    maps = numpy.round(_laplace_maps(rng, (8, 32 * 32), 1.5)).astype(numpy.int16)
    probs = numpy.stack([_tu_probabilities(maps[i], 10) for i in range(8)])
    (rec_batch, bits_batch) = native.compress_lossless_batch(maps, probs, nb_threads=4)
    numpy.testing.assert_array_equal(rec_batch, maps)
    for i in range(8):
        (_, bits_single) = native.compress_lossless_flattened_map(maps[i], probs[i])
        assert bits_single == bits_batch[i]


def test_compress_lossless_maps_with_exception():
    rng = numpy.random.default_rng(3)
    stack = numpy.round(_laplace_maps(rng, (16, 24, 4), 1.0)).astype(numpy.int16)
    probs = numpy.stack([
        _tu_probabilities(stack[:, :, i].ravel(), 10) for i in range(4)])
    (rec, nb_bits) = compress_lossless_maps(stack, probs, idx_map_exception=2)
    numpy.testing.assert_array_equal(rec, stack)
    expected_exception = numpy.ceil(
        16 * 24 * metrics.discrete_entropy(stack[:, :, 2].astype(numpy.float32), 1.0))
    assert nb_bits[2] == expected_exception.astype(numpy.uint32)


def test_compress_lossless_images_matches_per_image_maps():
    """The batch-of-images serving entry must report exactly the bit
    totals of the per-image compress_lossless_maps path, in both the
    verifying and the encode-only modes."""
    rng = numpy.random.default_rng(11)
    stack = numpy.round(_laplace_maps(rng, (3, 16, 24, 4), 1.0)).astype(numpy.int16)
    probs = numpy.stack([
        _tu_probabilities(stack[:, :, :, i].ravel(), 10) for i in range(4)])
    from autoencoder_based_image_compression_tpu.coding.compression import (
        compress_lossless_images)

    bits_batch = compress_lossless_images(stack, probs, idx_map_exception=1)
    bits_noverify = compress_lossless_images(stack, probs, idx_map_exception=1,
                                             verify=False)
    numpy.testing.assert_array_equal(bits_batch, bits_noverify)
    for i in range(stack.shape[0]):
        (rec, bits_maps) = compress_lossless_maps(stack[i], probs,
                                                  idx_map_exception=1)
        numpy.testing.assert_array_equal(rec, stack[i])
        assert int(bits_maps.sum()) == int(bits_batch[i])


def test_rescale_compress_lossless_maps_roundtrip():
    rng = numpy.random.default_rng(4)
    bin_widths = numpy.array([0.5, 1.0, 1.5], dtype=numpy.float32)
    latents = _laplace_maps(rng, (16, 24, 3), 1.0)
    centered_quantized = numpy.stack(
        [bin_widths[i] * numpy.round(latents[:, :, i] / bin_widths[i]) for i in range(3)],
        axis=2).astype(numpy.float32)
    symbols = numpy.round(centered_quantized / bin_widths.reshape(1, 1, 3))
    probs = numpy.stack([
        _tu_probabilities(symbols[:, :, i].astype(numpy.int16).ravel(), 10)
        for i in range(3)])
    total_bits = rescale_compress_lossless_maps(centered_quantized, bin_widths, probs)
    assert total_bits > 0


def test_count_binary_decisions_manual():
    # Symbols 0,0,1,2 with tu_len 2: decision0 sees 0,0,1,1 -> zeros=2, ones=2;
    # decision1 sees (for the two nonzero) 0 for symbol 1, 1 for symbol 2.
    data = numpy.array([0.0, 0.0, 1.0, 2.0], dtype=numpy.float32)
    (zeros, ones) = stats.count_binary_decisions(data, 1.0, 2)
    numpy.testing.assert_array_equal(zeros, numpy.array([2, 1]))
    numpy.testing.assert_array_equal(ones, numpy.array([2, 1]))


def test_find_index_map_exception_prefers_uniform():
    rng = numpy.random.default_rng(5)
    nb_maps = 5
    y = rng.laplace(0.0, 1.0, size=(4, 16, 16, nb_maps)).astype(numpy.float32)
    y[:, :, :, 3] = rng.uniform(-8.0, 8.0, size=(4, 16, 16)).astype(numpy.float32)
    assert stats.find_index_map_exception(y) == 3


def test_save_statistics_idempotent(tmp_path):
    rng = numpy.random.default_rng(6)
    y = rng.laplace(0.0, 1.0, size=(4, 8, 8, 3)).astype(numpy.float32)
    bin_widths = numpy.ones(3, dtype=numpy.float32)
    multipliers = numpy.array([1.0, 2.0], dtype=numpy.float32)
    p_mean = str(tmp_path / "map_mean.npy")
    p_idx = str(tmp_path / "idx_map_exception.pkl")
    p_probs = [str(tmp_path / f"binary_probabilities_{m}.npy") for m in (1, 2)]
    stats.save_statistics(y, bin_widths, multipliers, 10, p_mean, p_idx, p_probs)
    for path in [p_mean, p_idx] + p_probs:
        assert numpy.load(path, allow_pickle=True) is not None
    probs = numpy.load(p_probs[0])
    assert probs.shape == (3, 10)
    assert probs.min() >= 0.01 and probs.max() <= 0.99
    # Second invocation takes the already-exists path.
    stats.save_statistics(y, bin_widths, multipliers, 10, p_mean, p_idx, p_probs)


def test_collect_stats_cli_from_params(tmp_path):
    """collect_stats --from_params regenerates the full statistics set
    from the version-controlled params_trained.npz export alone (the
    per-part train-state checkpoints are not tracked) and writes the
    step-stamped pairing marker the benchmark's consistency check reads."""
    import json

    import jax

    from autoencoder_based_image_compression_tpu.cli import collect_stats
    from autoencoder_based_image_compression_tpu.models import conv_eae
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        save_params_artifact)

    exp_dir = tmp_path / "results" / "learning_bw" / "0dot5_10000"
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    bin_widths = numpy.full(128, 0.5, dtype=numpy.float32)
    save_params_artifact(str(exp_dir / "params_trained.npz"), params,
                         bin_widths, step=777)
    rng = numpy.random.default_rng(7)
    extra = rng.integers(16, 236, size=(4, 32, 32, 1)).astype(numpy.uint8)
    path_extra = str(tmp_path / "extra.npy")
    numpy.save(path_extra, extra)

    collect_stats.main(["0.5", "10000.0", "1", "--learn_bin_widths",
                        "--from_params", "--batch_size", "2",
                        "--path_to_extra_data", path_extra,
                        "--results_root", str(tmp_path / "results")])

    stats_dir = exp_dir / "statistics"
    assert (stats_dir / "map_mean.npy").is_file()
    assert (stats_dir / "idx_map_exception.pkl").is_file()
    probs = numpy.load(stats_dir / "binary_probabilities_1.npy")
    assert probs.shape == (128, 10)
    # The from_params marker records only the artifact's step (the
    # authoritative pairing key); the user-supplied model index is not
    # recorded as fact.
    marker = json.loads((stats_dir / "stats_model_idx.json").read_text())
    assert marker == {"step": 777}

    # Stale-stats guard: re-running with a newer artifact over
    # pre-existing statistics files takes save_statistics'
    # already-exists path, so the marker must NOT be re-stamped with
    # the new step over the old probability tables (that would defeat
    # bench.py's artifact/stats mismatch check).
    save_params_artifact(str(exp_dir / "params_trained.npz"), params,
                         bin_widths, step=888)
    collect_stats.main(["0.5", "10000.0", "1", "--learn_bin_widths",
                        "--from_params", "--batch_size", "2",
                        "--path_to_extra_data", path_extra,
                        "--results_root", str(tmp_path / "results")])
    marker = json.loads((stats_dir / "stats_model_idx.json").read_text())
    assert marker == {"step": 777}
