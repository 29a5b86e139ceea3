// C-ABI shim over the REFERENCE lossless coder, for the differential
// bitstream test (tests/test_coder_differential.py).
//
// This file contains no reference code: it is compiled together with
// the reference sources read from /root/reference at test-fixture
// build time (see tests/fixtures/build_ref_coder.py), producing
// libref_coder.so in a gitignored build directory.

#include <cstdint>

#include "compression.h"
#include "LosslessCoder.h"

extern "C" {

// Mirrors the reference compress_lossless() (compression.cpp:3-65)
// exactly, but reports the bac / bypass occupancies separately so the
// differential test can compare each stream against our coder.
// Returns 0 on success, 1 on any error_code / exception.
int ref_compress_lossless_split(uint32_t size, const int16_t* input,
                                int16_t* output, uint8_t tu_len,
                                const double* probabilities,
                                uint32_t* bac_bits, uint32_t* bypass_bits) {
  if (!input || !output || !probabilities || !bac_bits || !bypass_bits) {
    return 1;
  }
  try {
    uint32_t required_size_in_bits =
        size * ((tu_len > 32) ? (uint32_t)tu_len : (uint32_t)32);
    LosslessCoder coder(required_size_in_bits, tu_len, probabilities);
    for (uint32_t i = 0; i < size; ++i) {
      if (coder.write_signed_ueg0(input[i])) return 1;
    }
    if (coder.stop_bac_encoding()) return 1;
    *bac_bits = coder.occupancy_in_bits_bac();
    *bypass_bits = coder.occupancy_in_bits_bypass();
    if (coder.start_bac_decoding()) return 1;
    for (uint32_t i = 0; i < size; ++i) {
      if (coder.read_signed_ueg0(output[i])) return 1;
    }
  } catch (...) {
    return 1;
  }
  return 0;
}

// The reference's own array-level entry (total bits), for parity with
// lossless/interface_cython.pyx.
int ref_compress_lossless(uint32_t size, const int16_t* input, int16_t* output,
                          uint8_t tu_len, const double* probabilities,
                          uint32_t* nb_bits) {
  if (!nb_bits) return 1;
  try {
    *nb_bits = compress_lossless(size, input, output, tu_len, probabilities);
  } catch (...) {
    return 1;
  }
  return 0;
}

}  // extern "C"
