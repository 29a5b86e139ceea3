"""Builds (lazily) and loads the REFERENCE lossless coder as a shared
library, for the differential bitstream test.

The reference C++ sources are read, unmodified, from
``/root/reference/kodak_tensorflow/lossless/c++/source`` (Bitstream,
BinaryArithmeticCoder, LosslessCoder, compression — the same file set
the reference's own CMake build compiles,
``lossless/c++/linux/CMakeLists.txt``) and compiled together with the
C-ABI shim ``ref_shim.cpp`` into ``build/libref_coder.so``.  No
reference code is copied into this repository; the artifact lands in a
gitignored build directory.
"""

import ctypes
import os
import subprocess

_FIXTURES_DIR = os.path.dirname(os.path.abspath(__file__))
_BUILD_DIR = os.path.join(_FIXTURES_DIR, "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libref_coder.so")

REF_SOURCE_DIR = "/root/reference/kodak_tensorflow/lossless/c++/source"
_REF_SOURCES = [
    "Bitstream.cpp",
    "BinaryArithmeticCoder.cpp",
    "LosslessCoder.cpp",
    "compression.cpp",
    "utils.cpp",
]


def reference_sources_available():
    return all(
        os.path.isfile(os.path.join(REF_SOURCE_DIR, name))
        for name in _REF_SOURCES)


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    command = [
        "g++", "-std=c++11", "-O2", "-fPIC", "-shared",
        # The unmodified reference calls unqualified isnan(); modern
        # libstdc++ only provides std::isnan.
        "-include", os.path.join(_FIXTURES_DIR, "ref_prelude.h"),
        "-I", REF_SOURCE_DIR,
        os.path.join(_FIXTURES_DIR, "ref_shim.cpp"),
    ] + [os.path.join(REF_SOURCE_DIR, name) for name in _REF_SOURCES] + [
        "-o", _LIB_PATH,
    ]
    subprocess.check_call(command, stdout=subprocess.DEVNULL)


def load_reference_library():
    """Returns the ctypes handle to the reference coder, building it
    on first use. Raises if the reference sources are unavailable."""
    if not reference_sources_available():
        raise FileNotFoundError(
            "reference coder sources not found under " + REF_SOURCE_DIR)
    if not os.path.isfile(_LIB_PATH) or any(
            os.path.getmtime(os.path.join(_FIXTURES_DIR, f)) >
            os.path.getmtime(_LIB_PATH)
            for f in ("ref_shim.cpp", "ref_prelude.h")):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ref_compress_lossless_split.restype = ctypes.c_int
    lib.ref_compress_lossless_split.argtypes = [
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    lib.ref_compress_lossless.restype = ctypes.c_int
    lib.ref_compress_lossless.argtypes = [
        ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint32),
    ]
    return lib
