"""Entropy-coding layer: C++ binary arithmetic coder + statistics.

The only native layer of the framework (like the reference's
``kodak_tensorflow/lossless/``): host-side C++ does the inherently
sequential bit-twiddling while the TPU decodes the previous batch.
"""

from autoencoder_based_image_compression_tpu.coding.compression import (
    compress_lossless_images,
    compress_lossless_maps,
    rescale_compress_lossless_maps,
)
