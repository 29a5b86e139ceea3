"""Cross-cutting utilities: path naming, argparse validators, image ops."""

from autoencoder_based_image_compression_tpu.utils.naming import float_to_str
from autoencoder_based_image_compression_tpu.utils.parsing import (
    float_strictly_positive,
    int_positive,
    int_strictly_positive,
)
