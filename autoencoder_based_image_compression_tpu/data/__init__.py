"""Dataset layer: Kodak / BSDS / ImageNet / extra / SVHN builders.

Re-design of ``kodak_tensorflow/datasets/`` and ``svhn/svhn/svhn.py``:
RGB -> BT.601 luminance, rotation of portrait images (recording the
rotation list), crops, monolithic ``.npy`` artifacts - kept identical
for preprocessing parity with the reference. Downloads are factored
behind ``source_dir`` arguments: builders consume already-downloaded
files (this environment has no network egress), and every builder is
idempotent via file-existence guards like the reference
(``datasets/kodak/kodak.py:43-45``).
"""

from autoencoder_based_image_compression_tpu.data.kodak import create_kodak
from autoencoder_based_image_compression_tpu.data.imagenet import create_imagenet_training
from autoencoder_based_image_compression_tpu.data.synthetic import (
    synthetic_kodak,
    synthetic_luminance_stack,
)
