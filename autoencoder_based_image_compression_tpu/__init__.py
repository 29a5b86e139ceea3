"""TPU-native entropy-autoencoder image-compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``thierrydumas/autoencoder_based_image_compression`` (ICASSP 2018,
arXiv:1802.09371): a convolutional GDN entropy autoencoder codec with a
learned piecewise-linear latent density model, uniform scalar
quantization with (optionally learned) bin widths, a binary arithmetic
coder producing true bitstreams, and rate-distortion evaluation against
JPEG2000/HEVC anchors.

Layering (bottom-up):

- ``ops``      pure-JAX differentiable math + Pallas TPU kernels
- ``models``   conv EAE (Kodak), dense EAE + VAE (SVHN)
- ``train``    optimizer trio, alternating update step, checkpointing
- ``coding``   C++ binary arithmetic coder + statistics pipeline
- ``parallel`` mesh/sharding layer (data + model axes over ICI/DCN)
- ``data``     dataset builders (Kodak/BSDS/ImageNet/extra/SVHN)
- ``codecs``   external anchor codecs (JPEG, JPEG2000, HEVC) wrappers
- ``eval``     RD sweeps, Bjontegaard, throughput benchmarks
- ``cli``      script entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
