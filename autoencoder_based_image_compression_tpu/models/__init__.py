"""Model layer: conv entropy autoencoder (Kodak), dense EAE + VAE (SVHN)."""

from autoencoder_based_image_compression_tpu.models.conv_eae import (
    conv_transpose_same,
    decode,
    encode,
    init_conv_eae_params,
    weight_l2_norm,
)
