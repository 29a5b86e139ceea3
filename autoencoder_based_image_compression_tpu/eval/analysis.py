"""Latent-space analysis probes.

Re-design of ``kodak_tensorflow/eae/analysis.py``: single-latent
activation through the decoder (``:17`` - the translation-covariance
probe of ``activating_eae.py``), per-map Laplace MLE fits (``:97`` -
``fitting_eae_kodak.py``), and all-but-one map masking (``:191`` -
``masking_eae_kodak.py``). The SVHN joint fit (``svhn/eae/analysis.py:13``)
is :func:`fit_latents_jointly`.
"""

import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops.quantization import cast_bt601


def activate_latent_variable(params, learn_bin_widths, height_map, width_map,
                             row_activation, col_activation, idx_map_activation,
                             activation_value, map_mean):
    """Decodes latents that are all at their map means except one.

    Returns the uint8 reconstruction (reference ``eae/analysis.py:17-95``).
    """
    latents = numpy.tile(map_mean.reshape(1, 1, 1, -1),
                         (1, height_map, width_map, 1)).astype(numpy.float32)
    latents[0, row_activation, col_activation, idx_map_activation] = activation_value
    reconstruction = conv_eae.decode(params, jnp.asarray(latents), learn_bin_widths)
    return cast_bt601(numpy.asarray(reconstruction))[0, :, :, 0]


def fit_maps(y_float32):
    """Per-map Laplace MLE fits of the latent distributions.

    Returns ``(locations, scales)`` arrays of length nb_maps
    (reference ``eae/analysis.py:97-189``; scipy MLE like the
    reference).
    """
    import scipy.stats

    nb_maps = y_float32.shape[3]
    locations = numpy.zeros(nb_maps)
    scales = numpy.zeros(nb_maps)
    for i in range(nb_maps):
        (locations[i], scales[i]) = scipy.stats.laplace.fit(
            y_float32[:, :, :, i].flatten())
    return (locations, scales)


def fit_latents_jointly(y_float32):
    """Single Laplace fit of all latents (reference ``svhn/eae/analysis.py:13``)."""
    import scipy.stats

    return scipy.stats.laplace.fit(numpy.asarray(y_float32).flatten())


def mask_maps(y_float32, params, learn_bin_widths, idx_unmasked, map_mean):
    """Decodes with every map except one frozen at its mean.

    Returns uint8 reconstructions (reference ``eae/analysis.py:191-257``).
    """
    masked = numpy.tile(map_mean.reshape(1, 1, 1, -1),
                        y_float32.shape[:3] + (1,)).astype(numpy.float32)
    masked[:, :, :, idx_unmasked] = y_float32[:, :, :, idx_unmasked]
    reconstruction = conv_eae.decode(params, jnp.asarray(masked), learn_bin_widths)
    return cast_bt601(numpy.asarray(reconstruction))[:, :, :, 0]
