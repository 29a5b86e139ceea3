"""Differentiable math layer: quantization, GDN, density model, metrics.

TPU-native re-design of the reference's ``tfutils/tfutils.py`` (JAX
functional transforms instead of TF graph ops) and the numeric half of
``tools/tools.py``.
"""

from autoencoder_based_image_compression_tpu.ops.quantization import (
    add_uniform_noise,
    cast_bt601,
    cast_float_to_int16,
    quantize_per_map,
)
from autoencoder_based_image_compression_tpu.ops.gdn import gdn, inverse_gdn, init_gdn_gamma
from autoencoder_based_image_compression_tpu.ops.density import (
    DensityTable,
    approximate_entropy,
    approximate_probability,
    area_under_piecewise_linear_functions,
    differential_entropy,
    expand_table,
    init_density_table,
    loss_density_approximation,
    project_density_parameters,
)
