"""Architecture and optimizer hyperparameters of the entropy autoencoder.

Mirrors the constants of the reference codec
(``kodak_tensorflow/eae/graph/constants.py:1-59``) plus the TPU-specific
capacity constants that replace the reference's dynamically-shaped
density table.
"""

# Learning rate of the entropy-autoencoder parameters (Adam).
LR_EAE = 1.0e-4

# Learning rate of the piecewise-linear density parameters (SGD).
LR_FCT = 0.2

# Learning rate of the quantization bin widths (SGD).
LR_BW = 2.0e-8

# Weight of the l2-norm weight decay in the rate-distortion objective.
WEIGHT_DECAY_P = 5.0e-4

# Lower projection bound for GDN/IGDN weights and additive coefficients.
MIN_GAMMA_BETA = 2.0e-5

# Projection interval for the quantization bin widths.
MIN_BW = 0.8
MAX_BW = 4.0

# Number of unit intervals in the right half of the density grid at the
# beginning of the first training.
NB_ITVS_PER_SIDE_INIT = 10

# Number of sampling points per unit interval in the density grid.
NB_POINTS_PER_INTERVAL = 5

# Strictly positive floor for the piecewise-linear density parameters:
# keeps limited floating-point precision from rounding them to 0.
LOW_PROJECTION = 1.0e-6

# Conv entropy autoencoder architecture (3 layers, 128 maps each,
# kernels 9/5/5, strides 4/2/2).
NB_MAPS_1 = 128
NB_MAPS_2 = 128
NB_MAPS_3 = 128
WIDTH_KERNEL_1 = 9
WIDTH_KERNEL_2 = 5
WIDTH_KERNEL_3 = 5
STRIDE_1 = 4
STRIDE_2 = 2
STRIDE_3 = 2

# Product of the three strides: input images must have height and width
# divisible by `STRIDE_PROD`; latent maps are `STRIDE_PROD`x smaller.
STRIDE_PROD = STRIDE_1 * STRIDE_2 * STRIDE_3

# --- TPU-specific constants (no reference counterpart) -----------------
#
# The reference grows the density-parameter tensor at runtime
# (`EntropyAutoencoder.py:126-129`, `validate_shape=False`).  XLA
# requires static shapes, so the TPU framework pre-allocates a table for
# `MAX_ITVS_PER_SIDE` unit intervals per side and tracks the live
# extent in a scalar `nb_itvs_per_side`; cells outside the live extent
# are pinned at `LOW_PROJECTION`, which reproduces the reference's
# expansion padding (`tfutils.py:301-361`).
MAX_ITVS_PER_SIDE = 64

# Learning-rate schedule boundaries keyed on the entropy scaling
# coefficient gamma (`EntropyAutoencoder.py:235-243`).
def lr_boundaries(gamma_scaling):
    """Returns the two global-step boundaries of the piecewise-constant
    learning-rate schedule for the entropy-autoencoder parameters."""
    if gamma_scaling < 60000.0:
        return (1500000, 2000000)
    if gamma_scaling < 80000.0:
        return (900000, 950000)
    return (750000, 800000)
