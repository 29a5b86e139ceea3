"""Generalized Divisive Normalization as a channel matmul.

GDN (Balle, Laparra, Simoncelli, ICLR 2016) normalizes every spatial
position's channel vector:

    gdn(x)_c  = x_c / sqrt(sum_k gamma[k, c] * x_k^2 + beta_c)
    igdn(x)_c = x_c * sqrt(sum_k gamma[k, c] * x_k^2 + beta_c)

The reference implements this as a reshape-to-2D matmul over channels
(``kodak_tensorflow/tfutils/tfutils.py:363-397`` and ``:480-509``),
which is exactly one MXU tile at 128 channels. Here the contraction is
expressed with ``jnp.einsum`` over the channel axis so XLA maps it to
the MXU without any reshape, and fuses the square/rsqrt elementwise ops
around it. A hand-written Pallas kernel for the inference path lives in
``ops/pallas/gdn_kernel.py``.
"""

import jax
import jax.numpy as jnp


def _norm_pool(x, gamma, beta):
    """sum_k gamma[k, c] * x_k^2 + beta_c over the trailing channel axis.

    Float32 MXU precision: the parity gates (0.05 dB PSNR) rule out the
    TPU's default bfloat16 matmul passes on this path.
    """
    pool = jnp.einsum("...k,kc->...c", jnp.square(x), gamma,
                      precision=jax.lax.Precision.HIGHEST)
    return pool + beta


def gdn(x, gamma, beta):
    """Forward GDN: divide by the sqrt of the weighted squared-channel pool.

    Parameters
    ----------
    x : jnp.ndarray
        Array of shape ``(..., C)`` (NHWC activations).
    gamma : jnp.ndarray
        Symmetric nonnegative weights, shape ``(C, C)``.
    beta : jnp.ndarray
        Additive coefficients, shape ``(C,)``.
    """
    return x * jax.lax.rsqrt(_norm_pool(x, gamma, beta))


def inverse_gdn(x, gamma, beta):
    """Inverse GDN: multiply by the sqrt of the weighted squared-channel pool."""
    return x * jnp.sqrt(_norm_pool(x, gamma, beta))


def init_gdn_gamma(key, nb_maps, min_gamma=2.0e-5, max_gamma=0.01):
    """Symmetric uniform init of the GDN weights.

    Reference ``tfutils/tfutils.py:445-478``: U(min_gamma, 0.01) then
    symmetrized.

    Raises
    ------
    ValueError
        If `min_gamma` does not belong to ]0., 0.01].
    """
    if min_gamma > 0.01 or min_gamma <= 0.0:
        raise ValueError("`min_gamma` does not belong to ]0., 0.01].")
    raw = jax.random.uniform(
        key, (nb_maps, nb_maps), jnp.float32, minval=min_gamma, maxval=max_gamma
    )
    return 0.5 * (raw + raw.T)
