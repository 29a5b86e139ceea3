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


def gdn_lowp(x, gamma, beta, inverse=False):
    """GDN/IGDN in the (low-precision) dtype of ``x``.

    Inference fast path: the fp32 GDN at the H/4 feature resolution is
    HBM-bandwidth-bound (the pool matmul is tiny next to the two passes
    over a gigabyte-scale activation), so the engine keeps activations
    bfloat16 *through* the normalization. Precision: the squares and
    gamma enter the MXU bf16-rounded (~0.4% relative each) and the pool
    *accumulates* in float32 (``preferred_element_type``); the
    rsqrt/sqrt then runs in float32. Squaring inside the contraction
    would not help - a default-precision f32 matmul is lowered to the
    same single bf16 MXU pass, re-rounding the products. The parity
    harness measures the end-to-end effect (~65 dB vs the fp32 path).
    """
    pool = jnp.einsum("...k,kc->...c", jnp.square(x), gamma.astype(x.dtype),
                      preferred_element_type=jnp.float32)
    pool = pool + beta
    scale = jnp.sqrt(pool) if inverse else jax.lax.rsqrt(pool)
    return (x.astype(jnp.float32) * scale).astype(x.dtype)


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
