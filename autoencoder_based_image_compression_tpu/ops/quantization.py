"""Uniform scalar quantization and friends.

TPU re-design of the quantizer utilities of the reference
(``kodak_tensorflow/tools/tools.py:883-929`` ``quantize_per_map``,
``tools.py:61-93`` ``cast_bt601``, ``tools.py:95-155``
``cast_float_to_int16``, ``tfutils/tfutils.py:8-43`` ``add_noise``).

All functions are pure ``jnp`` and broadcast over a trailing channel
axis instead of tiling, so they fuse into surrounding XLA computations.
"""

import jax
import jax.numpy as jnp
import numpy


def quantize_per_map(data, bin_widths):
    """Quantizes each channel of `data` with its own uniform scalar step.

    ``out[..., i] = bin_widths[i] * round(data[..., i] / bin_widths[i])``
    (reference ``tools/tools.py:926``).

    Parameters
    ----------
    data : jnp.ndarray
        Array of shape ``(..., C)``.
    bin_widths : jnp.ndarray
        Strictly positive quantization bin widths, shape ``(C,)``.
    """
    bw = jnp.asarray(bin_widths)
    return bw * jnp.round(data / bw)


def add_uniform_noise(key, data, bin_widths):
    """Adds per-channel zero-mean uniform noise U(-delta_i/2, delta_i/2).

    The training-time differentiable surrogate of the quantizer
    (reference ``tfutils/tfutils.py:8-43``).

    Parameters
    ----------
    key : jax.random.PRNGKey
    data : jnp.ndarray
        Array of shape ``(..., C)``.
    bin_widths : jnp.ndarray
        Shape ``(C,)``; the support of the noise on channel i.
    """
    noise = jax.random.uniform(key, data.shape, data.dtype, minval=-0.5, maxval=0.5)
    return data + jnp.asarray(bin_widths) * noise


def cast_bt601(array_float):
    """Clips to the BT.601 luminance range [16, 235], rounds, casts to uint8.

    Reference ``tools/tools.py:61-93``. Accepts numpy or jax arrays and
    returns the matching array type.
    """
    if isinstance(array_float, numpy.ndarray):
        return numpy.round(array_float.clip(16.0, 235.0)).astype(numpy.uint8)
    return jnp.round(jnp.clip(array_float, 16.0, 235.0)).astype(jnp.uint8)


def cast_float_to_int16(array_float):
    """Rounds and casts to int16, asserting the values fit.

    Reference ``tools/tools.py:95-155``: the rounding corrects
    floating-point error from a preceding division; the guard protects
    the int16 symbol range of the arithmetic coder.
    """
    rounded = numpy.round(numpy.asarray(array_float))
    if numpy.any(numpy.absolute(rounded) > 32767.0):
        raise AssertionError("The rounded elements do not fit in int16.")
    return rounded.astype(numpy.int16)


def cast_uint8(array_float):
    """Clips to [0, 255], rounds and casts to uint8 (RGB pixel range)."""
    if isinstance(array_float, numpy.ndarray):
        return numpy.round(array_float.clip(0.0, 255.0)).astype(numpy.uint8)
    return jnp.round(jnp.clip(array_float, 0.0, 255.0)).astype(jnp.uint8)
