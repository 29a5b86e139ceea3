"""Fused GDN/IGDN Pallas kernel.

GDN over C=128 channels is one 128x128 MXU tile per row block:
``pool = x^2 @ gamma + beta; out = x * rsqrt(pool)`` (or ``* sqrt`` for
IGDN). XLA already fuses the square and rsqrt into the matmul epilogue;
this hand kernel exists to (a) pin the whole op into a single VMEM-
resident pass per row block with no intermediate HBM traffic and (b)
serve as the fusion site for the quantizer in the encode direction
(``quantize=True`` fuses ``delta*round(x/delta)`` into the same pass,
saving one full latent-tensor HBM round trip).

Reference semantics: ``kodak_tensorflow/tfutils/tfutils.py:363-397``
(GDN as reshape-to-2D channel matmul) and ``:480-509`` (IGDN).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_ROWS = 512


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse):
    x = x_ref[:]
    if x.dtype == jnp.bfloat16:
        # Serving-path semantics = ops.gdn.gdn_lowp: bf16 operands into
        # the MXU, fp32 accumulation, fp32 sqrt/rsqrt, bf16 out.
        pool = jnp.dot(x * x, gamma_ref[:],
                       preferred_element_type=jnp.float32)
    else:
        # HIGHEST precision: the default bf16 MXU passes cost ~2e-3
        # absolute error, which the 0.05 dB PSNR parity budget cannot
        # absorb on the fp32 parity path.
        pool = jnp.dot(x * x, gamma_ref[:], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    pool = pool + beta_ref[:]
    scale = jnp.sqrt(pool) if inverse else jax.lax.rsqrt(pool)
    out_ref[:] = (x.astype(jnp.float32) * scale).astype(x.dtype)


def _gdn_quantize_kernel(x_ref, gamma_ref, beta_ref, bw_ref, out_ref, *, inverse):
    x = x_ref[:]
    pool = jnp.dot(x * x, gamma_ref[:], preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    pool = pool + beta_ref[:]
    normalized = x * (jnp.sqrt(pool) if inverse else jax.lax.rsqrt(pool))
    bw = bw_ref[:]
    out_ref[:] = bw * jnp.round(normalized / bw)


def _pad_rows(rows, block_rows):
    return -(-rows // block_rows) * block_rows


@functools.partial(jax.jit, static_argnames=("inverse", "block_rows", "interpret"))
def gdn_pallas_2d(x, gamma, beta, inverse=False, block_rows=DEFAULT_BLOCK_ROWS,
                  interpret=False):
    """GDN/IGDN on a (rows, C) matrix via one Pallas pass.

    Rows are padded to a block multiple; C should be a multiple of 128
    (it is 128 in the codec).
    """
    (rows, channels) = x.shape
    gamma = gamma.astype(x.dtype)   # bf16 inputs keep the MXU pass bf16
    beta = beta.astype(jnp.float32)
    padded = _pad_rows(rows, block_rows)
    if padded != rows:
        x = jnp.pad(x, ((0, padded - rows), (0, 0)))
    grid = (padded // block_rows,)
    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, channels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, channels), x.dtype),
        interpret=interpret,
    )(x, gamma, beta)
    return out[:rows]


@functools.partial(jax.jit,
                   static_argnames=("inverse", "block_rows", "interpret"))
def gdn_quantize_pallas_2d(x, gamma, beta, bin_widths, inverse=False,
                           block_rows=DEFAULT_BLOCK_ROWS, interpret=False):
    """Fused GDN/IGDN + per-channel uniform quantization in one pass.

    The encoder's bottleneck sequence (final GDN then quantizer) never
    materializes the unquantized latents in HBM.
    """
    (rows, channels) = x.shape
    padded = _pad_rows(rows, block_rows)
    if padded != rows:
        x = jnp.pad(x, ((0, padded - rows), (0, 0)))
    grid = (padded // block_rows,)
    out = pl.pallas_call(
        functools.partial(_gdn_quantize_kernel, inverse=inverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels, channels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((channels,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((channels,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, channels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, channels), x.dtype),
        interpret=interpret,
    )(x, gamma, beta, bin_widths)
    return out[:rows]


def gdn_pallas(x_nhwc, gamma, beta, inverse=False, interpret=False):
    """NHWC wrapper: flattens spatial dims, runs the kernel, reshapes."""
    shape = x_nhwc.shape
    flat = x_nhwc.reshape(-1, shape[-1])
    out = gdn_pallas_2d(flat, gamma, beta, inverse=inverse, interpret=interpret)
    return out.reshape(shape)
