"""Roofline accounting: analytic codec FLOPs vs the chip's measured peak.

The reference never measures speed (SURVEY.md section 6); the north
star requires hot kernels verified against speed-of-light. This module
gives the quantitative half of that check:

- :func:`conv_eae_flops` - exact MAC counts of the conv entropy
  autoencoder's transforms (convs + GDN channel matmuls, the only
  FLOPs-dense ops - reference architecture
  ``eae/graph/components.py:11-142``).
- :func:`measure_matmul_peak` - the achievable matmul ceiling of the
  current device, measured with a large square bf16 matmul (what the
  MXU is built for) rather than read from a spec sheet, so the
  utilization numbers stay honest across hardware generations and
  emulated platforms.
- :func:`roofline_report` - achieved FLOP/s of the codec roundtrip
  against that ceiling.

The codec is bandwidth-lean (128-channel matmul-like convs at every
stage), so MXU utilization is the right single roofline axis; a low
fraction here means fusion/layout work, not more bandwidth.
"""

import time

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu import constants as csts


def _conv_macs(out_height, out_width, kernel_height, kernel_width, nb_in, nb_out):
    return out_height * out_width * kernel_height * kernel_width * nb_in * nb_out


def conv_eae_flops(height, width, learn_bin_widths=True):
    """FLOPs (2 * MACs) of one image through encoder + decoder.

    Counts the three strided convs (9/5/5, strides 4/2/2 - reference
    ``eae/graph/constants.py``), their transposed mirrors, and the GDN /
    IGDN channel matmuls (x^2 @ Gamma, a (HW, 128) @ (128, 128) matmul
    per normalization - reference ``tfutils/tfutils.py:393-397``).
    Elementwise work (bias, sqrt, divide, quantize) is ignored: it is
    orders of magnitude below the matmul term and fuses into it.
    """
    nb_maps = csts.NB_MAPS_3
    (h4, w4) = (height // 4, width // 4)
    (h8, w8) = (height // 8, width // 8)
    (h16, w16) = (height // 16, width // 16)

    macs = 0
    # Encoder convs (SAME padding keeps out = in/stride).
    macs += _conv_macs(h4, w4, 9, 9, 1, csts.NB_MAPS_1)
    macs += _conv_macs(h8, w8, 5, 5, csts.NB_MAPS_1, csts.NB_MAPS_2)
    macs += _conv_macs(h16, w16, 5, 5, csts.NB_MAPS_2, nb_maps)
    # Decoder transposed convs: MACs = (input extent) x kernel x channels.
    macs += _conv_macs(h16, w16, 5, 5, nb_maps, csts.NB_MAPS_2)
    macs += _conv_macs(h8, w8, 5, 5, csts.NB_MAPS_2, csts.NB_MAPS_1)
    macs += _conv_macs(h4, w4, 9, 9, csts.NB_MAPS_1, 1)
    # GDN/IGDN channel matmuls: two in the encoder, two in the decoder,
    # plus the GDN_3/IGDN_4 bottleneck pair iff bin widths are fixed
    # (reference ``EntropyAutoencoder.py:174-188``).
    macs += h4 * w4 * csts.NB_MAPS_1 ** 2      # GDN_1
    macs += h8 * w8 * csts.NB_MAPS_2 ** 2      # GDN_2
    macs += h8 * w8 * csts.NB_MAPS_2 ** 2      # IGDN_5
    macs += h4 * w4 * csts.NB_MAPS_1 ** 2      # IGDN_6
    if not learn_bin_widths:
        macs += 2 * h16 * w16 * nb_maps ** 2   # GDN_3 + IGDN_4
    return 2 * macs


def measure_matmul_peak(size=4096, dtype=jnp.bfloat16, repeats=5, nb_chained=16):
    """Achievable matmul FLOP/s on the current default device.

    Chains ``nb_chained`` dependent (size, size) matmuls in ``dtype``
    with fp32 accumulation inside ONE jitted program (the MXU's native
    workload), so per-dispatch latency - ~27 ms through this
    environment's tunnel, vs sub-ms of compute per matmul - amortizes
    away instead of masquerading as the ceiling. The chain renormalizes
    between steps (negligible VPU work) to stay finite, and each step
    depends on the previous result so XLA cannot collapse the loop.
    Returns FLOP/s (best of ``repeats``, checksum-fetch barrier).
    """
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (size, size), jnp.float32).astype(dtype)
    b = jax.random.normal(key, (size, size), jnp.float32).astype(dtype)

    @jax.jit
    def chained_checksum(a, b):
        def body(_, carry):
            product = jnp.dot(carry, b, preferred_element_type=jnp.float32)
            # Renormalize so the chain neither overflows nor underflows.
            scale = jax.lax.rsqrt(jnp.mean(jnp.square(product)) + 1e-30)
            return (product * scale).astype(dtype)

        out = jax.lax.fori_loop(0, nb_chained, body, a)
        return jnp.sum(out.astype(jnp.float32))

    numpy.asarray(chained_checksum(a, b))  # compile + warm
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        numpy.asarray(chained_checksum(a, b))
        times.append(time.perf_counter() - start)
    return nb_chained * 2.0 * size ** 3 / min(times)


def roofline_report(params, images_uint8, bin_widths, learn_bin_widths=True,
                    repeats=5, peak_flops=None, nb_in_flight=4):
    """Achieved codec FLOP/s vs the measured matmul ceiling.

    Times the int8-stored/bf16-compute fast path and the fp32 parity
    path over the given batch with ``nb_in_flight`` batches dispatched
    back-to-back (the sustained-serving pattern; single-dispatch timing
    would mostly measure dispatch latency), converts to FLOP/s with the
    analytic count of :func:`conv_eae_flops`, and reports utilization
    against the matching per-dtype ceiling: the fp32 parity path vs the
    fp32 matmul peak, the bf16-compute fast path vs the bf16 peak
    (``peak_flops``, when given, is a ``{"parity": x, "fast": y}``
    override). Returns a dict.
    """
    from autoencoder_based_image_compression_tpu.eval.throughput import (
        parity_and_throughput,
    )

    (nb_images, height, width) = images_uint8.shape[:3]
    flops_per_batch = nb_images * conv_eae_flops(height, width, learn_bin_widths)
    measured = parity_and_throughput(params, images_uint8, bin_widths,
                                     repeats=repeats, nb_in_flight=nb_in_flight)
    nb_pixels = nb_images * height * width
    flops_per_pixel = flops_per_batch / nb_pixels
    if peak_flops is None:
        peak_flops = {"parity": measure_matmul_peak(dtype=jnp.float32),
                      "fast": measure_matmul_peak(dtype=jnp.bfloat16)}
    achieved_parity = measured["mpix_per_s_parity"] * 1e6 * flops_per_pixel
    achieved_fast = measured["mpix_per_s_fast"] * 1e6 * flops_per_pixel
    return {
        "flops_per_pixel": flops_per_pixel,
        "peak_flops_per_s_parity": peak_flops["parity"],
        "peak_flops_per_s_fast": peak_flops["fast"],
        "achieved_flops_per_s_parity": achieved_parity,
        "achieved_flops_per_s_fast": achieved_fast,
        "mxu_utilization_parity": achieved_parity / peak_flops["parity"],
        "mxu_utilization_fast": achieved_fast / peak_flops["fast"],
        "mpix_per_s_parity": measured["mpix_per_s_parity"],
        "mpix_per_s_fast": measured["mpix_per_s_fast"],
        "psnr_fast_vs_parity_db": measured["psnr_fast_vs_parity_db"],
    }
