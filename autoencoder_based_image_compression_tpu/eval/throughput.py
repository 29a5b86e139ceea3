"""Throughput, scaling and fast-path-parity measurements.

The metrics the reference never measured (SURVEY.md section 6: "Speed:
never measured"): encode+decode Mpix/s/chip, parity of the quantized
fast path against the fp32 path, data-parallel scaling across a mesh,
and a ``jax.profiler`` trace hook for per-kernel inspection.

Timing uses a checksum fetch as the completion barrier:
``block_until_ready`` alone does not reliably block on experimental
PJRT platforms, and fetching bulk pixels would measure the host link
instead of the chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
from autoencoder_based_image_compression_tpu.ops.quantization import (
    cast_bt601,
    quantize_per_map,
)


def time_with_checksum(fn, *args, repeats=5, nb_in_flight=1):
    """Best-of-N wall time of ``jnp.sum(fn(*args))`` fetched to host.

    With ``nb_in_flight > 1``, that many executions are dispatched
    back-to-back before any fetch (the sustained-serving pattern) and
    the PER-EXECUTION time is returned - per-dispatch latency (tens of
    ms through this environment's tunnel) then amortizes away.
    """
    wrapped = jax.jit(lambda *a: jnp.sum(fn(*a)))
    numpy.asarray(wrapped(*args))  # compile + warm
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        checksums = [wrapped(*args) for _ in range(nb_in_flight)]
        for checksum in checksums:
            numpy.asarray(checksum)
        times.append((time.perf_counter() - start) / nb_in_flight)
    return min(times)


def parity_and_throughput(params, images_uint8, bin_widths, repeats=5,
                          nb_in_flight=1, weight_mode="bf16w"):
    """Compares the fp32 parity path against the bf16-activation fast path.

    ``weight_mode`` picks the fast path's weight store: ``"bf16w"``
    (default - bf16-rounded kernels), ``"bf16w+"`` (bf16 with the
    precision-surgical fp32 tails, the worst-case-gate serving default)
    or ``"int8"`` (int8 weight-only store + fp32 scales). Returns a dict
    with Mpix/s for both paths and the PSNR between their uint8
    reconstructions (how much fidelity the fast path gives up relative
    to the parity path - on a trained model this must stay high enough
    to keep the reference-parity budget intact).
    Learned-bin-width architecture.
    """
    from autoencoder_based_image_compression_tpu.engine import quantized as engine

    images = jnp.asarray(images_uint8.astype(numpy.float32))
    bin_widths = jnp.asarray(bin_widths)
    nb_pixels = images.shape[0] * images.shape[1] * images.shape[2]

    def parity_path(params, images, bin_widths):
        y = conv_eae.encode(params, images, True)
        quantized = quantize_per_map(y, bin_widths)
        return conv_eae.decode(params, quantized, True)

    (enc_tail, dec_tail) = ((engine.BF16WPLUS_ENC_TAIL,
                             engine.BF16WPLUS_DEC_TAIL)
                            if weight_mode == "bf16w+" else (0, 0))
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    if weight_mode == "int8":
        qparams = engine.quantize_params_int8(params)
        qfolded = engine.quantize_params_int8(folded)
    else:
        qparams = engine.bf16_weight_params(params, fp32_enc_tail=enc_tail)
        qfolded = engine.bf16_weight_params(folded, fp32_tail=dec_tail)

    def fast_path(qparams, qfolded, images, bin_widths):
        y = engine.fast_encode(qparams, images, learn_bin_widths=True,
                               fp32_enc_tail=enc_tail)
        symbols = jnp.round(y / bin_widths)
        return engine.fast_decode(qfolded, symbols, fp32_tail=dec_tail)

    seconds_parity = time_with_checksum(parity_path, params, images, bin_widths,
                                        repeats=repeats, nb_in_flight=nb_in_flight)
    seconds_fast = time_with_checksum(fast_path, qparams, qfolded, images,
                                      bin_widths, repeats=repeats,
                                      nb_in_flight=nb_in_flight)

    rec_parity = cast_bt601(numpy.asarray(
        jax.jit(parity_path)(params, images, bin_widths)))
    rec_fast = cast_bt601(numpy.asarray(
        jax.jit(fast_path)(qparams, qfolded, images, bin_widths)))
    if numpy.array_equal(rec_parity, rec_fast):
        psnr_between = float("inf")
    else:
        psnr_between = numpy.mean([
            psnr_2d(rec_parity[i, :, :, 0], rec_fast[i, :, :, 0])
            for i in range(rec_parity.shape[0])])
    return {
        "mpix_per_s_parity": nb_pixels / seconds_parity / 1e6,
        "mpix_per_s_fast": nb_pixels / seconds_fast / 1e6,
        "psnr_fast_vs_parity_db": psnr_between,
        "weight_mode": weight_mode,
    }


def scaling_report(params, bin_widths, image_shape, per_device_batch,
                   model_parallelism=1, repeats=3):
    """Times the sharded roundtrip on 1..N-device data-parallel meshes.

    On real multi-chip hardware this yields the scaling-efficiency
    numbers of BASELINE.md; on the virtual CPU platform it validates
    the sharded path functionally (wall-clock on virtual devices is
    not a scaling signal).
    """
    from autoencoder_based_image_compression_tpu.parallel.inference import (
        make_codec_fns)
    from autoencoder_based_image_compression_tpu.parallel.mesh import make_mesh

    nb_devices = len(jax.devices())
    results = {}
    n = 1
    while n <= nb_devices:
        mesh = make_mesh(model_parallelism, devices=jax.devices()[:n])
        (encode_fn, decode_fn, put) = make_codec_fns(True, mesh)
        batch = put(jnp.zeros((per_device_batch * (n // model_parallelism),)
                              + tuple(image_shape) + (1,), jnp.float32))
        bw = jnp.asarray(bin_widths)

        def roundtrip(params, batch, bw):
            return decode_fn(params, encode_fn(params, batch), bw)

        seconds = time_with_checksum(roundtrip, params, batch, bw, repeats=repeats)
        nb_pixels = batch.shape[0] * batch.shape[1] * batch.shape[2]
        results[n] = nb_pixels / seconds / 1e6
        n *= 2
    base = results.get(1)
    return {
        "mpix_per_s": results,
        "efficiency": {n: (v / (n * base)) if base else None
                       for (n, v) in results.items()},
    }


def profile_roundtrip(params, images_uint8, bin_widths, trace_dir):
    """Captures a ``jax.profiler`` trace of one parity-path roundtrip.

    The per-kernel timeline (open with TensorBoard / xprof) is the
    roofline-check entry point the north star requires.
    """
    images = jnp.asarray(images_uint8.astype(numpy.float32))
    bw = jnp.asarray(bin_widths)

    @jax.jit
    def roundtrip(params, images, bw):
        y = conv_eae.encode(params, images, True)
        return jnp.sum(conv_eae.decode(params, quantize_per_map(y, bw), True))

    numpy.asarray(roundtrip(params, images, bw))  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        numpy.asarray(roundtrip(params, images, bw))
    return trace_dir
