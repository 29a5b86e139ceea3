"""Sharded, pipelined inference engine.

The north-star deliverable (BASELINE.json): batched image encode +
quantize + decode on device, images sharded over the ``data`` axis,
optionally the image height sharded over ``model`` (GSPMD inserts the
halo exchanges the strided convs need), and the host-side C++
arithmetic coder overlapped with device compute - JAX dispatch is
asynchronous, so while the coder thread pool chews batch *i* the device
is already running batch *i+1*.

The reference counterpart is the strictly sequential
encode -> quantize -> code -> decode chain of
``reconstructing_eae_kodak.py`` (SURVEY.md section 3.2).
"""

import functools

import jax
import jax.numpy as jnp
import numpy
from jax.sharding import NamedSharding, PartitionSpec as P

from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops.quantization import quantize_per_map


def make_codec_fns(learn_bin_widths, mesh=None, spatial=False):
    """Jitted encode / quantize+decode, optionally mesh-sharded.

    Returns ``(encode_fn, decode_fn, device_put_batch)`` where
    ``encode_fn(params, images_f32) -> latents`` and
    ``decode_fn(params, latents, bin_widths) -> reconstruction`` (the
    quantizer is fused into the decoder dispatch: one device program
    per direction).
    """
    if mesh is not None:
        batch_spec = P("data", "model", None, None) if spatial else P("data", None, None, None)
        batch_sh = NamedSharding(mesh, batch_spec)
        rep = NamedSharding(mesh, P())

        def device_put_batch(batch):
            return jax.device_put(batch, batch_sh)

        encode_fn = jax.jit(
            functools.partial(conv_eae.encode, learn_bin_widths=learn_bin_widths),
            in_shardings=(rep, batch_sh), out_shardings=batch_sh)

        def _decode(params, latents, bin_widths):
            quantized = quantize_per_map(latents, bin_widths)
            return conv_eae.decode(params, quantized, learn_bin_widths)

        decode_fn = jax.jit(_decode, in_shardings=(rep, batch_sh, rep),
                            out_shardings=batch_sh)
    else:
        def device_put_batch(batch):
            return jax.device_put(batch)

        encode_fn = jax.jit(
            functools.partial(conv_eae.encode, learn_bin_widths=learn_bin_widths))

        def _decode(params, latents, bin_widths):
            quantized = quantize_per_map(latents, bin_widths)
            return conv_eae.decode(params, quantized, learn_bin_widths)

        decode_fn = jax.jit(_decode)
    return (encode_fn, decode_fn, device_put_batch)


def roundtrip_batched(params, images_uint8, bin_widths, learn_bin_widths,
                      batch_size, mesh=None, spatial=False):
    """Encode + quantize + decode a uint8 image stack, batch by batch.

    Keeps the device busy: batch *i+1* is dispatched before batch *i*
    is fetched. Returns float32 reconstructions (caller applies
    ``cast_bt601``).
    """
    (encode_fn, decode_fn, put) = make_codec_fns(learn_bin_widths, mesh, spatial)
    bin_widths = jnp.asarray(bin_widths)
    nb = images_uint8.shape[0]
    futures = []
    for i in range(0, nb, batch_size):
        batch = put(jnp.asarray(
            images_uint8[i:i + batch_size].astype(numpy.float32)))
        latents = encode_fn(params, batch)
        futures.append(decode_fn(params, latents, bin_widths))
    return numpy.concatenate([numpy.asarray(f) for f in futures], axis=0)


class PipelinedCompressor:
    """Overlaps device encode/decode with host arithmetic coding.

    Drives the full true-rate pipeline over an image stack: device
    encodes batch i+1 while the C++ coder thread pool compresses the
    latents of batch i (the host/device overlap the reference lacks -
    its coder runs strictly between decode calls,
    ``reconstructing_eae_kodak.py:197-218``).
    """

    def __init__(self, params, bin_widths, learn_bin_widths, binary_probabilities,
                 map_mean, idx_map_exception=-1, mesh=None, batch_size=4,
                 fast_path=None, reconstruct=True, verify=True,
                 max_in_flight=4):
        """``fast_path``: None runs the fp32 parity transforms;
        "bf16w+", "bf16w" or "int8" runs the serving engine's
        low-precision transforms (``engine.quantized``; bf16
        activations, bf16-rounded or int8-stored kernels - "bf16w+"
        additionally runs the decode tail in fp32, the variant that
        meets the worst-case-per-image 0.05 dB gate). Learned-bin-width
        architecture only - the measured fidelity of the variants vs
        fp32 is recorded in BASELINE.md ("bf16w+" is the serving
        default).

        ``reconstruct=False`` is the compress-only serving mode: the
        decode dispatch and the reconstruction fetch are skipped
        entirely, and ``__call__`` returns ``(None, nb_bits_per_image)``.
        On link-constrained hosts this roughly halves the bytes crossing
        the device boundary.

        ``verify=True`` (default) round-trips and asserts every coded
        map bit-exactly (the reference's discipline,
        ``compression.py:151-153``); ``verify=False`` is the serving
        mode that encodes only - same bitstreams and bit counts at
        about half the coder work, justified by the differential test
        against the unmodified reference coder plus the per-batch
        magnitude guard (the verify-decode never fails for in-range
        symbols; it exists to catch coder bugs, which the differential
        and self tests pin down ahead of serving).

        ``max_in_flight`` bounds the dispatched-but-uncoded batches: the
        device runs at most that many batches ahead of the coder, so
        device memory and host symbol buffers stay O(window), not
        O(dataset) - the same discipline as
        ``ContinuousBatcher.max_in_flight``.
        """
        from autoencoder_based_image_compression_tpu.coding.compression import (
            compress_lossless_images)

        self._compress_images = compress_lossless_images
        # "bf16w+" is the worst-case-gate-passing serving default: bf16
        # transforms with the precision-surgical fp32 encoder/decoder
        # tails (engine.BF16WPLUS_ENC_TAIL / BF16WPLUS_DEC_TAIL, the
        # cheapest mix scripts/gate_probe.py measured inside the gate).
        # Plain "bf16w" stays as the all-bf16 variant; "int8" the
        # weight-store one.
        self._fp32_tail = 0
        self._fp32_enc_tail = 0
        self._enc_precision = "highest"
        if fast_path is not None:
            if fast_path not in ("bf16w+", "bf16w", "int8"):
                raise ValueError(
                    f"unknown fast_path {fast_path!r} (use 'bf16w+', "
                    "'bf16w', 'int8' or None).")
            if not learn_bin_widths:
                raise ValueError(
                    "fast_path requires the learned-bin-width architecture.")
            from autoencoder_based_image_compression_tpu.engine import (
                quantized as engine)

            if fast_path == "int8":
                params = engine.quantize_params_int8(params)
            else:
                if fast_path == "bf16w+":
                    self._fp32_tail = engine.BF16WPLUS_DEC_TAIL
                    self._fp32_enc_tail = engine.BF16WPLUS_ENC_TAIL
                    self._enc_precision = engine.BF16WPLUS_ENC_PRECISION
                params = engine.bf16_weight_params(
                    params, fp32_tail=self._fp32_tail,
                    fp32_enc_tail=self._fp32_enc_tail)
            self._engine = engine
        self.fast_path = fast_path
        self.params = params
        self.bin_widths = jnp.asarray(bin_widths, jnp.float32)
        self.learn_bin_widths = learn_bin_widths
        self.binary_probabilities = (
            numpy.load(binary_probabilities)
            if isinstance(binary_probabilities, str) else binary_probabilities)
        self.map_mean = jnp.asarray(map_mean, jnp.float32)
        self.idx_map_exception = idx_map_exception
        self.batch_size = batch_size
        self.reconstruct = reconstruct
        self.verify = verify
        if max_in_flight < 1:
            raise ValueError("`max_in_flight` must be >= 1.")
        self.max_in_flight = max_in_flight
        # Deepest window observed during the last __call__ (bounded-
        # memory invariant check; exercised by tests/test_pipeline_e2e).
        self.peak_in_flight = 0
        # Phase breakdown (wall/coder/fetch_wait seconds) of the last
        # __call__ - see the timing block there.
        self.last_timing = None
        (_, _, self.put) = make_codec_fns(learn_bin_widths, mesh)

        def _encode_symbols(params, batch_uint8, bin_widths, map_mean):
            # The uint8->float cast runs on device (uploading uint8 is a
            # quarter of the fp32 bytes), centering by the extra-set map
            # means and quantization run on device too. The host link is
            # the scarce resource in serving, so the symbols come back
            # in two widths: an int8 image (half the int16 bytes) used
            # whenever the batch's max magnitude fits int8 - the usual
            # case at practical operating points - and the int16 image
            # (the coder's native dtype) fetched only on overflow. The
            # fp32 magnitude check mirrors cast_float_to_int16's guard.
            batch = batch_uint8.astype(jnp.float32)
            if fast_path is not None:
                y = self._engine.fast_encode(
                    params, batch, learn_bin_widths=True,
                    fp32_enc_tail=self._fp32_enc_tail,
                    enc_precision=self._enc_precision)
            else:
                y = conv_eae.encode(params, batch, learn_bin_widths)
            sym = jnp.round((y - map_mean) / bin_widths)
            sym16 = sym.astype(jnp.int16)
            return (sym16, sym16.astype(jnp.int8), jnp.max(jnp.abs(sym)))

        def _decode_symbols(params, symbols, bin_widths, map_mean):
            quantized = symbols.astype(jnp.float32) * bin_widths + map_mean
            if fast_path is not None:
                # fast_decode with UNFOLDED params consumes the
                # dequantized mean-restored latents directly (the fold
                # cannot absorb the +map_mean shift).
                reconstruction = self._engine.fast_decode(
                    params, quantized, fp32_tail=self._fp32_tail)
            else:
                reconstruction = conv_eae.decode(params, quantized,
                                                 learn_bin_widths)
            # BT.601 clip/round/uint8 on device: the codec's output
            # domain anyway (reference eae/batching.py:11-54), and a
            # quarter of the fp32 fetch bytes.
            from autoencoder_based_image_compression_tpu.ops.quantization import (
                cast_bt601)

            return cast_bt601(reconstruction)

        self.encode_symbols_fn = jax.jit(_encode_symbols)
        self.decode_symbols_fn = jax.jit(_decode_symbols)

    def _dispatch(self, images_uint8, start):
        """Sends one batch's encode (+ optional decode) to the device
        and starts the narrow async fetches."""
        batch = self.put(jnp.asarray(
            images_uint8[start:start + self.batch_size]))
        (symbols16, symbols8, batch_max) = self.encode_symbols_fn(
            self.params, batch, self.bin_widths, self.map_mean)
        reconstruction = None
        if self.reconstruct:
            reconstruction = self.decode_symbols_fn(
                self.params, symbols16, self.bin_widths, self.map_mean)
            reconstruction.copy_to_host_async()
        symbols8.copy_to_host_async()
        batch_max.copy_to_host_async()
        return (start, symbols16, symbols8, batch_max, reconstruction)

    def __call__(self, images_uint8):
        """Returns (reconstructions_uint8, nb_bits_per_image).

        Latent centering by the extra-set map means before quantization
        and the re-add before decode follow
        ``reconstructing_eae_kodak.py:170-213``; here both run inside
        the device dispatches, and the decoder consumes the
        device-resident symbols (no host re-upload). Reconstructions
        come back BT.601-cast uint8 (the codec's output domain).

        Pipeline shape: a sliding window of ``max_in_flight`` dispatched
        batches runs ahead of the coder. While the C++ pool codes batch
        i's (images x maps) rows in ONE call (ctypes releases the GIL),
        the device computes batches i+1..i+window and their narrow
        fetches stream over the link. In-flight device buffers and host
        symbol images are bounded by the window, not the dataset.
        """
        import collections
        import time

        nb = images_uint8.shape[0]
        starts = list(range(0, nb, self.batch_size))
        bits_per_start = {}
        recs_per_start = {}
        inflight = collections.deque()
        self.peak_in_flight = 0
        # Phase breakdown of the last call (seconds): where the wall
        # time went - the C++ coder vs waiting on device results /
        # link transfers. Diagnoses whether a serving number is
        # coder-bound or link-bound without a profiler attached.
        timing = {"wall": 0.0, "coder": 0.0, "fetch_wait": 0.0}
        t_call = time.perf_counter()
        next_idx = 0
        while next_idx < len(starts) or inflight:
            while (next_idx < len(starts)
                   and len(inflight) < self.max_in_flight):
                inflight.append(self._dispatch(images_uint8, starts[next_idx]))
                next_idx += 1
                self.peak_in_flight = max(self.peak_in_flight, len(inflight))
            (start, symbols16, symbols8, batch_max, reconstruction) = (
                inflight.popleft())
            # Guard before coding this batch: the device-side int16
            # cast wraps rather than saturating, and wrapped symbols
            # would round-trip "bit-exactly" through the coder. Same
            # bound as the reference's cast_float_to_int16
            # (tools.py:95-155: abs > 32767 raises).
            t0 = time.perf_counter()
            max_abs = float(batch_max)
            if max_abs <= 32767.0 and max_abs <= 127.0:
                # int8 is exact here; widen on host for the coder.
                symbols_host = numpy.asarray(symbols8).astype(numpy.int16)
            else:
                symbols_host = numpy.asarray(symbols16)
            timing["fetch_wait"] += time.perf_counter() - t0
            if max_abs > 32767.0:
                raise OverflowError(
                    "A symbol magnitude exceeds the int16 range.")
            # Drop the device buffers as soon as the host copy is
            # chosen - the wide int16 image in particular must not
            # accumulate across the window.
            del symbols16, symbols8
            t0 = time.perf_counter()
            bits_per_start[start] = self._compress_images(
                symbols_host, self.binary_probabilities,
                self.idx_map_exception, verify=self.verify)
            timing["coder"] += time.perf_counter() - t0
            if reconstruction is not None:
                t0 = time.perf_counter()
                recs_per_start[start] = numpy.asarray(reconstruction)
                timing["fetch_wait"] += time.perf_counter() - t0
        timing["wall"] = time.perf_counter() - t_call
        self.last_timing = timing
        bits = numpy.concatenate([bits_per_start[s] for s in starts])
        if not self.reconstruct:
            return (None, bits)
        recs = numpy.concatenate([recs_per_start[s] for s in starts], axis=0)
        return (recs, bits)
