"""Continuous batching of images through the codec.

North-star item (BASELINE.json): images arrive as a stream; the engine
packs them into fixed-shape device batches (XLA needs static shapes),
pads the final partial batch, keeps several batches in flight (JAX
dispatch is asynchronous), and hands each finished image to a completion
callback - under which the caller typically runs the host-side
arithmetic coder, overlapping coding with device compute.

No reference counterpart: the reference processes fixed whole datasets
(``eae/batching.py``) strictly synchronously.
"""

import collections
import threading

import jax
import jax.numpy as jnp
import numpy


class ContinuousBatcher:
    """Streams images through a jitted batch function.

    Parameters
    ----------
    batch_fn : callable
        Jitted ``(images_f32 (B, H, W, C)) -> outputs`` device function.
    batch_size : int
        Static device batch size B.
    max_in_flight : int
        Number of dispatched-but-unfetched batches allowed (bounds
        device memory while keeping the pipeline full).
    """

    def __init__(self, batch_fn, batch_size, max_in_flight=2):
        self.batch_fn = batch_fn
        self.batch_size = batch_size
        self.max_in_flight = max_in_flight
        self._pending = []          # images waiting to fill a batch
        self._pending_ids = []
        self._in_flight = collections.deque()  # (ids, device_output)
        self._results = {}
        self._lock = threading.Lock()

    def submit(self, image_id, image_f32):
        """Enqueues one image; dispatches when a batch fills."""
        with self._lock:
            self._pending.append(image_f32)
            self._pending_ids.append(image_id)
            if len(self._pending) == self.batch_size:
                self._dispatch_locked(padded=0)

    def _dispatch_locked(self, padded):
        batch = numpy.stack(self._pending, axis=0)
        ids = list(self._pending_ids)
        self._pending = []
        self._pending_ids = []
        while len(self._in_flight) >= self.max_in_flight:
            self._drain_one_locked()
        out = self.batch_fn(jnp.asarray(batch))
        self._in_flight.append((ids, out, padded))

    def _drain_one_locked(self):
        (ids, out, padded) = self._in_flight.popleft()
        host = numpy.asarray(out)
        nb_real = len(ids)
        for (i, image_id) in enumerate(ids):
            self._results[image_id] = host[i]
        del padded, nb_real

    def flush(self):
        """Dispatches the partial batch (padded) and drains everything.

        Returns {image_id: output} for all submitted images.
        """
        with self._lock:
            if self._pending:
                nb_real = len(self._pending)
                pad = self.batch_size - nb_real
                template = numpy.zeros_like(self._pending[0])
                self._pending.extend([template] * pad)
                # Padded rows get ids that are dropped on drain.
                self._pending_ids = self._pending_ids[:nb_real]
                batch = numpy.stack(self._pending, axis=0)
                ids = list(self._pending_ids)
                self._pending = []
                self._pending_ids = []
                out = self.batch_fn(jnp.asarray(batch))
                self._in_flight.append((ids, out, pad))
            while self._in_flight:
                self._drain_one_locked()
            results = dict(self._results)
            self._results.clear()
            return results


def stream_roundtrip(params, bin_widths, images_uint8, batch_size,
                     learn_bin_widths=True, mesh=None, max_in_flight=2):
    """Convenience: streams a uint8 stack through encode+quantize+decode.

    Returns reconstructions in submission order.
    """
    from autoencoder_based_image_compression_tpu.parallel.inference import (
        make_codec_fns)

    (encode_fn, decode_fn, put) = make_codec_fns(learn_bin_widths, mesh)
    bw = jnp.asarray(bin_widths)

    def batch_fn(batch):
        latents = encode_fn(params, put(batch))
        return decode_fn(params, latents, bw)

    batcher = ContinuousBatcher(batch_fn, batch_size, max_in_flight)
    for (i, image) in enumerate(images_uint8):
        batcher.submit(i, image.astype(numpy.float32))
    results = batcher.flush()
    return numpy.stack([results[i] for i in range(len(images_uint8))], axis=0)
