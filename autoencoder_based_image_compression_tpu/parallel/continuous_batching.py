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

    Completed images are delivered through ``on_complete(image_id,
    output)`` as batches drain (called from whichever thread triggers
    the drain - ``submit`` under in-flight back-pressure, or ``flush``);
    without a callback they accumulate and ``flush`` returns them all.

    Device dispatch happens OUTSIDE the queue lock: ``submit`` only
    holds the lock to append / claim a full batch, so concurrent
    producers never serialize behind a device call.

    Parameters
    ----------
    batch_fn : callable
        Jitted ``(images_f32 (B, H, W, C)) -> outputs`` device function.
    batch_size : int
        Static device batch size B.
    max_in_flight : int
        Number of dispatched-but-unfetched batches allowed (bounds
        device memory while keeping the pipeline full).
    on_complete : callable, optional
        ``on_complete(image_id, output_row)`` invoked once per image as
        its batch is fetched. When set, ``flush`` returns ``{}``.
    """

    def __init__(self, batch_fn, batch_size, max_in_flight=2,
                 on_complete=None):
        self.batch_fn = batch_fn
        self.batch_size = batch_size
        self.max_in_flight = max_in_flight
        self.on_complete = on_complete
        self._pending = []          # images waiting to fill a batch
        self._pending_ids = []
        self._in_flight = collections.deque()  # (ids, device_output)
        self._results = {}
        self._queue_lock = threading.Lock()     # guards _pending*
        self._device_lock = threading.Lock()    # guards _in_flight + dispatch order

    def submit(self, image_id, image_f32):
        """Enqueues one image; dispatches when a batch fills."""
        with self._queue_lock:
            self._pending.append(image_f32)
            self._pending_ids.append(image_id)
            if len(self._pending) < self.batch_size:
                return
            batch = numpy.stack(self._pending, axis=0)
            ids = list(self._pending_ids)
            self._pending = []
            self._pending_ids = []
        self._dispatch(batch, ids)

    def _dispatch(self, batch, ids):
        """Dispatches one assembled batch, draining under back-pressure.

        Serialized by ``_device_lock`` so completion order follows
        dispatch order; the queue lock is NOT held here.
        """
        with self._device_lock:
            while len(self._in_flight) >= self.max_in_flight:
                self._drain_one_locked()
            out = self.batch_fn(jnp.asarray(batch))
            self._in_flight.append((ids, out))

    def _drain_one_locked(self):
        (ids, out) = self._in_flight.popleft()
        host = numpy.asarray(out)   # blocks until the batch is done
        for (i, image_id) in enumerate(ids):
            # Rows past len(ids) are flush padding - dropped here.
            if self.on_complete is not None:
                self.on_complete(image_id, host[i])
            else:
                self._results[image_id] = host[i]

    def flush(self):
        """Dispatches the partial batch (padded) and drains everything.

        Returns {image_id: output} for images not already delivered via
        ``on_complete``.
        """
        with self._queue_lock:
            batch = None
            if self._pending:
                nb_real = len(self._pending)
                pad = self.batch_size - nb_real
                template = numpy.zeros_like(self._pending[0])
                self._pending.extend([template] * pad)
                batch = numpy.stack(self._pending, axis=0)
                ids = list(self._pending_ids[:nb_real])
                self._pending = []
                self._pending_ids = []
        if batch is not None:
            self._dispatch(batch, ids)
        with self._device_lock:
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
