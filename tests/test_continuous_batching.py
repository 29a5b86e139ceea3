"""Continuous-batching engine tests + spatial sharding validation."""

import jax
import jax.numpy as jnp
import numpy
import pytest

from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.parallel.continuous_batching import (
    ContinuousBatcher,
    stream_roundtrip,
)


def test_batcher_packs_and_pads():
    calls = []

    def batch_fn(batch):
        calls.append(numpy.asarray(batch).copy())
        return batch * 2.0

    batcher = ContinuousBatcher(batch_fn, batch_size=4)
    for i in range(10):  # 2 full batches + 1 partial of 2
        batcher.submit(i, numpy.full((3, 3), float(i), numpy.float32))
    results = batcher.flush()
    assert len(calls) == 3
    assert all(c.shape == (4, 3, 3) for c in calls)
    assert sorted(results) == list(range(10))
    for i in range(10):
        numpy.testing.assert_allclose(results[i], 2.0 * i)


def test_batcher_completion_callback():
    """With on_complete set, every image is delivered exactly once via
    the callback and flush returns nothing."""
    delivered = {}

    def batch_fn(batch):
        return batch + 1.0

    batcher = ContinuousBatcher(
        batch_fn, batch_size=4, max_in_flight=1,
        on_complete=lambda image_id, out: delivered.setdefault(image_id, out))
    for i in range(9):  # 2 full batches + 1 partial of 1
        batcher.submit(i, numpy.full((2, 2), float(i), numpy.float32))
    results = batcher.flush()
    assert results == {}
    assert sorted(delivered) == list(range(9))
    for i in range(9):
        numpy.testing.assert_allclose(delivered[i], i + 1.0)


def test_batcher_concurrent_producers():
    """Multiple submit threads: every image delivered exactly once."""
    import threading

    def batch_fn(batch):
        return batch * 3.0

    batcher = ContinuousBatcher(batch_fn, batch_size=4, max_in_flight=2)

    def producer(base):
        for i in range(base, base + 25):
            batcher.submit(i, numpy.full((2,), float(i), numpy.float32))

    threads = [threading.Thread(target=producer, args=(k * 25,))
               for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    results = batcher.flush()
    assert sorted(results) == list(range(100))
    for i in range(100):
        numpy.testing.assert_allclose(results[i], 3.0 * i)


def test_batcher_bounds_in_flight():
    def batch_fn(batch):
        return batch + 1.0

    batcher = ContinuousBatcher(batch_fn, batch_size=2, max_in_flight=1)
    for i in range(8):
        batcher.submit(i, numpy.zeros((2, 2), numpy.float32))
        assert len(batcher._in_flight) <= 1
    results = batcher.flush()
    assert len(results) == 8


def test_stream_roundtrip_matches_batched():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    rng = numpy.random.default_rng(1)
    images = rng.integers(0, 256, size=(6, 32, 32, 1)).astype(numpy.uint8)
    bin_widths = numpy.ones(128, numpy.float32)
    streamed = stream_roundtrip(params, bin_widths, images, batch_size=4)
    assert streamed.shape == (6, 32, 32, 1)
    # Against the plain batched path.
    from autoencoder_based_image_compression_tpu.parallel.inference import (
        roundtrip_batched)

    batched = roundtrip_batched(params, images[:4], bin_widths, True, batch_size=4)
    numpy.testing.assert_allclose(streamed[:4], batched, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_spatially_sharded_conv_matches_unsharded():
    """Height-sharded inference: GSPMD must insert the halo exchanges
    for the strided convs; results must match the unsharded path."""
    from autoencoder_based_image_compression_tpu.parallel.inference import (
        roundtrip_batched)
    from autoencoder_based_image_compression_tpu.parallel.mesh import make_mesh

    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(2), True)
    rng = numpy.random.default_rng(3)
    images = rng.integers(0, 256, size=(4, 64, 64, 1)).astype(numpy.uint8)
    bin_widths = numpy.ones(128, numpy.float32)
    plain = roundtrip_batched(params, images, bin_widths, True, batch_size=4)
    mesh = make_mesh(model_parallelism=2)  # (data=4, model=2); H over model
    sharded = roundtrip_batched(params, images, bin_widths, True, batch_size=4,
                                mesh=mesh, spatial=True)
    numpy.testing.assert_allclose(plain, sharded, rtol=1e-4, atol=1e-4)
