"""Epoch driver and batched inference helpers.

Re-design of the reference batch drivers (``kodak_tensorflow/eae/batching.py``):
uint8 images are fed as raw float32 in [0, 255] (no normalization -
``batching.py:48-53``), fixed-size mini-batches with a divisibility
requirement, density pre-fit epochs before the first joint epoch, and
the per-batch alternation density-update-THEN-eae-update
(``batching.py:154-163``).

Unlike the reference (one host->device ``feed_dict`` copy per
``sess.run``), batches are transferred once and every update is a
single jitted call.
"""

import functools

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops.quantization import cast_bt601
from autoencoder_based_image_compression_tpu.utils.image import subdivide_set


def encode_mini_batches(luminances_uint8, params, learn_bin_widths, batch_size):
    """Latents of a stack of luminance images, one mini-batch at a time.

    Reference ``eae/batching.py:56-100``. Returns float32 numpy
    ``(N, H/16, W/16, 128)``.
    """
    if luminances_uint8.dtype != numpy.uint8:
        raise TypeError("`luminances_uint8.dtype` is not equal to `numpy.uint8`.")
    nb_batches = subdivide_set(luminances_uint8.shape[0], batch_size)
    encode_jit = jax.jit(functools.partial(conv_eae.encode,
                                           learn_bin_widths=learn_bin_widths))
    chunks = []
    for i in range(nb_batches):
        batch = luminances_uint8[i * batch_size:(i + 1) * batch_size].astype(numpy.float32)
        chunks.append(numpy.asarray(encode_jit(params, jnp.asarray(batch))))
    return numpy.concatenate(chunks, axis=0)


def decode_mini_batches(quantized_y_float32, params, learn_bin_widths, batch_size):
    """uint8 reconstructions from quantized latents, one batch at a time.

    Reference ``eae/batching.py:11-54``: the decoder output is clipped
    to the BT.601 range and cast to uint8.
    """
    nb_batches = subdivide_set(quantized_y_float32.shape[0], batch_size)

    def _decode_cast(params, batch):
        # BT.601 cast on device: fetching uint8 is a quarter of the
        # fp32 bytes (and bit-identical to the host-side cast).
        return cast_bt601(conv_eae.decode(params, batch, learn_bin_widths))

    decode_jit = jax.jit(_decode_cast)
    chunks = []
    for i in range(nb_batches):
        batch = jnp.asarray(quantized_y_float32[i * batch_size:(i + 1) * batch_size])
        chunks.append(numpy.asarray(decode_jit(params, batch)))
    return numpy.concatenate(chunks, axis=0)


def device_resident_dataset(training_uint8):
    """Uploads the uint8 training stack to HBM once.

    The training loops gather mini-batch rows ON DEVICE from this array
    (uint8, cast to float32 inside the jitted step), so the per-step
    host->device traffic is a handful of row indices instead of a
    float32 image batch - the reference pays a full float32 ``feed_dict``
    copy per ``sess.run`` (``eae/batching.py:48-53``), 4x the bytes of
    the images, every step.
    """
    return jax.device_put(jnp.asarray(training_uint8))


def _batch_rows(dataset, rows):
    """Mini-batch gather: on-device when ``dataset`` lives on device."""
    return jnp.take(dataset, jnp.asarray(rows), axis=0)


def preliminary_fitting(training_uint8, state, step_fns, batch_size, nb_epochs_fitting,
                        key):
    """Density pre-fit epochs before the first joint training epoch.

    Reference ``eae/batching.py:102-127``. ``training_uint8`` may be a
    numpy stack or a :func:`device_resident_dataset` array.
    """
    nb_batches = subdivide_set(training_uint8.shape[0], batch_size)
    dataset = jnp.asarray(training_uint8)
    for _ in range(nb_epochs_fitting):
        for j in range(nb_batches):
            (key, subkey) = jax.random.split(key)
            batch = jax.lax.slice_in_dim(dataset, j * batch_size,
                                         (j + 1) * batch_size, axis=0)
            state = step_fns["training_fct"](state, batch, subkey)
    return state


def run_epoch_training(training_uint8, state, step_fns, batch_size, nb_batches, key,
                       permutation=None):
    """One training epoch: shuffle, then the fused alternation per batch.

    Reference ``eae/batching.py:129-165``; the density update runs
    before the autoencoder update inside ``train_step``.
    ``training_uint8`` may be a numpy stack or a
    :func:`device_resident_dataset` array (zero per-step image upload).
    """
    if permutation is None:
        permutation = numpy.random.permutation(training_uint8.shape[0])
    dataset = jnp.asarray(training_uint8)
    if "train_epoch" in step_fns:
        rows = numpy.asarray(permutation[:nb_batches * batch_size],
                             dtype=numpy.int32).reshape(nb_batches, batch_size)
        return step_fns["train_epoch"](state, dataset, jnp.asarray(rows), key)
    for i in range(nb_batches):
        (key, subkey) = jax.random.split(key)
        rows = permutation[i * batch_size:(i + 1) * batch_size]
        state = step_fns["train_step"](state, _batch_rows(dataset, rows), subkey)
    return state


def evaluate(state, batch_uint8, step_fns, gamma_scaling, key):
    """The reference's four training indicators on one batch.

    Returns ``(mean_discrete_entropy, scaled_approx_entropy, rec_error,
    loss_density_approx)`` (reference ``EntropyAutoencoder.py:542-589``).
    """
    full = evaluate_full(state, batch_uint8, step_fns, gamma_scaling, key)
    return (full["mean_disc_entropy"], full["scaled_approx_entropy"],
            full["rec_error"], full["loss_density"])


def evaluate_full(state, batch_uint8, step_fns, gamma_scaling, key):
    """The reference's complete per-epoch indicator set on one batch.

    Reference ``training_eae_imagenet.py:121-201`` prints, per epoch and
    per train/val portion: mean approximate entropy, mean discrete
    entropy, their gap (the approximation-quality monitor), scaled
    cumulated approximate entropy, reconstruction error, density-fit
    loss; plus the shared weight decay, grid size, LR and global step
    (attached by the CLI). This returns one portion's dict, augmented
    with the diagnostics the monitors need: the UNCLAMPED per-map
    approximate entropies (negativity check - the reference asserts,
    ``tfutils.py:89-93``), the areas under the live pdfs
    (``checking_area_under...``), and the dead-map count on the
    quantized latents.
    """
    from autoencoder_based_image_compression_tpu import constants as csts
    from autoencoder_based_image_compression_tpu.ops.metrics import (
        average_entropies,
        convert_approx_entropy,
    )
    from autoencoder_based_image_compression_tpu.ops.quantization import (
        quantize_per_map)

    # uint8 (possibly device-resident) batches go up as-is; the jitted
    # evaluation casts to float32 on device.
    batch = jnp.asarray(batch_uint8)
    (scaled_approx_entropy, rec_error, loss_density, y, approx_per_map, areas,
     weight_decay) = step_fns["evaluation"](state, batch, key)
    bin_widths = numpy.asarray(state.bin_widths)
    y_host = numpy.asarray(y)
    mean_disc_entropy = average_entropies(y_host, bin_widths)
    scaled_approx_entropy = float(scaled_approx_entropy)
    mean_approx_entropy = convert_approx_entropy(scaled_approx_entropy,
                                                 gamma_scaling, csts.NB_MAPS_3)
    quantized = numpy.asarray(quantize_per_map(y_host, bin_widths))
    return {
        "mean_approx_entropy": mean_approx_entropy,
        "mean_disc_entropy": mean_disc_entropy,
        "entropy_gap": mean_disc_entropy - mean_approx_entropy,
        "scaled_approx_entropy": scaled_approx_entropy,
        "rec_error": float(rec_error),
        "loss_density": float(loss_density),
        "weight_decay": float(weight_decay),
        "approx_entropy_per_map": numpy.asarray(approx_per_map),
        "areas_under_pdfs": numpy.asarray(areas),
        # A map is dead when it quantizes to zero across the whole
        # evaluation portion (reference count_nb_deads is per-example;
        # the training monitor wants the across-portion count).
        "nb_dead_maps": int(numpy.count_nonzero(
            numpy.sum(numpy.abs(quantized), axis=(0, 1, 2)) == 0.0)),
    }
