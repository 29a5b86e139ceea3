"""Training-state pytree of the entropy autoencoder.

Gathers everything the reference scatters across ~25 TF variables and a
separately-pickled grid length (``eae/graph/EntropyAutoencoder.py:104-230``,
``:465-482``): model parameters, the density table (with its live
extent as a traced scalar - no graph-shape-affecting state left),
learned bin widths, the Adam state and the global step. The whole state
is one pytree, so a training step is one pure function
``(state, batch, key) -> state`` under ``jit``.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.models.conv_eae import init_conv_eae_params
from autoencoder_based_image_compression_tpu.ops.density import DensityTable, init_density_table


class TrainState(NamedTuple):
    """Full training state (a pytree; all leaves live on device)."""

    params: Any                 # conv/GDN parameter dict (the "eae" parameters)
    density: DensityTable       # piecewise-linear pdf table + live extent
    bin_widths: jnp.ndarray     # (nb_maps,) quantization bin widths
    opt_eae: Any                # optax Adam state for `params`
    step: jnp.ndarray           # int32 global step (counts eae updates)


def make_adam(gamma_scaling):
    """Adam with the reference's piecewise-constant LR schedule.

    LR starts at ``LR_EAE`` and decays x0.1 twice at gamma-keyed
    boundaries (``EntropyAutoencoder.py:235-243``).
    """
    (b0, b1) = csts.lr_boundaries(gamma_scaling)
    schedule = optax.piecewise_constant_schedule(
        init_value=csts.LR_EAE,
        boundaries_and_scales={b0: 0.1, b1: 0.1},
    )
    return optax.adam(learning_rate=schedule)


def current_lr(gamma_scaling, step):
    """Adam learning rate at a global step (for the epoch printout).

    Mirrors the schedule in :func:`make_adam`; the reference prints it
    each epoch (``training_eae_imagenet.py:199-200``).
    """
    (b0, b1) = csts.lr_boundaries(gamma_scaling)
    lr = csts.LR_EAE
    if step >= b0:
        lr *= 0.1
    if step >= b1:
        lr *= 0.1
    return lr


def init_train_state(key, gamma_scaling, bin_width_init=1.0, learn_bin_widths=False,
                     nb_maps=csts.NB_MAPS_3, ppi=csts.NB_POINTS_PER_INTERVAL,
                     max_itvs=csts.MAX_ITVS_PER_SIDE,
                     nb_itvs_init=csts.NB_ITVS_PER_SIDE_INIT):
    """Fresh training state (the reference's variable initializers)."""
    params = init_conv_eae_params(key, learn_bin_widths)
    density = init_density_table(nb_maps, ppi, max_itvs, nb_itvs_init)
    bin_widths = bin_width_init * jnp.ones((nb_maps,), jnp.float32)
    opt_eae = make_adam(gamma_scaling).init(params)
    return TrainState(
        params=params,
        density=density,
        bin_widths=bin_widths,
        opt_eae=opt_eae,
        step=jnp.asarray(0, jnp.int32),
    )
