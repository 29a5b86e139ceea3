"""Sharded training step over a (data, model) mesh.

The single-chip step functions of ``train/step.py`` are pure, so the
multi-chip version is the same computation with sharding annotations:
batches shard over ``data`` (gradients all-reduce via XLA-inserted
psums), the density table and bin widths shard per latent map over
``model``. No reference counterpart exists (SURVEY.md section 2.4 -
the reference is strictly single-device).
"""

import jax

from autoencoder_based_image_compression_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    state_shardings,
)
from autoencoder_based_image_compression_tpu.train import step as step_mod
from autoencoder_based_image_compression_tpu.train.state import make_adam


def make_sharded_step_fns(gamma_scaling, learn_bin_widths, mesh, state_template,
                          ppi=None, max_itvs=None):
    """Jitted train/eval functions with mesh shardings baked in.

    ``state_template`` supplies the pytree structure for the state
    shardings (an abstract or concrete :class:`TrainState`).
    """
    import autoencoder_based_image_compression_tpu.constants as csts

    ppi = csts.NB_POINTS_PER_INTERVAL if ppi is None else ppi
    max_itvs = csts.MAX_ITVS_PER_SIDE if max_itvs is None else max_itvs
    adam = make_adam(gamma_scaling)
    static = dict(learn_bin_widths=learn_bin_widths, ppi=ppi, max_itvs=max_itvs)

    st_shardings = state_shardings(mesh, state_template)
    bt_sharding = batch_sharding(mesh)
    rep = replicated(mesh)

    def _full_step(state, batch, key):
        (key_fct, key_eae) = jax.random.split(key)
        state = step_mod._density_phase(state, batch, key_fct, **static)
        state = step_mod._eae_bw_phase(state, batch, key_eae, adam, gamma_scaling,
                                       **static)
        return state

    # No buffer donation: experimental PJRT platforms can stall when
    # compiling donated programs (see train/step.py).
    train_step = jax.jit(
        _full_step,
        in_shardings=(st_shardings, bt_sharding, rep),
        out_shardings=st_shardings,
    )

    def _evaluation(state, batch, key):
        import jax.numpy as jnp

        from autoencoder_based_image_compression_tpu.models import conv_eae
        from autoencoder_based_image_compression_tpu.ops import density as dens

        (y, y_tilde) = step_mod._noisy_latents(
            state.params, batch, state.bin_widths, key, learn_bin_widths)
        samples = step_mod._flatten_maps(y_tilde)
        prob = dens.approximate_probability(samples, state.density.parameters,
                                            ppi, max_itvs)
        scaled_ae = gamma_scaling * dens.approximate_entropy(prob, state.bin_widths)
        reconstruction = conv_eae.decode(state.params, y_tilde, learn_bin_widths)
        rec_error = jnp.mean(jnp.sum(jnp.square(batch - reconstruction), axis=(1, 2, 3)))
        return (scaled_ae, rec_error, y)

    evaluation = jax.jit(
        _evaluation,
        in_shardings=(st_shardings, bt_sharding, rep),
        out_shardings=(rep, rep, bt_sharding),
    )

    return {"train_step": train_step, "evaluation": evaluation,
            "state_shardings": st_shardings, "batch_sharding": bt_sharding}


def shard_state(state, mesh):
    """Places a host-built state onto the mesh with its shardings."""
    return jax.device_put(state, state_shardings(mesh, state))
