"""Variational autoencoder (the SVHN conceptual ancestor of the EAE).

Functional re-design of ``svhn/vae/VariationalAutoencoder.py``: a
Gaussian-posterior VAE (ReLU recognition/generation hiddens,
reparametrization trick) trained by minimizing the opposite of Kingma's
VLB approximation ``alpha*KL + rec_error`` (``svhn/tools/tools.py:945-982``,
KL at ``:653-674``). Included for capability parity: the reference
presents it as the model obtained by replacing the EAE's entropy term
with a KL and the noise with sampling. Defaults from
``training_vae_svhn.py:29-34``: 300 hidden, 25 latents.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

LR_VAE = 2.0e-5
MOMENTUM_VAE = 0.9


def init_vae_params(key, nb_visible=3072, nb_hidden=300, nb_z=25):
    keys = jax.random.split(key, 5)
    normal = lambda k, shape, std: std * jax.random.normal(k, shape, jnp.float32)
    return {
        "wr_l1": normal(keys[0], (nb_visible, nb_hidden), 0.01),
        "br_l1": jnp.zeros((nb_hidden,), jnp.float32),
        "wr_mean": normal(keys[1], (nb_hidden, nb_z), 0.05),
        "br_mean": jnp.zeros((nb_z,), jnp.float32),
        "wr_log_std_squared": normal(keys[2], (nb_hidden, nb_z), 0.05),
        "br_log_std_squared": jnp.zeros((nb_z,), jnp.float32),
        "wg_l1": normal(keys[3], (nb_z, nb_hidden), 0.05),
        "bg_l1": jnp.zeros((nb_hidden,), jnp.float32),
        "wg_mean": normal(keys[4], (nb_hidden, nb_visible), 0.01),
        "bg_mean": jnp.zeros((nb_visible,), jnp.float32),
    }


def recognition(params, visible_units):
    """Posterior parameters (z_mean, z_log_std_squared)."""
    hidden = jax.nn.relu(visible_units @ params["wr_l1"] + params["br_l1"])
    z_mean = hidden @ params["wr_mean"] + params["br_mean"]
    z_log_std_squared = (hidden @ params["wr_log_std_squared"]
                         + params["br_log_std_squared"])
    return (z_mean, z_log_std_squared)


def generation(params, z, is_continuous=True):
    """Reconstruction mean; sigmoid output for binary visibles."""
    hidden = jax.nn.relu(z @ params["wg_l1"] + params["bg_l1"])
    reconstruction = hidden @ params["wg_mean"] + params["bg_mean"]
    if not is_continuous:
        reconstruction = jax.nn.sigmoid(reconstruction)
    return reconstruction


def forward_pass(params, visible_units, key, is_continuous=True):
    """Reparametrized sample + reconstruction."""
    (z_mean, z_log_std_squared) = recognition(params, visible_units)
    epsilon = jax.random.normal(key, z_mean.shape, z_mean.dtype)
    z = z_mean + jnp.exp(0.5 * z_log_std_squared) * epsilon
    reconstruction = generation(params, z, is_continuous)
    return (z_mean, z_log_std_squared, z, reconstruction)


def kl_divergence(z_mean, z_log_std_squared):
    """KL(q(z|x) || N(0, I)) (reference ``svhn/tools/tools.py:653-674``)."""
    return 0.5 * jnp.mean(jnp.sum(
        -1.0 - z_log_std_squared + jnp.square(z_mean) + jnp.exp(z_log_std_squared),
        axis=1))


def opposite_vlb(params, visible_units, key, alpha, is_continuous=True):
    """alpha*KL + reconstruction error (Gaussian visible model)."""
    (z_mean, z_log_std_squared, _, reconstruction) = forward_pass(
        params, visible_units, key, is_continuous)
    if is_continuous:
        rec_error = 0.5 * jnp.mean(
            jnp.sum(jnp.square(visible_units - reconstruction), axis=1))
    else:
        rec_error = -jnp.mean(jnp.sum(
            visible_units * jnp.log(reconstruction)
            + (1.0 - visible_units) * jnp.log(1.0 - reconstruction), axis=1))
    return alpha * kl_divergence(z_mean, z_log_std_squared) + rec_error


class VaeState(NamedTuple):
    params: Any
    momentum: Any
    step: jnp.ndarray


def init_vae_state(key, nb_visible=3072, nb_hidden=300, nb_z=25):
    params = init_vae_params(key, nb_visible, nb_hidden, nb_z)
    momentum = jax.tree_util.tree_map(jnp.zeros_like, params)
    return VaeState(params=params, momentum=momentum, step=jnp.asarray(0, jnp.int32))


def make_vae_step_fn(alpha, is_continuous=True):
    """SGD+momentum training step on the negative VLB."""

    @jax.jit
    def train_step(state, visible_units, key):
        grads = jax.grad(opposite_vlb)(state.params, visible_units, key, alpha,
                                       is_continuous)
        momentum = jax.tree_util.tree_map(
            lambda m, g: MOMENTUM_VAE * m - LR_VAE * g, state.momentum, grads)
        params = jax.tree_util.tree_map(lambda p, m: p + m, state.params, momentum)
        return state._replace(params=params, momentum=momentum, step=state.step + 1)

    return train_step


def generate(params, key, nb_samples, nb_z=25, is_continuous=True):
    """Samples digits from the prior (reference ``generating_vae_svhn.py``)."""
    z = jax.random.normal(key, (nb_samples, nb_z), jnp.float32)
    return generation(params, z, is_continuous)
