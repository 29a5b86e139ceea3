"""Dense entropy autoencoder (the SVHN pedagogical model).

Functional re-design of ``svhn/eae/EntropyAutoencoder.py``: a
fully-connected EAE (3072 visible -> 300 hidden leaky-ReLU -> 200
latents; mirrored decoder, ``:218-278``) with a *single* scalar
piecewise-linear density shared by all latents and a scalar learned bin
width (vs per-channel on the Kodak side). The reference hand-derives
every gradient - including the entropy gradient injected at the latent
layer (``:975-980``) and the closed-form bin-width gradient (``:1018``)
- because it has no autodiff; here ``jax.grad`` of the same objective
produces those gradients (noise is parameterized as ``bw * eps`` with
``eps`` fixed, so d/d(bw) recovers the reference's closed form).

Defaults from ``EntropyAutoencoder.__init__`` (``:54-56``): 4 points
per interval, 10 intervals per side, lr_eae 4e-5 with momentum 0.9,
lr_fct 0.2, lr_bw 1e-5 with floor 0.1, weight decay 5e-4.
"""

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from autoencoder_based_image_compression_tpu.ops import density as dens

# SVHN-side hyperparameter defaults.
PPI = 4
NB_ITVS_INIT = 10
MAX_ITVS = 64
LR_EAE = 4.0e-5
MOMENTUM_EAE = 0.9
LR_FCT = 0.2
LR_BW = 1.0e-5
MIN_BW = 0.1
WEIGHT_DECAY_P = 5.0e-4


def leaky_relu(x):
    """Leaky ReLU with slope 0.1 (reference ``svhn/tools/tools.py:676``)."""
    return jnp.where(x < 0.0, 0.1 * x, x)


def init_dense_eae_params(key, nb_visible=3072, nb_hidden=300, nb_y=200):
    """Gaussian inits N(0, 0.01/0.05) per layer, zero biases
    (reference ``svhn/eae/EntropyAutoencoder.py:146-180``)."""
    keys = jax.random.split(key, 4)
    normal = lambda k, shape, std: std * jax.random.normal(k, shape, jnp.float32)
    return {
        "we_l1": normal(keys[0], (nb_visible, nb_hidden), 0.01),
        "be_l1": jnp.zeros((nb_hidden,), jnp.float32),
        "we_latent": normal(keys[1], (nb_hidden, nb_y), 0.05),
        "be_latent": jnp.zeros((nb_y,), jnp.float32),
        "wd_l1": normal(keys[2], (nb_y, nb_hidden), 0.05),
        "bd_l1": jnp.zeros((nb_hidden,), jnp.float32),
        "wd_mean": normal(keys[3], (nb_hidden, nb_visible), 0.01),
        "bd_mean": jnp.zeros((nb_visible,), jnp.float32),
    }


def encoder(params, visible_units):
    """Returns (hidden, latents) (reference ``:218-247``)."""
    hidden = leaky_relu(visible_units @ params["we_l1"] + params["be_l1"])
    y = hidden @ params["we_latent"] + params["be_latent"]
    return (hidden, y)


def decoder(params, y_tilde):
    """Returns (hidden, reconstruction) (reference ``:249-278``)."""
    hidden = leaky_relu(y_tilde @ params["wd_l1"] + params["bd_l1"])
    reconstruction = hidden @ params["wd_mean"] + params["bd_mean"]
    return (hidden, reconstruction)


def weights_decay(params):
    """0.5 * sum of squared weights over the 4 weight matrices."""
    names = ("we_l1", "we_latent", "wd_l1", "wd_mean")
    return sum(0.5 * jnp.sum(jnp.square(params[name])) for name in names)


class DenseEaeState(NamedTuple):
    """Training state: parameters, momentum buffers, density, bin width."""

    params: Any
    momentum: Any
    density: dens.DensityTable
    bin_width: jnp.ndarray
    step: jnp.ndarray


def init_dense_eae_state(key, bin_width_init=1.0, nb_visible=3072, nb_hidden=300,
                         nb_y=200, max_itvs=MAX_ITVS):
    params = init_dense_eae_params(key, nb_visible, nb_hidden, nb_y)
    momentum = jax.tree_util.tree_map(jnp.zeros_like, params)
    density = dens.init_density_table(1, PPI, max_itvs, NB_ITVS_INIT)
    return DenseEaeState(
        params=params,
        momentum=momentum,
        density=density,
        bin_width=jnp.asarray(bin_width_init, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
    )


def _approx_entropy_scalar(y_tilde_flat, parameters, bin_width, max_itvs):
    """Mean -log2 p over all latents minus log2(bin width).

    SVHN's single shared density (reference ``svhn/tools/tools.py:21-77``).
    """
    prob = dens.approximate_probability(y_tilde_flat[None, :], parameters, PPI, max_itvs)
    diff_entropy = jnp.mean(-jnp.log(prob) / jnp.log(2.0))
    return diff_entropy - jnp.log(bin_width) / jnp.log(2.0)


def _loss_eae(params, bin_width, visible_units, eps, parameters, gamma, max_itvs):
    """0.5*mean(sum sq) + gamma*approx_entropy + weight decay
    (reference ``svhn/tools/tools.py:1125-1165``, ``:758``)."""
    (_, y) = encoder(params, visible_units)
    y_tilde = y + bin_width * eps
    (_, reconstruction) = decoder(params, y_tilde)
    rec_error = 0.5 * jnp.mean(jnp.sum(jnp.square(visible_units - reconstruction), axis=1))
    approx_entropy = _approx_entropy_scalar(y_tilde.flatten(), parameters, bin_width,
                                            max_itvs)
    return (rec_error + gamma * approx_entropy + WEIGHT_DECAY_P * weights_decay(params),
            (rec_error, approx_entropy))


def make_dense_step_fns(gamma, is_bin_width_learned, max_itvs=MAX_ITVS):
    """Jitted training_fct / training_eae_bw / evaluation for the SVHN EAE.

    Mirrors ``svhn/eae/EntropyAutoencoder.py:1054-1117``: plain SGD on
    the density, SGD+momentum(0.9) on the autoencoder, SGD with floor
    0.1 on the bin width.
    """

    @jax.jit
    def training_fct(state, visible_units, key):
        (_, y) = encoder(state.params, visible_units)
        eps = jax.random.uniform(key, y.shape, y.dtype, minval=-0.5, maxval=0.5)
        y_tilde = y + state.bin_width * eps
        max_abs = jnp.max(jnp.abs(y)) + 0.5 * state.bin_width
        table = dens.expand_table(state.density, max_abs, PPI, max_itvs)
        mask = dens.active_mask(table.nb_itvs_per_side, PPI, max_itvs)
        samples = y_tilde.flatten()[None, :]

        def fct_loss(parameters):
            prob = dens.approximate_probability(samples, parameters, PPI, max_itvs)
            return dens.loss_density_approximation(prob, parameters, mask, PPI)

        grads = jax.grad(fct_loss)(table.parameters)
        new_parameters = dens.project_density_parameters(
            table.parameters - LR_FCT * grads, mask)
        return state._replace(density=table._replace(parameters=new_parameters))

    @jax.jit
    def training_eae_bw(state, visible_units, key):
        (_, y) = encoder(state.params, visible_units)
        eps = jax.random.uniform(key, y.shape, y.dtype, minval=-0.5, maxval=0.5)
        grad_fn = jax.grad(_loss_eae, argnums=(0, 1), has_aux=True)
        ((grads_params, grad_bw), _) = grad_fn(
            state.params, state.bin_width, visible_units, eps,
            state.density.parameters, gamma, max_itvs)
        momentum = jax.tree_util.tree_map(
            lambda m, g: MOMENTUM_EAE * m - LR_EAE * g, state.momentum, grads_params)
        params = jax.tree_util.tree_map(lambda p, m: p + m, state.params, momentum)
        if is_bin_width_learned:
            bin_width = jnp.maximum(state.bin_width - LR_BW * grad_bw, MIN_BW)
        else:
            bin_width = state.bin_width
        return state._replace(params=params, momentum=momentum, bin_width=bin_width,
                              step=state.step + 1)

    @jax.jit
    def evaluation(state, visible_units, key):
        """(approx_entropy, scaled_approx_entropy, rec_error,
        loss_density_approx, y) - reference ``:1119-1186`` (discrete
        entropy and dead counts are host-side)."""
        (_, y) = encoder(state.params, visible_units)
        eps = jax.random.uniform(key, y.shape, y.dtype, minval=-0.5, maxval=0.5)
        y_tilde = y + state.bin_width * eps
        (_, reconstruction) = decoder(state.params, y_tilde)
        rec_error = 0.5 * jnp.mean(jnp.sum(jnp.square(visible_units - reconstruction), axis=1))
        approx_entropy = _approx_entropy_scalar(y_tilde.flatten(),
                                                state.density.parameters,
                                                state.bin_width, max_itvs)
        mask = dens.active_mask(state.density.nb_itvs_per_side, PPI, max_itvs)
        samples = y_tilde.flatten()[None, :]
        prob = dens.approximate_probability(samples, state.density.parameters, PPI, max_itvs)
        loss_density = dens.loss_density_approximation(prob, state.density.parameters,
                                                       mask, PPI)
        return (approx_entropy, gamma * approx_entropy, rec_error, loss_density, y)

    return {"training_fct": training_fct, "training_eae_bw": training_eae_bw,
            "evaluation": evaluation}


def compute_rate_psnr(state, visible_units, mean_training, std_training, bin_width_test):
    """Test-time rate and reconstruction for preprocessed SVHN digits.

    The minimal encode/decode semantics (reference
    ``svhn/eae/utils.py:8-80``): encode WITHOUT noise, quantize with the
    test bin width, rate = nb_y * discrete_entropy / nb_visible, decode,
    un-preprocess. Returns (rate, reconstruction_uint8-like float).
    """
    import numpy

    from autoencoder_based_image_compression_tpu.ops.metrics import discrete_entropy

    (_, y) = encoder(state.params, jnp.asarray(visible_units))
    y = numpy.asarray(y)
    quantized_y = bin_width_test * numpy.round(y / bin_width_test)
    nb_y = y.shape[1]
    nb_visible = visible_units.shape[1]
    rate = nb_y * discrete_entropy(quantized_y, bin_width_test) / nb_visible
    (_, reconstruction) = decoder(state.params, jnp.asarray(quantized_y))
    rec = numpy.asarray(reconstruction) * std_training + mean_training
    rec_uint8 = numpy.round(rec.clip(0.0, 255.0)).astype(numpy.uint8)
    return (rate, rec_uint8)
