"""SVHN-side model tests: the overfit sanity harness of the reference
(``svhn/overfitting_eae_svhn.py``) turned into assertions, plus VAE
training smoke."""

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.models import dense_eae, vae


def _toy_digits(rng, nb, nb_visible=192):
    return rng.normal(0.0, 1.0, size=(nb, nb_visible)).astype(numpy.float32)


def test_dense_eae_shapes():
    state = dense_eae.init_dense_eae_state(jax.random.PRNGKey(0), nb_visible=192,
                                           nb_hidden=32, nb_y=16, max_itvs=32)
    x = jnp.zeros((4, 192), jnp.float32)
    (hidden, y) = dense_eae.encoder(state.params, x)
    assert hidden.shape == (4, 32) and y.shape == (4, 16)
    (hidden_d, rec) = dense_eae.decoder(state.params, y)
    assert hidden_d.shape == (4, 32) and rec.shape == (4, 192)


def test_dense_eae_overfit_decreases_loss():
    # Reference harness: overfit a handful of examples and watch the
    # objective fall (``svhn/overfitting_eae_svhn.py``).
    rng = numpy.random.default_rng(0)
    digits = jnp.asarray(_toy_digits(rng, 10))
    gamma = 1.0
    state = dense_eae.init_dense_eae_state(jax.random.PRNGKey(1), nb_visible=192,
                                           nb_hidden=32, nb_y=16, max_itvs=32)
    fns = dense_eae.make_dense_step_fns(gamma, is_bin_width_learned=True, max_itvs=32)
    key = jax.random.PRNGKey(2)
    key_eval = jax.random.PRNGKey(3)

    def objective(state):
        (_, scaled_ae, rec_error, _, _) = fns["evaluation"](state, digits, key_eval)
        return float(scaled_ae) + float(rec_error)

    for _ in range(30):
        (key, sub) = jax.random.split(key)
        state = fns["training_fct"](state, digits, sub)
    before = objective(state)
    for _ in range(200):
        (key, sub) = jax.random.split(key)
        state = fns["training_fct"](state, digits, sub)
        state = fns["training_eae_bw"](state, digits, sub)
    after = objective(state)
    assert after < before
    assert float(state.bin_width) >= dense_eae.MIN_BW


def test_dense_eae_compute_rate_psnr():
    rng = numpy.random.default_rng(4)
    state = dense_eae.init_dense_eae_state(jax.random.PRNGKey(5), nb_visible=192,
                                           nb_hidden=32, nb_y=16, max_itvs=32)
    digits = _toy_digits(rng, 8)
    (rate, rec_uint8) = dense_eae.compute_rate_psnr(
        state, digits, mean_training=numpy.zeros(192, numpy.float32),
        std_training=50.0, bin_width_test=1.0)
    assert rate >= 0.0
    assert rec_uint8.shape == digits.shape and rec_uint8.dtype == numpy.uint8


def test_vae_training_decreases_vlb():
    rng = numpy.random.default_rng(6)
    digits = jnp.asarray(_toy_digits(rng, 32))
    state = vae.init_vae_state(jax.random.PRNGKey(7), nb_visible=192, nb_hidden=32,
                               nb_z=8)
    alpha = 1.0
    step = vae.make_vae_step_fn(alpha)
    key_eval = jax.random.PRNGKey(8)
    loss_fn = jax.jit(lambda p: vae.opposite_vlb(p, digits, key_eval, alpha))
    before = float(loss_fn(state.params))
    key = jax.random.PRNGKey(9)
    for _ in range(300):
        (key, sub) = jax.random.split(key)
        state = step(state, digits, sub)
    after = float(loss_fn(state.params))
    assert after < before


def test_vae_generate_shapes():
    state = vae.init_vae_state(jax.random.PRNGKey(10), nb_visible=192, nb_hidden=32,
                               nb_z=8)
    samples = vae.generate(state.params, jax.random.PRNGKey(11), 5, nb_z=8)
    assert samples.shape == (5, 192)


def test_kl_divergence_zero_at_prior():
    z_mean = jnp.zeros((4, 8))
    z_log_std_squared = jnp.zeros((4, 8))
    assert float(vae.kl_divergence(z_mean, z_log_std_squared)) == 0.0
