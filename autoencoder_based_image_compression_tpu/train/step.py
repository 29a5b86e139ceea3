"""Alternating training updates as pure jitted functions.

The reference's hot loop issues ~6 ``sess.run`` calls per batch
(``eae/batching.py:129-165``, ``EntropyAutoencoder.py:484-540``):
expansion, density SGD, density projection, then a joint Adam+SGD
fetch followed by four projection/symmetrization assigns. Here the
whole alternation compiles into **one** XLA program per batch
(``train_step``), preserving the reference's update ordering:

    1. expand the density grid if the latents overflow it
    2. one SGD step on the density parameters  + projection
    3. one Adam step on the autoencoder parameters and (optionally)
       one SGD step on the bin widths, against the *updated* density
    4. bin-width clip, GDN beta/gamma projections, gamma symmetrization

Separate ``training_fct`` / ``training_eae_bw`` entry points mirror the
reference API for the density pre-fitting phase
(``eae/batching.py:102-127``).
"""

import functools

import jax
import jax.numpy as jnp
import optax

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops import density as dens
from autoencoder_based_image_compression_tpu.ops.quantization import add_uniform_noise
from autoencoder_based_image_compression_tpu.train.state import TrainState, make_adam


def _flatten_maps(y_tilde):
    """(B, H, W, C) -> (C, B*H*W): row i gathers all samples of map i.

    Reference ``tfutils.py:581-605`` (``reshape_4d_to_2d``).
    """
    c = y_tilde.shape[-1]
    return jnp.reshape(y_tilde, (-1, c)).T


def _noisy_latents(params, visible_units, bin_widths, key, learn_bin_widths):
    # Batches may arrive as device-resident uint8 (the training loop
    # keeps the dataset in HBM and gathers rows on device - the
    # reference re-uploads a float32 feed_dict every sess.run,
    # eae/batching.py:48-53). The cast to float32 happens here, on
    # device, inside the jit.
    visible_units = visible_units.astype(jnp.float32)
    y = conv_eae.encode(params, visible_units, learn_bin_widths)
    y_tilde = add_uniform_noise(key, y, bin_widths)
    return y, y_tilde


def _density_phase(state, visible_units, key, learn_bin_widths, ppi, max_itvs):
    """Expansion + one density SGD step + projection.

    Reference ``EntropyAutoencoder.py:484-506`` (``training_fct``).
    """
    (y, y_tilde) = _noisy_latents(state.params, visible_units, state.bin_widths,
                                  key, learn_bin_widths)
    max_abs = jnp.max(jnp.abs(y)) + 0.5 * jnp.max(state.bin_widths)
    table = dens.expand_table(state.density, max_abs, ppi, max_itvs)
    mask = dens.active_mask(table.nb_itvs_per_side, ppi, max_itvs)
    samples = _flatten_maps(y_tilde)

    def fct_loss(parameters):
        prob = dens.approximate_probability(samples, parameters, ppi, max_itvs)
        return dens.loss_density_approximation(prob, parameters, mask, ppi)

    grads = jax.grad(fct_loss)(table.parameters)
    new_parameters = table.parameters - csts.LR_FCT * grads
    new_parameters = dens.project_density_parameters(new_parameters, mask)
    return state._replace(density=table._replace(parameters=new_parameters))


def _rd_loss(params, bin_widths, visible_units, key, density_table, gamma_scaling,
             learn_bin_widths, ppi, max_itvs):
    """Rate-distortion objective of the autoencoder + bin widths.

    ``rec_error + gamma * approx_entropy + WEIGHT_DECAY_P * l2``
    (reference ``EntropyAutoencoder.py:308-313``). The density
    parameters are inputs, not optimization variables, reproducing the
    reference's disjoint ``var_list``s.
    """
    visible_units = visible_units.astype(jnp.float32)
    (_, y_tilde) = _noisy_latents(params, visible_units, bin_widths, key, learn_bin_widths)
    prob = dens.approximate_probability(_flatten_maps(y_tilde), density_table.parameters,
                                        ppi, max_itvs)
    approx_entropy = dens.approximate_entropy(prob, bin_widths)
    reconstruction = conv_eae.decode(params, y_tilde, learn_bin_widths)
    diff_sq = jnp.square(visible_units - reconstruction)
    rec_error = jnp.mean(jnp.sum(diff_sq, axis=(1, 2, 3)))
    weight_decay = csts.WEIGHT_DECAY_P * conv_eae.weight_l2_norm(params)
    loss = rec_error + gamma_scaling * approx_entropy + weight_decay
    return loss, (rec_error, approx_entropy)


def _project_gdn(params, learn_bin_widths):
    """Beta/gamma floor projections + gamma symmetrization.

    Order matches the reference: beta, gamma, then symmetrize
    (``EntropyAutoencoder.py:352-382``).
    """
    indices = [1, 2, 5, 6] if learn_bin_widths else [1, 2, 3, 4, 5, 6]
    new = dict(params)
    for i in indices:
        new[f"beta_{i}"] = jnp.maximum(new[f"beta_{i}"], csts.MIN_GAMMA_BETA)
    for i in indices:
        new[f"gamma_{i}"] = jnp.maximum(new[f"gamma_{i}"], csts.MIN_GAMMA_BETA)
    for i in indices:
        g = new[f"gamma_{i}"]
        new[f"gamma_{i}"] = 0.5 * (g + g.T)
    return new


def _eae_bw_phase(state, visible_units, key, adam, gamma_scaling,
                  learn_bin_widths, ppi, max_itvs,
                  bw_warmup_steps=0, bw_warmup_max=1.0):
    """Joint Adam + bin-width SGD update, then projections.

    Reference ``EntropyAutoencoder.py:508-540`` (``training_eae_bw``).

    ``bw_warmup_steps``: cold-start mitigation for joint bin-width
    learning. Early in training the latent std is small (~0.3) while
    the clip floor is 0.8, so the entropy term inflates the bin widths
    (observed mean 1.37 by step 28k) instead of the transform scaling
    its latents up - the family then spends ~10k steps recovering
    (BASELINE.md, round 4). While ``step < bw_warmup_steps`` the upper
    clip is tightened from ``MAX_BW`` (4.0) to ``bw_warmup_max`` so the
    rate gradient has to act on the transform, not the quantizer. 0
    disables it (the reference's exact [0.8, 4.0] clip at every step,
    ``EntropyAutoencoder.py:386-387``).
    """
    grad_fn = jax.grad(_rd_loss, argnums=(0, 1), has_aux=True)
    ((grads_params, grads_bw), _) = grad_fn(
        state.params, state.bin_widths, visible_units, key, state.density,
        gamma_scaling, learn_bin_widths, ppi, max_itvs)
    (updates, opt_eae) = adam.update(grads_params, state.opt_eae, state.params)
    params = optax.apply_updates(state.params, updates)
    if learn_bin_widths:
        bin_widths = state.bin_widths - csts.LR_BW * grads_bw
        max_bw = csts.MAX_BW
        if bw_warmup_steps > 0:
            max_bw = jnp.where(state.step < bw_warmup_steps,
                               jnp.float32(bw_warmup_max),
                               jnp.float32(csts.MAX_BW))
        bin_widths = jnp.clip(bin_widths, csts.MIN_BW, max_bw)
    else:
        bin_widths = state.bin_widths
    params = _project_gdn(params, learn_bin_widths)
    return state._replace(params=params, bin_widths=bin_widths, opt_eae=opt_eae,
                          step=state.step + 1)


def make_step_fns(gamma_scaling, learn_bin_widths,
                  ppi=csts.NB_POINTS_PER_INTERVAL, max_itvs=csts.MAX_ITVS_PER_SIDE,
                  donate=False, bw_warmup_steps=0, bw_warmup_max=1.0):
    """Builds the jitted training/eval functions for one experiment.

    Returns a dict with:

    - ``training_fct(state, batch, key)``: density-only update (used by
      the pre-fitting epochs, reference ``eae/batching.py:102-127``)
    - ``training_eae_bw(state, batch, key)``: autoencoder + bin-width
      update
    - ``train_step(state, batch, key)``: the fused per-batch alternation
      (density phase THEN eae/bw phase - ordering documented at
      reference ``eae/batching.py:154-163``)
    - ``train_epoch(state, dataset, rows, key)``: a whole shuffled epoch
      scanned inside ONE dispatch over a device-resident uint8 dataset
    - ``evaluation(state, batch, key)``: the training indicators
      (reference ``EntropyAutoencoder.py:542-589``) - returns
      ``(scaled_approx_entropy, rec_error, loss_density_approx, y,
      approx_entropy_per_map [UNCLAMPED], areas_under_pdfs,
      weight_decay)``
    """
    # Donation halves peak memory on the state buffers but is off by
    # default: some experimental PJRT platforms stall when compiling
    # donated programs (observed: >280 s vs 118 s undonated on the same
    # graph). Opt in with donate=True on platforms that support it.
    adam = make_adam(gamma_scaling)
    static = dict(learn_bin_widths=learn_bin_widths, ppi=ppi, max_itvs=max_itvs)
    donate_args = (0,) if donate else ()

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def training_fct(state, batch, key):
        return _density_phase(state, batch, key, **static)

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def training_eae_bw(state, batch, key):
        return _eae_bw_phase(state, batch, key, adam, gamma_scaling,
                             bw_warmup_steps=bw_warmup_steps,
                             bw_warmup_max=bw_warmup_max, **static)

    @functools.partial(jax.jit, donate_argnums=donate_args)
    def train_step(state, batch, key):
        (key_fct, key_eae) = jax.random.split(key)
        state = _density_phase(state, batch, key_fct, **static)
        state = _eae_bw_phase(state, batch, key_eae, adam, gamma_scaling,
                              bw_warmup_steps=bw_warmup_steps,
                              bw_warmup_max=bw_warmup_max, **static)
        return state

    @jax.jit
    def train_epoch(state, dataset, rows, key):
        """A whole epoch as ONE dispatch: ``lax.scan`` over the shuffled
        mini-batch row indices, gathering each batch from the
        device-resident uint8 dataset inside the scan body.

        The per-step host->device dispatch (a ~27 ms round trip on a
        tunneled chip, and never less than a kernel-launch tax) is paid
        once per epoch instead of once per batch - the reference pays
        ~6 ``sess.run`` round trips per batch
        (``eae/batching.py:154-163``).

        ``rows``: (nb_batches, batch_size) int32.
        """
        keys = jax.random.split(key, rows.shape[0])

        def body(carry, xs):
            (batch_rows, subkey) = xs
            batch = jnp.take(dataset, batch_rows, axis=0)
            (key_fct, key_eae) = jax.random.split(subkey)
            carry = _density_phase(carry, batch, key_fct, **static)
            carry = _eae_bw_phase(carry, batch, key_eae, adam, gamma_scaling,
                                  bw_warmup_steps=bw_warmup_steps,
                                  bw_warmup_max=bw_warmup_max, **static)
            return (carry, None)

        (state, _) = jax.lax.scan(body, state, (rows, keys))
        return state

    @jax.jit
    def evaluation(state, batch, key):
        batch = batch.astype(jnp.float32)
        (y, y_tilde) = _noisy_latents(state.params, batch, state.bin_widths, key,
                                      learn_bin_widths)
        max_abs = jnp.max(jnp.abs(y)) + 0.5 * jnp.max(state.bin_widths)
        table = dens.expand_table(state.density, max_abs, ppi, max_itvs)
        mask = dens.active_mask(table.nb_itvs_per_side, ppi, max_itvs)
        samples = _flatten_maps(y_tilde)
        prob = dens.approximate_probability(samples, table.parameters, ppi, max_itvs)
        # Per-map approximate entropies stay UNCLAMPED here so the host
        # monitor can flag negative values (the reference asserts,
        # tfutils.py:89-93).
        approx_per_map = dens.approximate_entropy_per_map(prob, state.bin_widths)
        scaled_approx_entropy = gamma_scaling * jnp.sum(jnp.maximum(approx_per_map, 0.0))
        loss_density = dens.loss_density_approximation(prob, table.parameters, mask, ppi)
        reconstruction = conv_eae.decode(state.params, y_tilde, learn_bin_widths)
        rec_error = jnp.mean(jnp.sum(jnp.square(batch - reconstruction), axis=(1, 2, 3)))
        areas = dens.area_under_piecewise_linear_functions(
            table.parameters, table.nb_itvs_per_side, ppi, max_itvs)
        weight_decay = csts.WEIGHT_DECAY_P * conv_eae.weight_l2_norm(state.params)
        return (scaled_approx_entropy, rec_error, loss_density, y,
                approx_per_map, areas, weight_decay)

    return {
        "training_fct": training_fct,
        "training_eae_bw": training_eae_bw,
        "train_step": train_step,
        "train_epoch": train_epoch,
        "evaluation": evaluation,
    }
