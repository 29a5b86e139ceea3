"""Training-step integration tests (reference ``test_eae.py:371-457``:
real updates on random data, loss-before vs loss-after; here asserted
instead of printed) and checkpoint round-trip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.ops import density as dens
from autoencoder_based_image_compression_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from autoencoder_based_image_compression_tpu.train.state import init_train_state
from autoencoder_based_image_compression_tpu.train.step import make_step_fns

GAMMA = 10000.0


def _tiny_setup(learn_bin_widths, seed=0):
    key = jax.random.PRNGKey(seed)
    state = init_train_state(key, GAMMA, bin_width_init=1.0,
                             learn_bin_widths=learn_bin_widths, max_itvs=32)
    step_fns = make_step_fns(GAMMA, learn_bin_widths, max_itvs=32, donate=False)
    rng = numpy.random.default_rng(seed)
    batch = jnp.asarray(rng.integers(0, 256, size=(2, 32, 32, 1)).astype(numpy.float32))
    return state, step_fns, batch, key


def test_training_fct_decreases_density_loss():
    (state, step_fns, batch, key) = _tiny_setup(learn_bin_widths=True)

    def density_loss(state, key):
        (_, _, loss_density, *_rest) = step_fns["evaluation"](state, batch, key)
        return float(loss_density)

    (key_eval, key_steps) = jax.random.split(key)
    before = density_loss(state, key_eval)
    for i in range(30):
        (key_steps, subkey) = jax.random.split(key_steps)
        state = step_fns["training_fct"](state, batch, subkey)
    after = density_loss(state, key_eval)
    assert after < before


def test_train_step_decreases_rd_loss():
    (state, step_fns, batch, key) = _tiny_setup(learn_bin_widths=False)

    def rd_loss(state, key):
        (scaled_ae, rec_error, *_rest) = step_fns["evaluation"](state, batch, key)
        return float(scaled_ae) + float(rec_error)

    (key_eval, key_steps) = jax.random.split(key)
    # Density pre-fit so the entropy term is meaningful.
    for _ in range(20):
        (key_steps, subkey) = jax.random.split(key_steps)
        state = step_fns["training_fct"](state, batch, subkey)
    before = rd_loss(state, key_eval)
    for _ in range(60):
        (key_steps, subkey) = jax.random.split(key_steps)
        state = step_fns["train_step"](state, batch, subkey)
    after = rd_loss(state, key_eval)
    assert after < before
    assert int(state.step) == 60


def test_projections_hold_after_updates():
    (state, step_fns, batch, key) = _tiny_setup(learn_bin_widths=True)
    for _ in range(5):
        (key, subkey) = jax.random.split(key)
        state = step_fns["train_step"](state, batch, subkey)
    for i in (1, 2, 5, 6):
        gamma = numpy.asarray(state.params[f"gamma_{i}"])
        beta = numpy.asarray(state.params[f"beta_{i}"])
        numpy.testing.assert_allclose(gamma, gamma.T, rtol=1e-6)
        assert beta.min() >= csts.MIN_GAMMA_BETA - 1e-9
    bw = numpy.asarray(state.bin_widths)
    assert bw.min() >= csts.MIN_BW - 1e-9 and bw.max() <= csts.MAX_BW + 1e-9
    # Dead density cells stay pinned at the padding value.
    mask = numpy.asarray(dens.active_mask(state.density.nb_itvs_per_side,
                                          csts.NB_POINTS_PER_INTERVAL, 32))
    dead = numpy.asarray(state.density.parameters)[:, mask == 0]
    if dead.size:
        numpy.testing.assert_allclose(dead, csts.LOW_PROJECTION, rtol=1e-6)


def test_grid_expansion_during_training():
    # GDN bounds the latent amplitude, so scale the last conv kernel
    # (the latents are linear in it when bin widths are learned) to
    # force |y| past the grid boundary.
    (state, step_fns, batch, key) = _tiny_setup(learn_bin_widths=True)
    params = dict(state.params)
    params["weights_3"] = 1000.0 * params["weights_3"]
    state = state._replace(params=params)
    before = int(state.density.nb_itvs_per_side)
    state = step_fns["training_fct"](state, batch, key)
    after = int(state.density.nb_itvs_per_side)
    assert after > before


def test_checkpoint_roundtrip_and_overwrite_guard():
    (state, step_fns, batch, key) = _tiny_setup(learn_bin_widths=True)
    state = step_fns["train_step"](state, batch, key)
    template = init_train_state(jax.random.PRNGKey(99), GAMMA, bin_width_init=1.0,
                                learn_bin_widths=True, max_itvs=32)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "model_1")
        save_checkpoint(path, state)
        assert checkpoint_exists(path)
        restored = load_checkpoint(path, template)
        for (a, b) in zip(jax.tree_util.tree_leaves(state),
                          jax.tree_util.tree_leaves(restored)):
            numpy.testing.assert_allclose(numpy.asarray(a), numpy.asarray(b), rtol=1e-7)
        try:
            save_checkpoint(path, state)
        except FileExistsError:
            pass
        else:
            raise AssertionError("expected refusal to overwrite an existing checkpoint")


def test_params_artifact_roundtrip():
    """Compressed params-only export (what the benchmark loads)."""
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact,
        save_params_artifact,
    )

    (state, _, _, _) = _tiny_setup(learn_bin_widths=True)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "params.npz")
        save_params_artifact(path, state.params, state.bin_widths)
        (params, bin_widths) = load_params_artifact(path)
        assert set(params) == set(state.params)
        for k in params:
            numpy.testing.assert_array_equal(numpy.asarray(params[k]),
                                             numpy.asarray(state.params[k]))
        numpy.testing.assert_array_equal(numpy.asarray(bin_widths),
                                         numpy.asarray(state.bin_widths))

        from autoencoder_based_image_compression_tpu.train.checkpoint import (
            params_artifact_step)

        assert params_artifact_step(path) is None  # step not stamped
        save_params_artifact(path, state.params, state.bin_widths, step=6990)
        assert params_artifact_step(path) == 6990
        (params2, _) = load_params_artifact(path)
        assert set(params2) == set(state.params)  # step key not a param


def test_checkpoint_rename_fails_loudly():
    """Leaves are keyed by tree path: a same-shape key rename must raise,
    not silently map onto another tensor (all GDN gammas share a shape)."""
    (state, step_fns, batch, key) = _tiny_setup(learn_bin_widths=True)
    template = init_train_state(jax.random.PRNGKey(99), GAMMA, bin_width_init=1.0,
                                learn_bin_widths=True, max_itvs=32)
    renamed_params = dict(template.params)
    renamed_params["gamma_1_renamed"] = renamed_params.pop("gamma_1")
    renamed = template._replace(params=renamed_params)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "model_1")
        save_checkpoint(path, state)
        try:
            load_checkpoint(path, renamed)
        except ValueError as error:
            assert "gamma_1" in str(error)
        else:
            raise AssertionError("expected a loud failure on a key rename")


def test_interrupted_save_refused_and_incomplete():
    # A model npz without its json sidecar is a half-written part
    # (save_checkpoint writes the meta last): resume must refuse it and
    # resumable drivers must see the part as incomplete
    # (VERDICT r4 item 8; reference training_eae_imagenet.py:89-96).
    import os
    import tempfile

    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        checkpoint_part_complete)
    from autoencoder_based_image_compression_tpu.train.state import (
        init_train_state)

    state = init_train_state(jax.random.PRNGKey(0), GAMMA, 1.0, True)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "model_1")
        save_checkpoint(path, state)
        os.remove(path + ".json")  # simulate dying between npz and meta
        assert not checkpoint_part_complete(path)
        try:
            load_checkpoint(path, state)
        except FileNotFoundError:
            pass
        else:
            raise AssertionError(
                "expected refusal to load a json-less checkpoint")


def test_bw_warmup_tightens_early_clip():
    # Cold-start mitigation: while step < bw_warmup_steps the learned
    # bin widths clip to bw_warmup_max instead of MAX_BW (4.0), and the
    # full clip returns once past the warmup horizon.
    import numpy

    from autoencoder_based_image_compression_tpu.train.state import (
        init_train_state)

    step_fns = make_step_fns(GAMMA, True, max_itvs=32,
                             bw_warmup_steps=100, bw_warmup_max=1.0)
    rng = numpy.random.default_rng(0)
    batch = jnp.asarray(rng.integers(0, 256, size=(2, 32, 32, 1)), jnp.uint8)
    # Start from bin widths ABOVE the warmup cap: one update must clip
    # them down to the cap while the warmup is active...
    state = init_train_state(jax.random.PRNGKey(1), GAMMA, 3.0, True,
                             max_itvs=32)
    state = step_fns["train_step"](state, batch, jax.random.PRNGKey(2))
    assert float(jnp.max(state.bin_widths)) <= 1.0 + 1e-6
    # ...and must NOT once the step counter passes the horizon.
    state_late = init_train_state(jax.random.PRNGKey(1), GAMMA, 3.0, True,
                                  max_itvs=32)
    state_late = state_late._replace(step=jnp.asarray(1000, state_late.step.dtype))
    state_late = step_fns["train_step"](state_late, batch, jax.random.PRNGKey(2))
    assert float(jnp.max(state_late.bin_widths)) > 1.5
