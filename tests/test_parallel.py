"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that the sharded training step compiles + executes with real
(data, model) shardings and that it computes the same numbers as the
single-device step (a data-parallel sum is still a sum).
"""

import jax
import jax.numpy as jnp
import numpy
import pytest

from autoencoder_based_image_compression_tpu.parallel.inference import roundtrip_batched
from autoencoder_based_image_compression_tpu.parallel.mesh import make_mesh
from autoencoder_based_image_compression_tpu.parallel.train_parallel import (
    make_sharded_step_fns,
    shard_state,
)
from autoencoder_based_image_compression_tpu.train.state import init_train_state
from autoencoder_based_image_compression_tpu.train.step import make_step_fns

GAMMA = 10000.0

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU platform")


def _batch(nb):
    rng = numpy.random.default_rng(0)
    return jnp.asarray(rng.integers(0, 256, size=(nb, 32, 32, 1)).astype(numpy.float32))


def test_mesh_axes():
    mesh = make_mesh(model_parallelism=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_sharded_evaluation_matches_single_device():
    # The forward computation (losses, latents) must agree between the
    # sharded and single-device paths up to float32 reduction order.
    # (Post-Adam states are NOT compared: on near-zero gradients Adam's
    # rsqrt amplifies psum reduction-order noise into sign flips.)
    state = init_train_state(jax.random.PRNGKey(0), GAMMA, bin_width_init=1.0,
                             learn_bin_widths=True, max_itvs=16)
    batch = _batch(8)
    key = jax.random.PRNGKey(1)

    single_fns = make_step_fns(GAMMA, True, max_itvs=16, donate=False)
    (s_ae, s_rec, _, s_y, _, _, _) = single_fns["evaluation"](state, batch, key)

    mesh = make_mesh(model_parallelism=2)
    sharded_state = shard_state(state, mesh)
    fns = make_sharded_step_fns(GAMMA, True, mesh, sharded_state, max_itvs=16)
    sharded_batch = jax.device_put(batch, fns["batch_sharding"])
    (p_ae, p_rec, p_y) = fns["evaluation"](sharded_state, sharded_batch, key)

    numpy.testing.assert_allclose(float(s_ae), float(p_ae), rtol=1e-4)
    numpy.testing.assert_allclose(float(s_rec), float(p_rec), rtol=1e-4)
    numpy.testing.assert_allclose(numpy.asarray(s_y), numpy.asarray(p_y),
                                  rtol=1e-4, atol=1e-5)


def test_sharded_train_step_executes_and_projections_hold():
    from autoencoder_based_image_compression_tpu import constants as csts

    state = init_train_state(jax.random.PRNGKey(0), GAMMA, bin_width_init=1.0,
                             learn_bin_widths=True, max_itvs=16)
    mesh = make_mesh(model_parallelism=2)
    sharded_state = shard_state(state, mesh)
    fns = make_sharded_step_fns(GAMMA, True, mesh, sharded_state, max_itvs=16)
    batch = jax.device_put(_batch(8), fns["batch_sharding"])
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        (key, sub) = jax.random.split(key)
        sharded_state = fns["train_step"](sharded_state, batch, sub)
    assert int(sharded_state.step) == 3
    for leaf in jax.tree_util.tree_leaves(sharded_state):
        assert numpy.all(numpy.isfinite(numpy.asarray(leaf, dtype=numpy.float64)))
    gamma = numpy.asarray(sharded_state.params["gamma_1"])
    numpy.testing.assert_allclose(gamma, gamma.T, rtol=1e-6)
    bw = numpy.asarray(sharded_state.bin_widths)
    assert bw.min() >= csts.MIN_BW - 1e-9 and bw.max() <= csts.MAX_BW + 1e-9


def test_sharded_evaluation_runs():
    state = init_train_state(jax.random.PRNGKey(2), GAMMA, bin_width_init=1.0,
                             learn_bin_widths=False, max_itvs=16)
    mesh = make_mesh(model_parallelism=2)
    sharded_state = shard_state(state, mesh)
    fns = make_sharded_step_fns(GAMMA, False, mesh, sharded_state, max_itvs=16)
    batch = jax.device_put(_batch(8), fns["batch_sharding"])
    (scaled_ae, rec_error, y) = fns["evaluation"](sharded_state, batch,
                                                  jax.random.PRNGKey(3))
    assert numpy.isfinite(float(scaled_ae)) and numpy.isfinite(float(rec_error))
    assert y.shape == (8, 2, 2, 128)


def test_sharded_inference_matches_unsharded():
    from autoencoder_based_image_compression_tpu.models import conv_eae

    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(4), True)
    rng = numpy.random.default_rng(5)
    images = rng.integers(0, 256, size=(8, 32, 32, 1)).astype(numpy.uint8)
    bin_widths = numpy.ones(128, numpy.float32)
    plain = roundtrip_batched(params, images, bin_widths, True, batch_size=8)
    mesh = make_mesh(model_parallelism=1)
    sharded = roundtrip_batched(params, images, bin_widths, True, batch_size=8,
                                mesh=mesh)
    numpy.testing.assert_allclose(plain, sharded, rtol=5e-5, atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
