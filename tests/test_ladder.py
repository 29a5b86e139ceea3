"""Whole-ladder (vmapped multi-gamma) training tests.

The ladder path must reproduce per-gamma sequential training (same
update math, same keys => same trajectories) while running every model
in one program.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.train.ladder import (
    init_ladder_state,
    ladder_slice_state,
    make_ladder_step_fns,
)
from autoencoder_based_image_compression_tpu.train.state import init_train_state
from autoencoder_based_image_compression_tpu.train.step import make_step_fns

GAMMAS = [10000.0, 96000.0]


def _batch(seed, nb=2, size=32):
    rng = numpy.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(16, 236, size=(nb, size, size, 1)).astype(numpy.float32))


def test_ladder_matches_sequential_single_models():
    key_init = jax.random.PRNGKey(0)
    ladder = init_ladder_state(key_init, GAMMAS)
    fns = make_ladder_step_fns(GAMMAS)

    # Sequential single-model runs, seeded with the SAME per-model
    # init keys and per-batch subkeys the ladder uses internally.
    init_keys = jax.random.split(key_init, len(GAMMAS))
    singles = [init_train_state(init_keys[k], GAMMAS[k], 1.0, False)
               for k in range(len(GAMMAS))]
    single_fns = [make_step_fns(g, False) for g in GAMMAS]

    batches = [_batch(7), _batch(8), _batch(9)]
    step_keys = [jax.random.PRNGKey(100 + i) for i in range(len(batches))]

    # Density pre-fit pass, then full alternating steps.
    ladder = fns["training_fct"](ladder, batches[0], step_keys[0])
    per_model = jax.random.split(step_keys[0], len(GAMMAS))
    singles = [single_fns[k]["training_fct"](singles[k], batches[0], per_model[k])
               for k in range(len(GAMMAS))]
    for (batch, key) in zip(batches[1:], step_keys[1:]):
        ladder = fns["train_step"](ladder, batch, key)
        per_model = jax.random.split(key, len(GAMMAS))
        singles = [single_fns[k]["train_step"](singles[k], batch, per_model[k])
                   for k in range(len(GAMMAS))]

    for k in range(len(GAMMAS)):
        sliced = ladder_slice_state(ladder, k, GAMMAS[k])
        assert int(sliced.step) == int(singles[k].step) == 2
        assert int(sliced.density.nb_itvs_per_side) == \
            int(singles[k].density.nb_itvs_per_side)
        for name in sliced.params:
            diff = numpy.abs(numpy.asarray(sliced.params[name])
                             - numpy.asarray(singles[k].params[name]))
            # Adam normalizes by sqrt(nu): elements whose gradient sits
            # at the vmap-vs-single numeric noise floor can flip the
            # update direction (bounded by a few LR_EAE=1e-4 steps);
            # everything else must agree tightly.
            assert diff.max() <= 5.0e-4, (GAMMAS[k], name, diff.max())
            assert (diff <= 2.0e-6).mean() > 0.995, (GAMMAS[k], name)
        # Density-fit SGD (LR 0.2) amplifies the same numeric noise
        # floor; pdf values live in [1e-6, ~0.5].
        numpy.testing.assert_allclose(
            numpy.asarray(sliced.density.parameters),
            numpy.asarray(singles[k].density.parameters),
            rtol=5e-4, atol=1e-4)

    # The two gammas must actually have diverged from each other (the
    # rate term dominates 9.6x more for the second model).
    assert not numpy.allclose(
        numpy.asarray(ladder.params["weights_1"][0]),
        numpy.asarray(ladder.params["weights_1"][1]))


def test_ladder_epoch_single_dispatch():
    ladder = init_ladder_state(jax.random.PRNGKey(1), GAMMAS)
    fns = make_ladder_step_fns(GAMMAS)
    rng = numpy.random.default_rng(2)
    dataset = jnp.asarray(
        rng.integers(16, 236, size=(8, 32, 32, 1)).astype(numpy.uint8))
    rows = jnp.asarray(rng.permutation(8).reshape(4, 2))
    out = fns["train_epoch"](ladder, dataset, rows, jax.random.PRNGKey(3))
    assert numpy.all(numpy.asarray(out.step) == 4)
    for name in out.params:
        assert numpy.all(numpy.isfinite(numpy.asarray(out.params[name])))


def test_ladder_slice_checkpoints_into_single_model_pipeline():
    """A ladder slice must round-trip through the standard path-keyed
    checkpoint with an init_train_state template (the structure the
    stats/RD pipeline loads)."""
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    ladder = init_ladder_state(jax.random.PRNGKey(4), GAMMAS)
    fns = make_ladder_step_fns(GAMMAS)
    ladder = fns["train_step"](ladder, _batch(11), jax.random.PRNGKey(5))
    sliced = ladder_slice_state(ladder, 1, GAMMAS[1])
    template = init_train_state(jax.random.PRNGKey(0), GAMMAS[1], 1.0, False)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "model_1")
        save_checkpoint(path, sliced)
        restored = load_checkpoint(path, template)
    assert int(restored.step) == 1
    numpy.testing.assert_array_equal(
        numpy.asarray(restored.params["weights_1"]),
        numpy.asarray(sliced.params["weights_1"]))


def test_ladder_sharded_over_mesh_matches_unsharded():
    """Gamma-axis model parallelism: the ladder state sharded over a
    4-device mesh axis must train identically to the unsharded ladder
    (the models are independent; GSPMD partitions the vmapped program
    with zero collectives)."""
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh

    from autoencoder_based_image_compression_tpu.train.ladder import (
        shard_ladder_state)

    gammas = [10000.0, 16000.0, 40000.0, 96000.0]
    ladder = init_ladder_state(jax.random.PRNGKey(6), gammas)
    fns = make_ladder_step_fns(gammas)
    batch = _batch(12)
    key = jax.random.PRNGKey(13)
    plain = fns["train_step"](ladder, batch, key)

    mesh = Mesh(numpy.array(jax.devices()[:4]), ("data",))
    sharded_in = shard_ladder_state(ladder, mesh)
    sharded_out = fns["train_step"](sharded_in, batch, key)

    for name in plain.params:
        numpy.testing.assert_allclose(
            numpy.asarray(sharded_out.params[name]),
            numpy.asarray(plain.params[name]), rtol=1e-6, atol=1e-7,
            err_msg=name)
    numpy.testing.assert_array_equal(
        numpy.asarray(sharded_out.density.nb_itvs_per_side),
        numpy.asarray(plain.density.nb_itvs_per_side))
    # The output actually came back sharded over the mesh.
    assert len(sharded_out.params["weights_1"].sharding.device_set) == 4
