"""Scanned-epoch training: one dispatch per epoch.

``train_epoch`` runs the whole shuffled epoch as a ``lax.scan`` over a
device-resident uint8 dataset. It must reproduce the sequential
per-batch ``train_step`` loop exactly (same key schedule), and
``run_epoch_training`` must route through it.
"""

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.train.loop import (
    device_resident_dataset,
    run_epoch_training,
)
from autoencoder_based_image_compression_tpu.train.state import init_train_state
from autoencoder_based_image_compression_tpu.train.step import make_step_fns

GAMMA = 10000.0


def _setup(seed=0):
    state = init_train_state(jax.random.PRNGKey(seed), GAMMA, bin_width_init=1.0,
                             learn_bin_widths=True, max_itvs=16)
    step_fns = make_step_fns(GAMMA, True, max_itvs=16, donate=False)
    rng = numpy.random.default_rng(seed)
    dataset = rng.integers(0, 256, size=(8, 32, 32, 1)).astype(numpy.uint8)
    return (state, step_fns, dataset)


def test_single_scan_step_matches_train_step():
    """One scan iteration == one train_step call (same key schedule).

    Single step only: over several steps Adam's rsqrt amplifies
    scan-vs-loop float32 reduction-order noise on near-zero gradients
    into visible parameter drift (cf. tests/test_parallel.py), so exact
    trajectory comparison is only meaningful for one step.
    """
    (state, step_fns, dataset) = _setup()
    key = jax.random.PRNGKey(7)
    rows = numpy.arange(2, dtype=numpy.int32).reshape(1, 2)

    scanned = step_fns["train_epoch"](state, jnp.asarray(dataset),
                                      jnp.asarray(rows), key)
    (step_key,) = jax.random.split(key, 1)
    sequential = step_fns["train_step"](state, jnp.asarray(dataset[rows[0]]),
                                        step_key)

    assert int(scanned.step) == int(sequential.step) == 1
    # Identical math up to float32 reduction order; assert per leaf
    # relative to the LEAF's scale (per-element rtol trips on the
    # near-zero entries of the Adam moments).
    for (a, b) in zip(jax.tree_util.tree_leaves(scanned),
                      jax.tree_util.tree_leaves(sequential)):
        a = numpy.asarray(a, numpy.float64)
        b = numpy.asarray(b, numpy.float64)
        scale = numpy.abs(b).max() + 1e-6
        assert numpy.abs(a - b).max() <= 1e-4 * scale


def test_train_epoch_multi_step_trajectory_sane():
    """Several scanned steps: the state advances, stays finite, and the
    density table keeps its projections."""
    (state, step_fns, dataset) = _setup()
    rows = numpy.arange(8, dtype=numpy.int32).reshape(4, 2)
    out = step_fns["train_epoch"](state, jnp.asarray(dataset),
                                  jnp.asarray(rows), jax.random.PRNGKey(7))
    assert int(out.step) == 4
    for leaf in jax.tree_util.tree_leaves(out):
        assert numpy.all(numpy.isfinite(numpy.asarray(leaf, numpy.float64)))
    assert numpy.asarray(out.density.parameters).min() > 0.0


def test_run_epoch_training_uses_scan_and_advances():
    (state, step_fns, dataset) = _setup(1)
    dataset_dev = device_resident_dataset(dataset)
    out = run_epoch_training(dataset_dev, state, step_fns, batch_size=2,
                             nb_batches=4, key=jax.random.PRNGKey(3))
    assert int(out.step) == 4
    assert numpy.all(numpy.isfinite(numpy.asarray(out.bin_widths)))
