"""Checkpoint / resume for multi-part training.

The reference splits long trainings into resumable parts because
cluster breakdowns are anticipated (``eae/graph/EntropyAutoencoder.py:13-17``,
``training_eae_imagenet.py:75-96``), persisting a TF checkpoint *plus* a
separately-pickled grid length - the grid length is graph-shape-affecting
state there (``EntropyAutoencoder.py:81-94``). In the TPU framework the
density table has a static shape, so the live extent is just another
array leaf and the whole :class:`TrainState` round-trips through a
single ``.npz`` file.

Refusal to overwrite an existing checkpoint (the reference's guard at
``training_eae_imagenet.py:89-96``) is preserved via ``allow_overwrite``.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy


def save_checkpoint(path, state, allow_overwrite=False):
    """Serializes a state pytree to ``<path>.npz`` (+ ``<path>.json`` meta)."""
    npz_path = path + ".npz"
    if os.path.isfile(npz_path) and not allow_overwrite:
        raise FileExistsError(
            f"{npz_path} already exists; refusing to overwrite a checkpoint.")
    leaves = jax.tree_util.tree_leaves(state)
    arrays = {f"leaf_{i}": numpy.asarray(leaf) for (i, leaf) in enumerate(leaves)}
    os.makedirs(os.path.dirname(npz_path) or ".", exist_ok=True)
    numpy.savez(npz_path, **arrays)
    meta = {
        "nb_leaves": len(leaves),
        "step": int(numpy.asarray(state.step)),
        "nb_itvs_per_side": int(numpy.asarray(state.density.nb_itvs_per_side)),
    }
    with open(path + ".json", "w") as file:
        json.dump(meta, file, indent=2)


def load_checkpoint(path, template):
    """Restores a state saved by :func:`save_checkpoint`.

    ``template`` is a state with the same structure (e.g. from
    :func:`init_train_state` with the same experiment configuration);
    its leaves provide the pytree structure and expected shapes.
    """
    (leaves, treedef) = jax.tree_util.tree_flatten(template)
    data = numpy.load(path + ".npz")
    if len(data.files) != len(leaves):
        raise ValueError(
            f"Checkpoint has {len(data.files)} leaves, template has {len(leaves)}.")
    new_leaves = []
    for (i, leaf) in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(numpy.shape(leaf)):
            raise ValueError(
                f"Leaf {i}: checkpoint shape {arr.shape} != template shape "
                f"{numpy.shape(leaf)}.")
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_exists(path):
    """True when ``<path>.npz`` is on disk."""
    return os.path.isfile(path + ".npz")
