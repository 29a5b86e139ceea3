"""Checkpoint / resume for multi-part training.

The reference splits long trainings into resumable parts because
cluster breakdowns are anticipated (``eae/graph/EntropyAutoencoder.py:13-17``,
``training_eae_imagenet.py:75-96``), persisting a TF checkpoint *plus* a
separately-pickled grid length - the grid length is graph-shape-affecting
state there (``EntropyAutoencoder.py:81-94``). In the TPU framework the
density table has a static shape, so the live extent is just another
array leaf and the whole :class:`TrainState` round-trips through a
single ``.npz`` file.

Leaves are keyed by their *tree path* (the way TF checkpoints key by
variable name), not by flattening order: many leaves share a shape (all
GDN gammas are (128, 128)), so order-indexed storage would let a dict
reordering or key rename silently swap tensors. A renamed or missing
key fails loudly at load.

Refusal to overwrite an existing checkpoint (the reference's guard at
``training_eae_imagenet.py:89-96``) is preserved via ``allow_overwrite``.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy


def _path_keys(tree):
    """[(key_string, leaf)] with keys from the pytree paths."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(jax.tree_util.keystr(path), leaf) for (path, leaf) in flat]


def save_checkpoint(path, state, allow_overwrite=False):
    """Serializes a state pytree to ``<path>.npz`` (+ ``<path>.json`` meta)."""
    npz_path = path + ".npz"
    if os.path.isfile(npz_path) and not allow_overwrite:
        raise FileExistsError(
            f"{npz_path} already exists; refusing to overwrite a checkpoint.")
    arrays = {key: numpy.asarray(leaf) for (key, leaf) in _path_keys(state)}
    os.makedirs(os.path.dirname(npz_path) or ".", exist_ok=True)
    numpy.savez(npz_path, **arrays)
    meta = {
        "nb_leaves": len(arrays),
        "step": int(numpy.asarray(state.step)),
        "nb_itvs_per_side": int(numpy.asarray(state.density.nb_itvs_per_side)),
        # Per-epoch saves are intermediate until the training part
        # finishes and calls mark_checkpoint_complete.
        "part_complete": False,
    }
    with open(path + ".json", "w") as file:
        json.dump(meta, file, indent=2)


def load_checkpoint(path, template):
    """Restores a state saved by :func:`save_checkpoint`.

    ``template`` is a state with the same structure (e.g. from
    :func:`init_train_state` with the same experiment configuration);
    its tree paths select the stored arrays, so a renamed, missing or
    reshaped leaf raises instead of silently mapping to another tensor.

    A ``<path>.npz`` without its ``<path>.json`` sidecar is refused:
    :func:`save_checkpoint` writes the npz first and the meta last, so
    a missing sidecar means the writer died mid-save and the npz may be
    truncated (the reference's refuse-don't-guess discipline,
    ``training_eae_imagenet.py:89-96``).
    """
    if not os.path.isfile(path + ".json"):
        raise FileNotFoundError(
            f"{path}.json is missing: {path}.npz is a half-written "
            "checkpoint (the meta sidecar is written last). Delete the "
            "leftover npz and resume from the previous part.")
    data = numpy.load(path + ".npz")
    stored = set(data.files)
    (flat, treedef) = jax.tree_util.tree_flatten_with_path(template)
    wanted = [jax.tree_util.keystr(p) for (p, _) in flat]
    missing = [k for k in wanted if k not in stored]
    extra = sorted(stored - set(wanted))
    if missing or extra:
        raise ValueError(
            "Checkpoint/template key mismatch. Missing from checkpoint: "
            f"{missing}; unexpected in checkpoint: {extra}.")
    new_leaves = []
    for (key, leaf) in zip(wanted, (leaf for (_, leaf) in flat)):
        arr = data[key]
        if tuple(arr.shape) != tuple(numpy.shape(leaf)):
            raise ValueError(
                f"Leaf {key}: checkpoint shape {arr.shape} != template shape "
                f"{numpy.shape(leaf)}.")
        new_leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def checkpoint_exists(path):
    """True when ``<path>.npz`` is on disk."""
    return os.path.isfile(path + ".npz")


def mark_checkpoint_complete(path):
    """Stamps ``<path>.json`` as the END of a finished training part.

    The training CLIs save a checkpoint after every epoch (so a crash
    loses at most one epoch), which means mere existence cannot
    distinguish a finished part from an interrupted one; resumable
    drivers check :func:`checkpoint_part_complete` before skipping."""
    meta_path = path + ".json"
    with open(meta_path) as file:
        meta = json.load(file)
    meta["part_complete"] = True
    with open(meta_path, "w") as file:
        json.dump(meta, file, indent=2)


def checkpoint_part_complete(path):
    """True when the part that produced ``<path>`` ran to completion.

    A missing ``<path>.json`` sidecar means the save was interrupted
    between the npz and the meta write (the meta is written last) - the
    part is NOT complete, and resumable drivers clean such leftovers
    instead of picking up a possibly-truncated npz."""
    meta_path = path + ".json"
    if not os.path.isfile(meta_path):
        return False
    with open(meta_path) as file:
        return bool(json.load(file).get("part_complete", True))


def save_params_artifact(path_npz, params, bin_widths, step=None):
    """Compressed params-only export (no optimizer/density state).

    Small enough to version-control; the benchmark and parity harnesses
    load it so their numbers are grounded in trained weights instead of
    random init. ``step`` records the training step the params came
    from, so consumers that pair this artifact with other per-model
    artifacts (e.g. the extra-set coding statistics) can detect a
    mismatched pair instead of silently benchmarking stale rates.
    """
    arrays = {f"param:{key}": numpy.asarray(value)
              for (key, value) in params.items()}
    arrays["bin_widths"] = numpy.asarray(bin_widths)
    if step is not None:
        arrays["step"] = numpy.asarray(int(step), dtype=numpy.int64)
    os.makedirs(os.path.dirname(path_npz) or ".", exist_ok=True)
    numpy.savez_compressed(path_npz, **arrays)


def load_params_artifact(path_npz):
    """Loads a :func:`save_params_artifact` export.

    Returns ``(params_dict, bin_widths)`` (jnp arrays).
    """
    data = numpy.load(path_npz)
    params = {key[len("param:"):]: jnp.asarray(data[key])
              for key in data.files if key.startswith("param:")}
    return (params, jnp.asarray(data["bin_widths"]))


def params_artifact_step(path_npz):
    """Training step recorded in a params artifact, or None (old export)."""
    data = numpy.load(path_npz)
    return int(data["step"]) if "step" in data.files else None
