"""Imports reference TF checkpoints into this framework's state.

The reference ships no pretrained weights (``eae/results/`` is
gitignored), so reference parity either needs retraining or a weight
importer; this is the importer (SURVEY.md section 7, "hard parts": it
turns the 0.05 dB parity gate from a training-reproduction problem into
a numerics problem).

Variable-name map (reference ``eae/graph/EntropyAutoencoder.py:108-230``):

    encoder/weights_{1..3}, biases_{1..3}, gamma_{1..3}, beta_{1..3}
    decoder/weights_{4..6}, biases_{4..5}, gamma_{4..6}, beta_{4..6}
    piecewise_linear_function/{bin_widths, parameters,
                               nb_intervals_per_side, grid}
    decaying_lr/global_step

The reference's live-sized density ``parameters`` tensor embeds into
the fixed-capacity table centered at ``ppi*max_itvs``; ``grid`` is
implied by the table geometry and only validated.
"""

import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.ops import density as dens

_ENCODER_KEYS = ["weights_1", "biases_1", "gamma_1", "beta_1",
                 "weights_2", "biases_2", "gamma_2", "beta_2",
                 "weights_3", "biases_3", "gamma_3", "beta_3"]
_DECODER_KEYS = ["gamma_4", "beta_4", "weights_4", "biases_4",
                 "gamma_5", "beta_5", "weights_5", "biases_5",
                 "gamma_6", "beta_6", "weights_6"]


def read_tf_checkpoint(path_to_ckpt):
    """Reads all variables of a TF checkpoint into {name: numpy array}."""
    from tensorflow.python.training import py_checkpoint_reader

    reader = py_checkpoint_reader.NewCheckpointReader(path_to_ckpt)
    return {name: reader.get_tensor(name)
            for name in reader.get_variable_to_shape_map()}


def import_reference_variables(variables, ppi=csts.NB_POINTS_PER_INTERVAL,
                               max_itvs=csts.MAX_ITVS_PER_SIDE):
    """Converts a reference variable dict into (params, density, bin_widths, step).

    ``variables`` maps TF variable names (without the ``:0`` suffix) to
    numpy arrays - either from :func:`read_tf_checkpoint` or from an
    ``.npz`` exported elsewhere. The learned-vs-fixed-bin-width
    architecture is inferred from the presence of ``encoder/gamma_3``.
    """
    import jax.numpy as jnp

    def get(name):
        if name not in variables:
            raise KeyError(f"reference checkpoint is missing variable {name!r}.")
        return jnp.asarray(numpy.asarray(variables[name], dtype=numpy.float32))

    learn_bin_widths = "encoder/gamma_3" not in variables
    params = {}
    for key in _ENCODER_KEYS:
        if learn_bin_widths and key in ("gamma_3", "beta_3"):
            continue
        params[key] = get(f"encoder/{key}")
    for key in _DECODER_KEYS:
        if learn_bin_widths and key in ("gamma_4", "beta_4"):
            continue
        params[key] = get(f"decoder/{key}")

    bin_widths = get("piecewise_linear_function/bin_widths")
    live_parameters = numpy.asarray(
        variables["piecewise_linear_function/parameters"], dtype=numpy.float32)
    nb_itvs = int(numpy.asarray(
        variables["piecewise_linear_function/nb_intervals_per_side"]))
    if nb_itvs > max_itvs:
        raise ValueError(
            f"checkpoint grid ({nb_itvs} intervals/side) exceeds the table "
            f"capacity ({max_itvs}); raise max_itvs.")
    expected_width = 2 * ppi * nb_itvs + 1
    if live_parameters.shape[1] != expected_width:
        raise ValueError(
            f"density parameters have width {live_parameters.shape[1]}, "
            f"expected {expected_width} for {nb_itvs} intervals/side.")

    # Embed the live table into the fixed-capacity table.
    nb_maps = live_parameters.shape[0]
    width = dens.table_width(ppi, max_itvs)
    center = ppi * max_itvs
    table = numpy.full((nb_maps, width), csts.LOW_PROJECTION, dtype=numpy.float32)
    table[:, center - ppi * nb_itvs:center + ppi * nb_itvs + 1] = live_parameters
    density = dens.DensityTable(
        parameters=jnp.asarray(table),
        nb_itvs_per_side=jnp.asarray(nb_itvs, jnp.int32))

    step = int(numpy.asarray(variables.get("decaying_lr/global_step", 0)))
    return {
        "params": params,
        "density": density,
        "bin_widths": bin_widths,
        "step": step,
        "learn_bin_widths": learn_bin_widths,
    }


def import_reference_checkpoint(path_to_ckpt, **kwargs):
    """TF checkpoint file -> (params, density, bin_widths, step) dict."""
    return import_reference_variables(read_tf_checkpoint(path_to_ckpt), **kwargs)
