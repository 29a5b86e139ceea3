"""Piecewise-linear latent density model with a static-shape parameter table.

The reference fits, per latent feature map, a piecewise-linear pdf
sampled on a symmetric grid, and *grows the grid at runtime* whenever a
latent overflows it (``kodak_tensorflow/tfutils/tfutils.py:95-153``
``approximate_probability``, ``:223-299`` ``expand_all``,
``:301-361`` ``expand_parameters``; dynamic tensor shape via
``validate_shape=False`` in ``eae/graph/EntropyAutoencoder.py:126-129``).

XLA compiles one static graph, so dynamic tensor growth is replaced by a
**fixed-capacity table**: parameters are pre-allocated for
``max_itvs_per_side`` unit intervals per side, the live half-width is a
traced scalar ``nb_itvs_per_side``, and cells outside the live extent
are pinned at ``LOW_PROJECTION``. "Expansion" then reduces to bumping
the scalar - the newly activated cells already hold ``LOW_PROJECTION``,
exactly the value the reference pads with. This keeps the entire
training step inside one ``jit`` with zero recompilation.

Table geometry: width ``W = 2*ppi*max_itvs + 1`` sampling points; the
cell at index ``i`` sits at grid position ``(i - C)/ppi`` where
``C = ppi*max_itvs`` is the (static) center. The reference's
``index_linear_piece`` (``tfutils.py:399-443``) maps a sample ``x`` to
``floor(ppi*x) + ppi*nb_itvs`` in its live-sized table; here the same
piece lands at ``floor(ppi*x) + C`` - identical arithmetic, shifted by a
static offset.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu import constants as csts


class DensityTable(NamedTuple):
    """Pytree holding the density-model state.

    Attributes
    ----------
    parameters : jnp.ndarray
        Shape ``(nb_maps, W)`` float32 - per-map pdf samples. Cells
        outside the live extent are pinned at ``LOW_PROJECTION``.
    nb_itvs_per_side : jnp.ndarray
        int32 scalar - live number of unit intervals per side
        (the reference's separately-pickled ``nb_intervals_per_side``,
        ``EntropyAutoencoder.py:112-115``).
    """

    parameters: jnp.ndarray
    nb_itvs_per_side: jnp.ndarray


def table_width(ppi, max_itvs):
    """Number of sampling points of the fixed-capacity table."""
    return 2 * ppi * max_itvs + 1


def table_grid(ppi, max_itvs):
    """Static sampling-point positions: ``grid[i] = (i - C)/ppi``."""
    width = table_width(ppi, max_itvs)
    return (numpy.arange(width, dtype=numpy.float32) - ppi * max_itvs) / ppi


def active_mask(nb_itvs_per_side, ppi, max_itvs, dtype=jnp.float32):
    """1.0 on the live cells ``|i - C| <= ppi*nb_itvs``, 0.0 outside."""
    width = table_width(ppi, max_itvs)
    center = ppi * max_itvs
    offsets = jnp.abs(jnp.arange(width, dtype=jnp.int32) - center)
    return (offsets <= ppi * nb_itvs_per_side).astype(dtype)


def init_density_table(nb_maps, ppi=csts.NB_POINTS_PER_INTERVAL,
                       max_itvs=csts.MAX_ITVS_PER_SIDE,
                       nb_itvs_init=csts.NB_ITVS_PER_SIDE_INIT):
    """Cauchy-pdf initialization on the live cells, floor outside.

    Reference init: ``tools.tile_cauchy`` over the initial grid
    (``EntropyAutoencoder.py:126-129``, ``tools/tools.py:1134``);
    expansion padding value from ``tfutils.py:341-361``.
    """
    grid = table_grid(ppi, max_itvs)
    pdf = (1.0 / (numpy.pi * (1.0 + grid ** 2))).astype(numpy.float32)
    nb_itvs = jnp.asarray(nb_itvs_init, jnp.int32)
    mask = active_mask(nb_itvs, ppi, max_itvs)
    parameters = jnp.where(mask > 0, jnp.asarray(pdf), csts.LOW_PROJECTION)
    parameters = jnp.tile(parameters[None, :], (nb_maps, 1))
    return DensityTable(parameters=parameters, nb_itvs_per_side=nb_itvs)


def index_linear_piece(samples, ppi, max_itvs):
    """Left-cell index of the linear piece containing each sample.

    Reference ``tfutils.py:399-443`` computes
    ``floor(ppi*x) + ppi*nb_itvs`` and asserts it lies inside the live
    table; here the index is anchored at the static center and clipped
    into the table (expansion keeps live samples in-bounds, the clip
    guards the pathological overflow-of-capacity case).
    """
    center = ppi * max_itvs
    idx = jnp.floor(ppi * samples).astype(jnp.int32) + center
    return jnp.clip(idx, 0, table_width(ppi, max_itvs) - 2)


def approximate_probability(samples, parameters, ppi, max_itvs):
    """Linear interpolation of each per-map pdf at the sample positions.

    Parameters
    ----------
    samples : jnp.ndarray
        Shape ``(nb_maps, n)`` - row i holds samples attributed to the
        ith piecewise-linear pdf.
    parameters : jnp.ndarray
        Shape ``(nb_maps, W)`` density table.

    Reference ``tfutils.py:95-153`` (flattened-gather formulation).
    """
    idx = index_linear_piece(samples, ppi, max_itvs)
    left = jnp.take_along_axis(parameters, idx, axis=1)
    right = jnp.take_along_axis(parameters, idx + 1, axis=1)
    left_bound = jnp.floor(ppi * samples) / ppi
    return (right - left) * (samples - left_bound) * ppi + left


def differential_entropy(approximate_prob):
    """Per-map differential entropy estimate: ``mean(-log2 p)`` per row.

    Reference ``tfutils.py:198-221``.
    """
    return jnp.mean(-jnp.log(approximate_prob) / jnp.log(2.0), axis=1)


def approximate_entropy_per_map(approximate_prob, bin_widths):
    """Per-map approximate entropy, UNCLAMPED.

    Per map: differential entropy of the noisy latents minus
    ``log2(bin_width)`` (reference ``tfutils.py:45-93``). The reference
    asserts non-negativity; here negative values are returned as-is so
    the training monitor can surface the violation
    (``cli/train_eae.py``).
    """
    diff_entropies = differential_entropy(approximate_prob)
    return diff_entropies - jnp.log(jnp.asarray(bin_widths)) / jnp.log(2.0)


def approximate_entropy(approximate_prob, bin_widths):
    """Cumulated approximate entropy of the quantized latents.

    Sum over maps of the clamped per-map entropies (reference
    ``tfutils.py:45-93``). The reference asserts non-negativity per map;
    in-jit we clamp instead, and the training loop monitors the
    unclamped :func:`approximate_entropy_per_map` for violations.
    """
    approx = approximate_entropy_per_map(approximate_prob, bin_widths)
    return jnp.sum(jnp.maximum(approx, 0.0))


def loss_density_approximation(approximate_prob, parameters, mask, ppi):
    """MISE surrogate fitting loss of the piecewise-linear pdfs.

    ``sum_i (-2*mean_j p_ij + sum_k (mask_k*params_ik)^2 / ppi)``
    (reference ``tfutils.py:511-552``). The mask restricts the
    quadratic term to the live cells, matching the live-sized table of
    the reference.
    """
    mean_prob = jnp.mean(approximate_prob, axis=1)
    sum_sq = jnp.sum(jnp.square(parameters * mask), axis=1)
    return jnp.sum(-2.0 * mean_prob + sum_sq / ppi)


def area_under_piecewise_linear_functions(parameters, nb_itvs_per_side, ppi, max_itvs):
    """Trapezoidal area under each live pdf (training diagnostic).

    Reference ``tfutils.py:155-196``: ``0.5*(first + last + 2*middle)/ppi``
    over the live cells; expressed here as a masked weighted sum with
    half-weight endpoints.
    """
    width = table_width(ppi, max_itvs)
    center = ppi * max_itvs
    offsets = jnp.abs(jnp.arange(width, dtype=jnp.int32) - center)
    extent = ppi * nb_itvs_per_side
    weights = jnp.where(offsets == extent, 0.5, 1.0) * (offsets <= extent)
    return jnp.sum(parameters * weights[None, :], axis=1) / ppi


def expand_table(table, max_abs, ppi, max_itvs):
    """Expands the live extent when ``max_abs`` reaches the boundary.

    ``max_abs`` is the largest absolute latent plus half the largest bin
    width. When ``max_abs >= nb_itvs``, the live extent grows to
    ``ceil(max_abs) + 1`` intervals per side (reference
    ``tfutils.py:223-299``: ``nb_added = ceil(max_abs) - nb_itvs + 1``).
    The newly activated cells already hold ``LOW_PROJECTION`` - the
    reference's padding value - so only the scalar moves. Growth
    saturates at the static capacity ``max_itvs``; the training loop
    monitors saturation on the host.
    """
    nb_itvs = table.nb_itvs_per_side
    is_expansion = max_abs >= nb_itvs.astype(max_abs.dtype)
    grown = jnp.ceil(max_abs).astype(jnp.int32) + 1
    new_nb = jnp.where(is_expansion, jnp.maximum(grown, nb_itvs), nb_itvs)
    new_nb = jnp.minimum(new_nb, max_itvs)
    return table._replace(nb_itvs_per_side=new_nb)


def project_density_parameters(parameters, mask):
    """Clamps live cells to ``>= LOW_PROJECTION`` and re-pins dead cells.

    Reference projection ``EntropyAutoencoder.py:290-293``; the second
    clause maintains the fixed-table invariant that inactive cells hold
    exactly the expansion padding value.
    """
    return jnp.where(mask > 0,
                     jnp.maximum(parameters, csts.LOW_PROJECTION),
                     csts.LOW_PROJECTION)
