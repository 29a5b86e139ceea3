"""Sharding specifications for the training state and batches.

Weights are replicated (1.76M parameters - replication is free compared
to any gather traffic); the density table and bin widths shard over the
``model`` axis by latent map (their math is exactly per-map
independent); batches shard over ``data``. XLA/GSPMD then derives every
intermediate sharding and inserts psums for the scalar losses.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    """NHWC image batches shard over the leading (batch) axis."""
    return NamedSharding(mesh, P("data", None, None, None))


def density_sharding(mesh):
    """Density table (nb_maps, W) shards its map rows over ``model``."""
    return NamedSharding(mesh, P("model", None))


def bin_widths_sharding(mesh):
    return NamedSharding(mesh, P("model"))


def state_shardings(mesh, state):
    """Pytree of NamedShardings matching a :class:`TrainState`.

    Params and optimizer state replicate; density parameters and bin
    widths shard per map over ``model``.
    """
    rep = replicated(mesh)
    shardings = jax.tree_util.tree_map(lambda _: rep, state)
    return shardings._replace(
        density=shardings.density._replace(parameters=density_sharding(mesh)),
        bin_widths=bin_widths_sharding(mesh),
    )
