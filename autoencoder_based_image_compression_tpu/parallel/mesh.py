"""Device-mesh construction.

Axis convention (BASELINE.json north star, SURVEY.md section 5.8):

- ``data``  - image-batch data parallelism. On a multi-host pod this is
  the outer axis laid over DCN (hosts) x ICI (chips within a host).
- ``model`` - latent-map / channel parallelism (density table rows, GDN
  channel blocks), kept within a host so its collectives ride ICI.

The workload has no inter-layer pipeline (3 convs) and no attention, so
``data`` x ``model`` covers the useful parallelism; spatial sharding of
large images reuses the ``model`` axis in the inference engine.
"""

import jax
import numpy


def mesh_shape_for(nb_devices, model_parallelism=1):
    """(data, model) shape using every device."""
    if nb_devices % model_parallelism != 0:
        raise ValueError(
            f"{nb_devices} devices are not divisible by model_parallelism="
            f"{model_parallelism}.")
    return (nb_devices // model_parallelism, model_parallelism)


def make_mesh(model_parallelism=1, devices=None):
    """Builds a ``Mesh`` with axes ``("data", "model")``.

    ``devices`` defaults to all local devices. The device list is laid
    out so adjacent model-axis devices are physically adjacent
    (consecutive in the default device order), keeping model collectives
    on the fastest links.
    """
    devices = jax.devices() if devices is None else devices
    (n_data, n_model) = mesh_shape_for(len(devices), model_parallelism)
    grid = numpy.asarray(devices).reshape(n_data, n_model)
    return jax.sharding.Mesh(grid, ("data", "model"))
