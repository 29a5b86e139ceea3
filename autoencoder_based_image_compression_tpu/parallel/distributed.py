"""Multi-host (DCN) runtime: process init, global mesh, batch router.

The reference is strictly single-process - its only transports are the
filesystem and subprocesses (SURVEY.md section 2.4), and its only
cluster-awareness is resumable multi-part training
(``eae/graph/EntropyAutoencoder.py:13-17``). This module is the
green-field distributed layer the TPU design calls for:

- :func:`initialize` brings a process into the ``jax.distributed``
  coordination service (one process per host on a real pod).
- :func:`make_global_mesh` lays a ``(data, model)`` mesh over *all*
  processes' devices such that the ``model`` axis never crosses a host
  boundary: model collectives (density-table / bin-width per-map math)
  ride ICI, and only the data-parallel gradient psum crosses DCN.
- :func:`global_batch` / :func:`global_state` assemble
  multi-process global arrays from host-local data, so each host feeds
  only its own image shard (the multi-host batch router).

The sharded step functions themselves are unchanged
(``parallel/train_parallel.py``): they are pure jitted functions over
NamedShardings, so single-host and multi-host execution differ only in
the mesh handed to them.
"""

import jax
import numpy
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def initialize(coordinator_address, num_processes, process_id,
               local_device_ids=None, initialization_timeout=60):
    """Joins the jax.distributed coordination service.

    Call exactly once per process, before any other JAX API touches the
    backend. ``coordinator_address`` is ``"host:port"`` of process 0.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        initialization_timeout=initialization_timeout,
    )


def make_global_mesh(model_parallelism=1):
    """Builds a global ``(data, model)`` mesh over every process.

    Devices are grouped by owning process first, so a reshape to
    ``(n_data, model_parallelism)`` keeps each model group inside one
    process (``model_parallelism`` must divide the per-process device
    count). The data axis then spans processes - that is the axis whose
    collectives cross DCN.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_process = {}
    for device in devices:
        per_process.setdefault(device.process_index, []).append(device)
    counts = {len(v) for v in per_process.values()}
    if len(counts) != 1:
        raise ValueError(f"Uneven per-process device counts: {sorted(counts)}.")
    local_count = counts.pop()
    if local_count % model_parallelism != 0:
        raise ValueError(
            f"model_parallelism={model_parallelism} does not divide the "
            f"per-process device count {local_count}; the model axis would "
            "cross a host (DCN) boundary.")
    grid = numpy.asarray(devices).reshape(-1, model_parallelism)
    return Mesh(grid, ("data", "model"))


def global_batch(local_batch, mesh):
    """Assembles the global image batch from this process's local shard.

    Each process passes only the examples it loaded; the returned
    global ``jax.Array`` has leading dimension
    ``local_batch.shape[0] * num_processes_on_data_axis`` and is sharded
    ``P("data", ...)`` over the mesh. This is the router that replaces
    the reference's single-process ``feed_dict`` (``eae/batching.py:48``).
    """
    spec = P("data", *([None] * (numpy.ndim(local_batch) - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(sharding,
                                                  numpy.asarray(local_batch))


def put_global(host_value, sharding):
    """Places a host value (identical on every process) onto a global
    sharding, each process materializing only its addressable shards."""
    host_value = numpy.asarray(host_value)
    return jax.make_array_from_callback(
        host_value.shape, sharding, lambda index: host_value[index])


def global_state(state, mesh):
    """Multi-process version of ``train_parallel.shard_state``.

    Every process must hold the same host-side ``state`` (same PRNG
    seed or the same restored checkpoint - the multi-part resume
    artifacts of ``train/checkpoint.py`` are what make that true on a
    real pod). Each process materializes only its addressable shards.
    """
    from autoencoder_based_image_compression_tpu.parallel.sharding import (
        state_shardings,
    )

    return jax.tree_util.tree_map(put_global, state, state_shardings(mesh, state))


def fetch_replicated(tree):
    """Host-fetches fully-replicated global arrays (loss scalars etc.):
    every process owns a replica, so the fetch costs no cross-process
    traffic - it reads the first locally-addressable shard."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return numpy.asarray(x.addressable_data(0))
        return numpy.asarray(x)

    return jax.tree_util.tree_map(fetch, tree)


def agree_across_processes(value):
    """All-gathers a host scalar/array and checks every process sent the
    same value - the cheap cross-host consistency assertion used by the
    distributed tests (and available as a training-loop sanity hook)."""
    from jax.experimental import multihost_utils

    gathered = numpy.asarray(
        multihost_utils.process_allgather(numpy.asarray(value), tiled=False))
    return bool(numpy.all(gathered == gathered[0]))
