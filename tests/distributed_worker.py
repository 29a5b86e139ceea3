"""Worker process for the multi-host (multi-process) distributed test.

Launched by ``tests/test_distributed.py`` as N separate Python
processes, each emulating one host with 4 virtual CPU devices. The
workers join a jax.distributed coordination service, build a global
(data, model) mesh spanning both processes, run two sharded training
steps where each process feeds ONLY its own half of the global batch,
and print a parameter checksum - the parent asserts every process
computed the identical global result.

Usage: python distributed_worker.py <coordinator> <num_processes> <process_id>
"""

import os
import sys

# Must precede any jax import: each worker is one "host" with 4 devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
os.environ.setdefault("JAX_ENABLE_COMPILATION_CACHE", "false")


def main():
    (coordinator, num_processes, process_id) = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    # A sitecustomize module may have imported jax at interpreter
    # startup, latching the platform before this file's env vars took
    # effect (same workaround as tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

    import numpy

    from autoencoder_based_image_compression_tpu.parallel import distributed
    from autoencoder_based_image_compression_tpu.parallel.train_parallel import (
        make_sharded_step_fns,
    )
    from autoencoder_based_image_compression_tpu.train.state import init_train_state

    distributed.initialize(coordinator, num_processes, process_id,
                           initialization_timeout=120)
    assert jax.process_count() == num_processes
    assert jax.device_count() == 4 * num_processes

    mesh = distributed.make_global_mesh(model_parallelism=2)
    assert mesh.devices.shape == (2 * num_processes, 2)
    # The model axis must not cross a process (DCN) boundary.
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, (
            "model axis crosses a host boundary")

    gamma = 10000.0
    state = init_train_state(jax.random.PRNGKey(0), gamma, bin_width_init=1.0,
                             learn_bin_widths=True, max_itvs=16)
    state = distributed.global_state(state, mesh)
    fns = make_sharded_step_fns(gamma, learn_bin_widths=True, mesh=mesh,
                                state_template=state, max_itvs=16)

    # Global batch of 8 x 32x32 luminance crops; each process loads only
    # its own half (the batch router under test). Data is a function of
    # the GLOBAL example index, so the assembled global batch - hence the
    # data-parallel gradient psum - is identical no matter which process
    # feeds which shard.
    rng = numpy.random.default_rng(7)
    global_images = rng.integers(0, 256, size=(8, 32, 32, 1)).astype(numpy.float32)
    per_process = global_images.shape[0] // num_processes
    local = global_images[process_id * per_process:(process_id + 1) * per_process]
    batch = distributed.global_batch(local, mesh)
    assert batch.shape == global_images.shape

    for step_index in range(2):
        state = fns["train_step"](state, batch, jax.random.PRNGKey(step_index))
    jax.block_until_ready(state)

    assert int(distributed.fetch_replicated(state.step)) == 2
    # Params are replicated - free local fetch. Bin widths are sharded
    # over the model axis, so replicate them first (a real cross-device
    # allgather) before fetching.
    params = distributed.fetch_replicated(state.params)
    checksum = float(sum(numpy.abs(leaf).sum()
                         for leaf in jax.tree_util.tree_leaves(params)))
    from jax.sharding import NamedSharding, PartitionSpec

    gather = jax.jit(lambda x: x,
                     out_shardings=NamedSharding(mesh, PartitionSpec()))
    bw_checksum = float(numpy.abs(
        distributed.fetch_replicated(gather(state.bin_widths))).sum())
    assert distributed.agree_across_processes(numpy.float64(checksum))
    print(f"CHECKSUM {checksum:.10e} {bw_checksum:.10e}", flush=True)


if __name__ == "__main__":
    main()
