"""Parallel/distributed layer: mesh, shardings, sharded train/inference.

Green-field work: the reference is single-process single-device
(SURVEY.md section 2.4 - no DP/TP/PP/EP, filesystem+subprocess as the
only transports). The TPU design follows BASELINE.json's north star:
weights replicated, image-batch data parallelism over the ``data`` axis,
latent-map/model parallelism over the ``model`` axis, spatial sharding
of the conv transforms over ICI with XLA-inserted halo exchanges.
"""

from autoencoder_based_image_compression_tpu.parallel.distributed import (
    agree_across_processes,
    fetch_replicated,
    global_batch,
    global_state,
    make_global_mesh,
)
from autoencoder_based_image_compression_tpu.parallel.mesh import (
    make_mesh,
    mesh_shape_for,
)
from autoencoder_based_image_compression_tpu.parallel.sharding import (
    batch_sharding,
    replicated,
    state_shardings,
)
