"""Throughput / scaling / parity / profiling benchmark CLI.

The measurement machinery the reference lacks (SURVEY.md section 6):

- ``parity``: fp32 parity path vs int8/bf16 fast path (Mpix/s each +
  PSNR between their reconstructions)
- ``scaling``: data-parallel roundtrip throughput over 1..N-device
  meshes (real scaling numbers on multi-chip hardware; functional
  validation on the virtual CPU platform)
- ``profile``: writes a ``jax.profiler`` trace for per-kernel roofline
  inspection
"""

import argparse
import json

import jax
import numpy

from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()


def main(args=None):
    parser = argparse.ArgumentParser(description="Benchmarks.")
    parser.add_argument("command", choices=["parity", "scaling", "profile"])
    parser.add_argument("--nb_images", type=int, default=24)
    parser.add_argument("--height", type=int, default=512)
    parser.add_argument("--width", type=int, default=768)
    parser.add_argument("--per_device_batch", type=int, default=4)
    parser.add_argument("--model_parallelism", type=int, default=1)
    parser.add_argument("--trace_dir", default="/tmp/aeic_trace")
    parser.add_argument("--checkpoint", default="",
                        help="optional trained checkpoint (npz prefix)")
    parser.add_argument("--gamma", type=float, default=10000.0)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU platform (e.g. with "
                             "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
                             "for virtual multi-device runs)")
    args = parser.parse_args(args)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.checkpoint:
        from autoencoder_based_image_compression_tpu.train.checkpoint import (
            load_checkpoint)
        from autoencoder_based_image_compression_tpu.train.state import (
            init_train_state)

        template = init_train_state(jax.random.PRNGKey(0), args.gamma, 1.0, True)
        state = load_checkpoint(args.checkpoint, template)
        (params, bin_widths) = (state.params, numpy.asarray(state.bin_widths))
    else:
        params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
        bin_widths = numpy.ones(128, numpy.float32)

    rng = numpy.random.default_rng(0)
    images = rng.integers(16, 236, size=(args.nb_images, args.height, args.width, 1)
                          ).astype(numpy.uint8)

    if args.command == "parity":
        from autoencoder_based_image_compression_tpu.eval.throughput import (
            parity_and_throughput)

        print(json.dumps(parity_and_throughput(params, images, bin_widths)))
    elif args.command == "scaling":
        from autoencoder_based_image_compression_tpu.eval.throughput import (
            scaling_report)

        report = scaling_report(params, bin_widths, (args.height, args.width),
                                args.per_device_batch, args.model_parallelism)
        print(json.dumps(report))
    else:
        from autoencoder_based_image_compression_tpu.eval.throughput import (
            profile_roundtrip)

        trace = profile_roundtrip(params, images[:4], bin_widths, args.trace_dir)
        print(f"trace written to {trace}")


if __name__ == "__main__":
    main()
