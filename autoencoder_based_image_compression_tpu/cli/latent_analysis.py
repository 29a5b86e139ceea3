"""Latent-analysis scripts: Laplace fits, activation probe, map masking.

Counterpart of ``kodak_tensorflow/fitting_eae_kodak.py`` (subcommand
``fit``), ``activating_eae.py`` (``activate`` - the
translation-covariance probe: one latent activated at two positions,
decoded at 256x256) and ``masking_eae_kodak.py`` (``mask`` - decode
with all maps but one frozen at their means).
"""

import argparse
import os

import jax
import numpy

from autoencoder_based_image_compression_tpu.eval import analysis
from autoencoder_based_image_compression_tpu.train.checkpoint import load_checkpoint
from autoencoder_based_image_compression_tpu.train.loop import encode_mini_batches
from autoencoder_based_image_compression_tpu.train.state import init_train_state
from autoencoder_based_image_compression_tpu.utils.image import save_image
from autoencoder_based_image_compression_tpu.utils.naming import experiment_suffix
from autoencoder_based_image_compression_tpu.utils.parsing import (
    float_strictly_positive,
    int_positive,
)
from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()


def main(args=None):
    parser = argparse.ArgumentParser(description="Latent analysis.")
    parser.add_argument("command", choices=["fit", "activate", "mask"])
    parser.add_argument("bin_width_init", type=float_strictly_positive)
    parser.add_argument("gamma", type=float_strictly_positive)
    parser.add_argument("idx_training", type=int_positive)
    parser.add_argument("--learn_bin_widths", action="store_true")
    parser.add_argument("--idx_map", type=int_positive, default=0)
    parser.add_argument("--activation_value", type=float, default=8.0)
    parser.add_argument("--path_to_kodak", default="data/kodak/kodak.npy")
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--out_dir", default="results/analysis")
    args = parser.parse_args(args)

    exp_dir = os.path.join(args.results_root,
                           experiment_suffix(args.bin_width_init, args.gamma,
                                             args.learn_bin_widths))
    template = init_train_state(jax.random.PRNGKey(0), args.gamma,
                                args.bin_width_init, args.learn_bin_widths)
    state = load_checkpoint(os.path.join(exp_dir, f"model_{args.idx_training}"),
                            template)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.command == "fit":
        images = numpy.load(args.path_to_kodak)
        images = images.reshape(images.shape[0], images.shape[1], images.shape[2], 1)
        y = encode_mini_batches(images, state.params, args.learn_bin_widths, 4)
        (locations, scales) = analysis.fit_maps(y)
        numpy.save(os.path.join(args.out_dir, "laplace_locations.npy"), locations)
        numpy.save(os.path.join(args.out_dir, "laplace_scales.npy"), scales)
        print(f"Laplace fits: location mean {locations.mean():.4f}, "
              f"scale mean {scales.mean():.4f}")
    elif args.command == "activate":
        map_mean = numpy.zeros(128, dtype=numpy.float32)
        for (tag, (row, col)) in [("pos0", (2, 2)), ("pos1", (8, 8))]:
            reconstruction = analysis.activate_latent_variable(
                state.params, args.learn_bin_widths, 16, 16, row, col,
                args.idx_map, args.activation_value, map_mean)
            save_image(os.path.join(
                args.out_dir, f"activation_map{args.idx_map}_{tag}.png"),
                reconstruction)
        print("activation probes written")
    else:  # mask
        images = numpy.load(args.path_to_kodak)[:4]
        images = images.reshape(4, images.shape[1], images.shape[2], 1)
        y = encode_mini_batches(images, state.params, args.learn_bin_widths, 4)
        map_mean = numpy.mean(y, axis=(0, 1, 2))
        masked = analysis.mask_maps(y, state.params, args.learn_bin_widths,
                                    args.idx_map, map_mean)
        for i in range(masked.shape[0]):
            save_image(os.path.join(
                args.out_dir, f"masked_map{args.idx_map}_image{i}.png"), masked[i])
        print("masked reconstructions written")


if __name__ == "__main__":
    main()
