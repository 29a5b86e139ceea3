"""Model-inspection artifacts from a trained checkpoint.

Counterpart of the reference's ``checking_*`` hooks
(``EntropyAutoencoder.py:591-745``): normed histograms of the noisy
latents overlaid with the fitted pdfs (``checking_activations_1``),
latent-map mosaics (``checking_activations_2``), first/last conv-filter
mosaics (``checking_p_2``), GDN weight images (``checking_p_3``), and
the histogram of areas under the piecewise-linear pdfs
(``checking_area_under_piecewise_linear_functions``).
"""

import argparse
import os

import jax
import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.eval import visualization as viz
from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops import density as dens
from autoencoder_based_image_compression_tpu.ops.quantization import add_uniform_noise
from autoencoder_based_image_compression_tpu.train.checkpoint import load_checkpoint
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
    parser = argparse.ArgumentParser(description="Model visualization artifacts.")
    parser.add_argument("bin_width_init", type=float_strictly_positive)
    parser.add_argument("gamma", type=float_strictly_positive)
    parser.add_argument("idx_training", type=int_positive)
    parser.add_argument("--learn_bin_widths", action="store_true")
    parser.add_argument("--path_to_images", default="data/kodak/kodak.npy")
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--out_dir", default="results/visualization")
    parser.add_argument("--nb_maps_histograms", type=int, default=4)
    args = parser.parse_args(args)

    template = init_train_state(jax.random.PRNGKey(0), args.gamma,
                                args.bin_width_init, args.learn_bin_widths)
    exp_dir = os.path.join(args.results_root,
                           experiment_suffix(args.bin_width_init, args.gamma,
                                             args.learn_bin_widths))
    state = load_checkpoint(os.path.join(exp_dir, f"model_{args.idx_training}"),
                            template)
    os.makedirs(args.out_dir, exist_ok=True)

    images = numpy.load(args.path_to_images)[:2]
    if images.ndim == 3:
        images = images[..., None]
    batch = images.astype(numpy.float32)
    y = numpy.asarray(conv_eae.encode(state.params, batch, args.learn_bin_widths))
    y_tilde = numpy.asarray(add_uniform_noise(jax.random.PRNGKey(1), y,
                                              state.bin_widths))

    # Latent histograms + fitted pdfs (checking_activations_1).
    grid = dens.table_grid(csts.NB_POINTS_PER_INTERVAL, csts.MAX_ITVS_PER_SIDE)
    nb = args.nb_maps_histograms
    viz.normed_histogram(
        y_tilde[..., :nb], grid, numpy.asarray(state.density.parameters)[:nb],
        [f"noisy latent map {i}" for i in range(nb)],
        [os.path.join(args.out_dir, f"histogram_map_{i}.png") for i in range(nb)])

    # Latent mosaics (checking_activations_2).
    for i in range(y.shape[0]):
        viz.visualize_representation(y[i], 8,
                                     os.path.join(args.out_dir, f"latents_{i}.png"))

    # Filter mosaics (checking_p_2) for the image-facing conv layers.
    viz.visualize_weights(numpy.asarray(state.params["weights_1"]), 8,
                          os.path.join(args.out_dir, "weights_encoder.png"))
    viz.visualize_weights(numpy.asarray(state.params["weights_6"]), 8,
                          os.path.join(args.out_dir, "weights_decoder.png"))

    # GDN weight images (checking_p_3).
    for i in (1, 2, 5, 6):
        gamma = numpy.asarray(state.params[f"gamma_{i}"])
        lo, hi = gamma.min(), gamma.max()
        image = numpy.round(255.0 * (gamma - lo) / (hi - lo)).astype(numpy.uint8)
        save_image(os.path.join(args.out_dir, f"gdn_gamma_{i}.png"), image)

    # Areas under the live pdfs (checking_area...).
    areas = numpy.asarray(dens.area_under_piecewise_linear_functions(
        state.density.parameters, state.density.nb_itvs_per_side,
        csts.NB_POINTS_PER_INTERVAL, csts.MAX_ITVS_PER_SIDE))
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.hist(areas, bins=30)
    plt.title("areas under the piecewise-linear pdfs")
    plt.savefig(os.path.join(args.out_dir, "pdf_areas.png"))
    plt.clf()
    print(f"visualization artifacts written to {args.out_dir}")


if __name__ == "__main__":
    main()
