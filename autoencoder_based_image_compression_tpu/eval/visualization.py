"""Training/eval visualization artifacts.

Re-design of the reference's matplotlib artifact system: normed latent
histograms overlaid with the fitted piecewise-linear pdfs
(``tools/tools.py:668-752``, ``EntropyAutoencoder.checking_activations_1``),
conv-filter mosaics (``tools.py:1332-1358``), latent-map mosaics
(``tools.py:1267-1290``), dead-maps-vs-rate plots
(``reconstructing_eae_kodak.py:245-287``) and loss curves
(``training_eae_imagenet.py:259-326``).
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy


def normed_histogram(data_per_map, grid, pdfs, titles, paths):
    """Normed histogram of each latent map overlaid with its fitted pdf.

    ``data_per_map[..., i]`` vs ``pdfs[i, :]`` sampled on ``grid``
    (reference ``tools/tools.py:668-752``).
    """
    nb = len(paths)
    for i in range(nb):
        plt.hist(numpy.asarray(data_per_map[..., i]).flatten(), bins=60, density=True)
        plt.plot(grid, pdfs[i, :], "r")
        plt.title(titles[i])
        plt.savefig(paths[i])
        plt.clf()


def visualize_weights(weights, nb_vertically, path):
    """Tiles conv filters (kh, kw, 1, nb) into one grayscale mosaic.

    Reference ``tools/tools.py:1332-1358``.
    """
    (kh, kw, _, nb) = weights.shape
    nb_horizontally = -(-nb // nb_vertically)
    mosaic = numpy.zeros(((kh + 1) * nb_vertically, (kw + 1) * nb_horizontally))
    for i in range(nb):
        (row, col) = (i % nb_vertically, i // nb_vertically)
        patch = weights[:, :, 0, i]
        lo, hi = patch.min(), patch.max()
        normed = (patch - lo) / (hi - lo) if hi > lo else numpy.zeros_like(patch)
        mosaic[row * (kh + 1):row * (kh + 1) + kh,
               col * (kw + 1):col * (kw + 1) + kw] = normed
    plt.imsave(path, mosaic, cmap="gray")


def visualize_representation(latents_hwc, nb_vertically, path):
    """Tiles the latent feature maps of one image into a mosaic.

    Reference ``tools/tools.py:1267-1290``.
    """
    (height, width, nb) = latents_hwc.shape
    nb_horizontally = -(-nb // nb_vertically)
    mosaic = numpy.zeros(((height + 1) * nb_vertically, (width + 1) * nb_horizontally))
    for i in range(nb):
        (row, col) = (i % nb_vertically, i // nb_vertically)
        patch = latents_hwc[:, :, i]
        lo, hi = patch.min(), patch.max()
        normed = (patch - lo) / (hi - lo) if hi > lo else numpy.zeros_like(patch)
        mosaic[row * (height + 1):row * (height + 1) + height,
               col * (width + 1):col * (width + 1) + width] = normed
    plt.imsave(path, mosaic, cmap="gray")


def plot_nb_dead_feature_maps(rates, nb_deads, path):
    """Dead-feature-map count vs rate (reference
    ``reconstructing_eae_kodak.py:245-287``)."""
    plt.plot(numpy.asarray(rates), numpy.asarray(nb_deads), "o-")
    plt.xlabel("rate (bpp)")
    plt.ylabel("number of dead feature maps")
    plt.title("Dead latent feature maps vs rate")
    plt.savefig(path)
    plt.clf()


def plot_training_curves(history, path):
    """Loss curves over epochs; ``history`` maps label -> list of values."""
    for (label, values) in history.items():
        plt.plot(numpy.arange(len(values)), numpy.asarray(values), label=label)
    plt.xlabel("epoch")
    plt.legend()
    plt.title("Training indicators")
    plt.savefig(path)
    plt.clf()
