"""Trains / reconstructs / samples the SVHN variational autoencoder.

Counterpart of ``svhn/training_vae_svhn.py``, ``reconstructing_vae_svhn.py``
and ``generating_vae_svhn.py`` folded into one entry point with
subcommands.
"""

import argparse
import os

import jax
import numpy

from autoencoder_based_image_compression_tpu.data.svhn import (
    compute_preprocessing_stats,
    preprocess_svhn,
    synthetic_svhn,
)
from autoencoder_based_image_compression_tpu.models import vae
from autoencoder_based_image_compression_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from autoencoder_based_image_compression_tpu.utils.parsing import (
    float_strictly_positive,
    int_strictly_positive,
)
from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()


def main(args=None):
    parser = argparse.ArgumentParser(description="SVHN VAE.")
    parser.add_argument("command", choices=["train", "reconstruct", "generate"])
    parser.add_argument("--alpha", type=float_strictly_positive, default=1.0)
    parser.add_argument("--nb_hidden", type=int_strictly_positive, default=300)
    parser.add_argument("--nb_z", type=int_strictly_positive, default=25)
    parser.add_argument("--nb_epochs_training", type=int_strictly_positive, default=200)
    parser.add_argument("--batch_size", type=int_strictly_positive, default=250)
    parser.add_argument("--path_to_training_data", default="data/svhn/training_data.npy")
    parser.add_argument("--results_root", default="results/vae")
    args = parser.parse_args(args)

    os.makedirs(args.results_root, exist_ok=True)
    path_model = os.path.join(args.results_root, "model")
    template = vae.init_vae_state(jax.random.PRNGKey(0), nb_hidden=args.nb_hidden,
                                 nb_z=args.nb_z)

    if args.command == "train":
        if os.path.isfile(args.path_to_training_data):
            training_uint8 = numpy.load(args.path_to_training_data)
        else:
            training_uint8 = synthetic_svhn(2000)
            print("using synthetic SVHN digits")
        (mean_training, std_training) = compute_preprocessing_stats(training_uint8)
        numpy.savez(os.path.join(args.results_root, "preprocessing.npz"),
                    mean_training=mean_training, std_training=std_training)
        training = preprocess_svhn(training_uint8, mean_training, std_training)
        state = template
        step = vae.make_vae_step_fn(args.alpha)
        key = jax.random.PRNGKey(1)
        nb_batches = training.shape[0] // args.batch_size
        rng = numpy.random.default_rng(0)
        for epoch in range(args.nb_epochs_training):
            permutation = rng.permutation(training.shape[0])
            for i in range(nb_batches):
                (key, sub) = jax.random.split(key)
                rows = permutation[i * args.batch_size:(i + 1) * args.batch_size]
                state = step(state, training[rows], sub)
            if epoch % 20 == 0:
                (key, k_eval) = jax.random.split(key)
                loss = float(vae.opposite_vlb(state.params,
                                              training[:args.batch_size], k_eval,
                                              args.alpha))
                print(f"epoch {epoch}: -VLB {loss:.2f}")
        save_checkpoint(path_model, state, allow_overwrite=True)
    elif args.command == "reconstruct":
        stats = numpy.load(os.path.join(args.results_root, "preprocessing.npz"))
        state = load_checkpoint(path_model, template)
        digits_uint8 = (numpy.load(args.path_to_training_data)[:8]
                        if os.path.isfile(args.path_to_training_data)
                        else synthetic_svhn(8))
        digits = preprocess_svhn(digits_uint8, stats["mean_training"],
                                 float(stats["std_training"]))
        (_, _, _, rec) = vae.forward_pass(state.params, digits, jax.random.PRNGKey(2))
        rec_uint8 = numpy.round((numpy.asarray(rec) * float(stats["std_training"])
                                 + stats["mean_training"]).clip(0, 255)).astype(numpy.uint8)
        numpy.save(os.path.join(args.results_root, "reconstructions.npy"), rec_uint8)
        print("reconstructions saved")
    else:
        stats = numpy.load(os.path.join(args.results_root, "preprocessing.npz"))
        state = load_checkpoint(path_model, template)
        samples = vae.generate(state.params, jax.random.PRNGKey(3), 16, nb_z=args.nb_z)
        digits_uint8 = numpy.round((numpy.asarray(samples) * float(stats["std_training"])
                                    + stats["mean_training"]).clip(0, 255)).astype(numpy.uint8)
        numpy.save(os.path.join(args.results_root, "generated.npy"), digits_uint8)
        print("samples saved")


if __name__ == "__main__":
    main()
