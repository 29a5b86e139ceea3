"""Trains the dense entropy autoencoder on SVHN digits.

Counterpart of ``svhn/training_eae_svhn.py``: 800 epochs, batch 250,
per-pixel-mean/global-std preprocessing, density pre-fit before the
first epoch, whole-state persistence (the reference pickles the whole
object, ``training_eae_svhn.py:83``; here the state pytree goes through
the npz checkpointer).
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
from autoencoder_based_image_compression_tpu.models import dense_eae
from autoencoder_based_image_compression_tpu.train.checkpoint import save_checkpoint
from autoencoder_based_image_compression_tpu.utils.naming import experiment_suffix
from autoencoder_based_image_compression_tpu.utils.parsing import (
    float_strictly_positive,
    int_positive,
    int_strictly_positive,
)
from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()


def main(args=None):
    parser = argparse.ArgumentParser(description="Trains the SVHN dense EAE.")
    parser.add_argument("bin_width_init", type=float_strictly_positive)
    parser.add_argument("gamma", type=float_strictly_positive)
    parser.add_argument("--learn_bin_width", action="store_true")
    parser.add_argument("--nb_epochs_training", type=int_strictly_positive, default=800)
    parser.add_argument("--nb_epochs_fitting", type=int_strictly_positive, default=1)
    parser.add_argument("--batch_size", type=int_strictly_positive, default=250)
    parser.add_argument("--path_to_training_data", default="data/svhn/training_data.npy")
    parser.add_argument("--results_root", default="results/svhn")
    parser.add_argument("--seed", type=int_positive, default=0)
    parser.add_argument("--synthetic", action="store_true",
                        help="use synthetic digits (development only)")
    args = parser.parse_args(args)

    if args.synthetic or not os.path.isfile(args.path_to_training_data):
        training_uint8 = synthetic_svhn(2000, seed=args.seed)
        print("using synthetic SVHN digits")
    else:
        training_uint8 = numpy.load(args.path_to_training_data)
    (mean_training, std_training) = compute_preprocessing_stats(training_uint8)
    training = preprocess_svhn(training_uint8, mean_training, std_training)

    exp_dir = os.path.join(args.results_root,
                           experiment_suffix(args.bin_width_init, args.gamma,
                                             args.learn_bin_width))
    os.makedirs(exp_dir, exist_ok=True)
    numpy.savez(os.path.join(exp_dir, "preprocessing.npz"),
                mean_training=mean_training, std_training=std_training)

    state = dense_eae.init_dense_eae_state(jax.random.PRNGKey(args.seed),
                                           args.bin_width_init)
    fns = dense_eae.make_dense_step_fns(args.gamma, args.learn_bin_width)
    key = jax.random.PRNGKey(args.seed + 1)
    nb_batches = training.shape[0] // args.batch_size
    rng = numpy.random.default_rng(args.seed)

    for _ in range(args.nb_epochs_fitting):
        for j in range(nb_batches):
            (key, sub) = jax.random.split(key)
            batch = training[j * args.batch_size:(j + 1) * args.batch_size]
            state = fns["training_fct"](state, batch, sub)
    for epoch in range(args.nb_epochs_training):
        permutation = rng.permutation(training.shape[0])
        for i in range(nb_batches):
            (key, sub) = jax.random.split(key)
            batch = training[permutation[i * args.batch_size:(i + 1) * args.batch_size]]
            state = fns["training_fct"](state, batch, sub)
            state = fns["training_eae_bw"](state, batch, sub)
        if epoch % 50 == 0 or epoch == args.nb_epochs_training - 1:
            (key, k_eval) = jax.random.split(key)
            (approx_h, scaled_h, rec, fct, _) = fns["evaluation"](
                state, training[:args.batch_size], k_eval)
            print(f"epoch {epoch}: approx-H {float(approx_h):.3f} "
                  f"rec {float(rec):.2f} fct-loss {float(fct):.4f} "
                  f"bw {float(state.bin_width):.3f}")
    save_checkpoint(os.path.join(exp_dir, "model"), state, allow_overwrite=True)
    print(f"model saved under {exp_dir}")


if __name__ == "__main__":
    main()
