"""Trains the conv entropy autoencoder on ImageNet luminance crops.

Counterpart of ``kodak_tensorflow/training_eae_imagenet.py``:
``python -m ...cli.train_eae <bin_width_init> <gamma> <idx_training>
[--learn_bin_widths]`` - multi-part resumable training (part k resumes
from the checkpoint of part k-1 and refuses to overwrite part k), 80
epochs per part, batch 10, density pre-fit epochs on the first part,
the reference's 14-indicator epoch printout reduced to its tracked
quantities.
"""

import argparse
import os
import time

import jax
import numpy

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from autoencoder_based_image_compression_tpu.train.loop import (
    evaluate,
    preliminary_fitting,
    run_epoch_training,
)
from autoencoder_based_image_compression_tpu.train.state import init_train_state
from autoencoder_based_image_compression_tpu.train.step import make_step_fns
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


def build_parser():
    parser = argparse.ArgumentParser(
        description="Trains the conv entropy autoencoder.")
    parser.add_argument("bin_width_init", type=float_strictly_positive,
                        help="initial quantization bin width")
    parser.add_argument("gamma", type=float_strictly_positive,
                        help="entropy scaling coefficient")
    parser.add_argument("idx_training", type=int_positive,
                        help="training part index (0 for the first part)")
    parser.add_argument("--learn_bin_widths", action="store_true")
    parser.add_argument("--nb_epochs_training", type=int_strictly_positive, default=80)
    parser.add_argument("--nb_epochs_fitting", type=int_strictly_positive, default=1)
    parser.add_argument("--batch_size", type=int_strictly_positive, default=10)
    parser.add_argument("--path_to_training_data",
                        default="data/imagenet/training_data.npy")
    parser.add_argument("--path_to_validation_data",
                        default="data/imagenet/validation_data.npy")
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--seed", type=int_positive, default=0)
    return parser


def main(args=None):
    args = build_parser().parse_args(args)
    suffix = experiment_suffix(args.bin_width_init, args.gamma, args.learn_bin_widths)
    exp_dir = os.path.join(args.results_root, suffix)
    os.makedirs(exp_dir, exist_ok=True)

    training_uint8 = numpy.load(args.path_to_training_data)
    validation_uint8 = numpy.load(args.path_to_validation_data)
    nb_batches = training_uint8.shape[0] // args.batch_size

    state = init_train_state(jax.random.PRNGKey(args.seed), args.gamma,
                             args.bin_width_init, args.learn_bin_widths)
    path_prev = os.path.join(exp_dir, f"model_{args.idx_training}")
    path_next = os.path.join(exp_dir, f"model_{args.idx_training + 1}")
    if checkpoint_exists(path_next):
        raise RuntimeError(f"{path_next} already exists; refusing to retrain part "
                           f"{args.idx_training}.")
    if args.idx_training > 0:
        state = load_checkpoint(path_prev, state)

    step_fns = make_step_fns(args.gamma, args.learn_bin_widths)
    key = jax.random.PRNGKey(args.seed + 1000 * args.idx_training + 1)

    t_start = time.time()
    if args.idx_training == 0:
        (key, sub) = jax.random.split(key)
        state = preliminary_fitting(training_uint8, state, step_fns, args.batch_size,
                                    args.nb_epochs_fitting, sub)
    history = {"train_disc_entropy": [], "train_scaled_approx_entropy": [],
               "train_rec_error": [], "val_rec_error": []}
    for epoch in range(args.nb_epochs_training):
        (key, k_train, k_eval_t, k_eval_v) = jax.random.split(key, 4)
        indicators_train = evaluate(state, training_uint8[:args.batch_size],
                                    step_fns, args.gamma, k_eval_t)
        indicators_val = evaluate(state, validation_uint8[:args.batch_size],
                                  step_fns, args.gamma, k_eval_v)
        history["train_disc_entropy"].append(indicators_train[0])
        history["train_scaled_approx_entropy"].append(indicators_train[1])
        history["train_rec_error"].append(indicators_train[2])
        history["val_rec_error"].append(indicators_val[2])
        print(f"epoch {epoch}: "
              f"train (disc-H, scaled-aH, rec, fct-loss)={indicators_train} "
              f"val={indicators_val} "
              f"step={int(state.step)} "
              f"nb_itvs={int(state.density.nb_itvs_per_side)} "
              f"bw[mean]={float(numpy.mean(numpy.asarray(state.bin_widths))):.4f}")
        state = run_epoch_training(training_uint8, state, step_fns, args.batch_size,
                                   nb_batches, k_train)
        save_checkpoint(path_next, state, allow_overwrite=True)
    # Training-curve artifacts (reference training_eae_imagenet.py:259-326).
    if args.nb_epochs_training > 1:
        from autoencoder_based_image_compression_tpu.eval.visualization import (
            plot_training_curves)

        plot_training_curves(
            {"train rec error": history["train_rec_error"],
             "val rec error": history["val_rec_error"]},
            os.path.join(exp_dir, f"rec_error_part_{args.idx_training}.png"))
        plot_training_curves(
            {"mean discrete entropy": history["train_disc_entropy"]},
            os.path.join(exp_dir, f"entropy_part_{args.idx_training}.png"))
    elapsed = time.time() - t_start
    print(f"training part {args.idx_training} done in "
          f"{int(elapsed // 3600)}h {int((elapsed % 3600) // 60)}m")


if __name__ == "__main__":
    main()
