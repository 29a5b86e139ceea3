"""Trains the conv entropy autoencoder on ImageNet luminance crops.

Counterpart of ``kodak_tensorflow/training_eae_imagenet.py``:
``python -m ...cli.train_eae <bin_width_init> <gamma> <idx_training>
[--learn_bin_widths]`` - multi-part resumable training (part k resumes
from the checkpoint of part k-1 and refuses to overwrite part k), 80
epochs per part, batch 10, density pre-fit epochs on the first part,
the reference's full per-epoch indicator block
(``training_eae_imagenet.py:185-201``) plus dead-map counts, pdf areas
and numeric-domain monitors (grid saturation, negative per-map
entropies).
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
    mark_checkpoint_complete,
    save_checkpoint,
)
from autoencoder_based_image_compression_tpu.train.loop import (
    device_resident_dataset,
    evaluate_full,
    preliminary_fitting,
    run_epoch_training,
)
from autoencoder_based_image_compression_tpu.train.state import (
    current_lr,
    init_train_state,
)
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
    parser.add_argument("--nb_eval_examples", type=int_strictly_positive, default=100,
                        help="evaluation-portion size for the epoch indicators "
                             "(clipped to the dataset sizes)")
    parser.add_argument("--path_to_training_data",
                        default="data/imagenet/training_data.npy")
    parser.add_argument("--path_to_validation_data",
                        default="data/imagenet/validation_data.npy")
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--seed", type=int_positive, default=0)
    parser.add_argument("--bw_warmup_steps", type=int_positive, default=0,
                        help="cold-start mitigation for --learn_bin_widths: "
                             "while step < this, the bin-width upper clip is "
                             "tightened to --bw_warmup_max so the rate "
                             "gradient rescales the transform instead of "
                             "inflating the quantizer (BASELINE.md round-4 "
                             "pathology); 0 disables")
    parser.add_argument("--bw_warmup_max", type=float_strictly_positive,
                        default=1.0)
    return parser


def _monitor_numeric_domain(indicators, nb_itvs):
    """Surfaces the numeric-domain violations the reference asserts on.

    The jitted losses clamp instead of asserting (XLA cannot raise), so
    the host loop warns loudly when (a) a per-map approximate entropy
    goes negative (reference assertion ``tfutils.py:89-93``) or (b) the
    fixed-capacity density table saturates - expansion requests beyond
    ``MAX_ITVS_PER_SIDE`` are silently truncated in-jit
    (``ops/density.py::expand_table``).
    """
    import warnings

    per_map = indicators["approx_entropy_per_map"]
    if numpy.any(per_map < 0.0):
        bad = numpy.flatnonzero(per_map < 0.0)
        warnings.warn(
            f"{bad.size} per-map approximate entropies are negative "
            f"(maps {bad[:8].tolist()}{'...' if bad.size > 8 else ''}, "
            f"min {per_map.min():.4g}); the clamped training loss zeroes "
            "their gradients. The reference asserts on this "
            "(tfutils.py:89-93).", RuntimeWarning, stacklevel=2)
    if nb_itvs >= csts.MAX_ITVS_PER_SIDE:
        warnings.warn(
            f"The density grid saturated its static capacity "
            f"(nb_itvs_per_side == MAX_ITVS_PER_SIDE == "
            f"{csts.MAX_ITVS_PER_SIDE}); latents beyond the table are "
            "clipped into the boundary cells. Retrain with a larger "
            "max_itvs.", RuntimeWarning, stacklevel=2)


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

    step_fns = make_step_fns(args.gamma, args.learn_bin_widths,
                             bw_warmup_steps=args.bw_warmup_steps,
                             bw_warmup_max=args.bw_warmup_max)
    key = jax.random.PRNGKey(args.seed + 1000 * args.idx_training + 1)

    t_start = time.time()
    # One-time upload: the loops gather mini-batches from HBM.
    training_dev = device_resident_dataset(training_uint8)
    if args.idx_training == 0:
        (key, sub) = jax.random.split(key)
        state = preliminary_fitting(training_dev, state, step_fns, args.batch_size,
                                    args.nb_epochs_fitting, sub)
    nb_eval = min(args.nb_eval_examples, training_uint8.shape[0],
                  validation_uint8.shape[0])
    eval_train = training_dev[:nb_eval]
    eval_val = device_resident_dataset(validation_uint8[:nb_eval])
    history = {"train_disc_entropy": [], "train_scaled_approx_entropy": [],
               "train_rec_error": [], "val_rec_error": [],
               "train_entropy_gap": [], "val_entropy_gap": []}
    for epoch in range(args.nb_epochs_training):
        (key, k_train, k_eval_t, k_eval_v) = jax.random.split(key, 4)
        ind_t = evaluate_full(state, eval_train, step_fns, args.gamma, k_eval_t)
        ind_v = evaluate_full(state, eval_val, step_fns, args.gamma, k_eval_v)
        history["train_disc_entropy"].append(ind_t["mean_disc_entropy"])
        history["train_scaled_approx_entropy"].append(ind_t["scaled_approx_entropy"])
        history["train_rec_error"].append(ind_t["rec_error"])
        history["val_rec_error"].append(ind_v["rec_error"])
        history["train_entropy_gap"].append(ind_t["entropy_gap"])
        history["val_entropy_gap"].append(ind_v["entropy_gap"])
        nb_itvs = int(state.density.nb_itvs_per_side)
        # The reference's per-epoch indicator block
        # (training_eae_imagenet.py:185-201), over a nb_eval-sized
        # portion of each set.
        print(f"\nEpoch: {epoch + 1}")
        print(f"Training mean approximate entropy: {ind_t['mean_approx_entropy']}")
        print(f"Validation mean approximate entropy: {ind_v['mean_approx_entropy']}")
        print(f"Training mean entropy: {ind_t['mean_disc_entropy']}")
        print(f"Validation mean entropy: {ind_v['mean_disc_entropy']}")
        print("Training scaled cumulated approximate entropy: "
              f"{ind_t['scaled_approx_entropy']}")
        print("Validation scaled cumulated approximate entropy: "
              f"{ind_v['scaled_approx_entropy']}")
        print(f"Training reconstruction error: {ind_t['rec_error']}")
        print(f"Validation reconstruction error: {ind_v['rec_error']}")
        print(f"Training loss of density approximation: {ind_t['loss_density']}")
        print(f"Validation loss of density approximation: {ind_v['loss_density']}")
        print("Training entropy minus approximate entropy: "
              f"{ind_t['entropy_gap']}")
        print("Validation entropy minus approximate entropy: "
              f"{ind_v['entropy_gap']}")
        print(f"L2-norm weight decay: {ind_t['weight_decay']}")
        print(f"Number of unit intervals in the right half of the grid: {nb_itvs}")
        print(f"Learning rate: {round(current_lr(args.gamma, int(state.step)), 9)}")
        print(f"Global step: {int(state.step)}")
        print(f"Dead feature maps (of {csts.NB_MAPS_3}): {ind_t['nb_dead_maps']}")
        areas = ind_t["areas_under_pdfs"]
        print(f"Area under the pdfs: mean={areas.mean():.4f} "
              f"min={areas.min():.4f} max={areas.max():.4f}")
        print("Mean quantization bin width: "
              f"{float(numpy.mean(numpy.asarray(state.bin_widths))):.4f}")
        _monitor_numeric_domain(ind_t, nb_itvs)
        t_epoch = time.time()
        state = run_epoch_training(training_dev, state, step_fns, args.batch_size,
                                   nb_batches, k_train)
        # Per-epoch training throughput (the reference's dominant
        # workload, training_eae_imagenet.py:169-254, was never timed).
        # Completion barrier via a scalar host fetch: block_until_ready
        # does not reliably block on experimental PJRT platforms.
        int(state.step)
        epoch_seconds = time.time() - t_epoch
        pixels = nb_batches * args.batch_size * numpy.prod(training_uint8.shape[1:3])
        print(f"Epoch wall-clock: {epoch_seconds:.2f} s "
              f"({nb_batches / epoch_seconds:.2f} steps/s, "
              f"{pixels / epoch_seconds / 1e6:.2f} Mpix/s)")
        save_checkpoint(path_next, state, allow_overwrite=True)
    mark_checkpoint_complete(path_next)
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
        plot_training_curves(
            {"train gap": history["train_entropy_gap"],
             "val gap": history["val_entropy_gap"]},
            os.path.join(exp_dir, f"entropy_gap_part_{args.idx_training}.png"))
    elapsed = time.time() - t_start
    print(f"training part {args.idx_training} done in "
          f"{int(elapsed // 3600)}h {int((elapsed % 3600) // 60)}m")


if __name__ == "__main__":
    main()
