"""Trains the WHOLE one-model-per-gamma RD ladder in one program.

TPU-native replacement for running ``cli.train_eae`` once per gamma
(the reference's flagship study trains its 7 rate points as 7 separate
``training_eae_imagenet.py`` runs, ``reconstructing_eae_kodak.py:607-611``):
the stacked ladder state trains under ``jax.vmap`` inside scanned-epoch
dispatches, sharing every mini-batch across models. The conv EAE is far
too small to saturate a chip on its own, so the ladder trains in a
fraction of the sequential wall-clock.

``python -m ...cli.train_ladder <bin_width_init> <idx_training>
[--gammas ...]`` - same multi-part resume scheme as ``train_eae``
(per-model checkpoints ``model_{k+1}`` in each experiment directory,
overwrite refusal, resume from part k-1), fixed-bin-width architecture.
"""

import argparse
import os
import time

import jax
import numpy

from autoencoder_based_image_compression_tpu.train.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    mark_checkpoint_complete,
    save_checkpoint,
)
from autoencoder_based_image_compression_tpu.train.ladder import (
    init_ladder_state,
    ladder_slice_state,
    ladder_stack_states,
    make_ladder_eval_fn,
    make_ladder_step_fns,
)
from autoencoder_based_image_compression_tpu.train.loop import (
    device_resident_dataset,
    preliminary_fitting,
    run_epoch_training,
)
from autoencoder_based_image_compression_tpu.train.state import init_train_state
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

GAMMAS_DEFAULT = [10000.0, 12000.0, 16000.0, 24000.0, 40000.0, 72000.0, 96000.0]


def build_parser():
    parser = argparse.ArgumentParser(
        description="Trains the whole gamma ladder simultaneously (vmap).")
    parser.add_argument("bin_width_init", type=float_strictly_positive)
    parser.add_argument("idx_training", type=int_positive,
                        help="training part index (0 for the first part)")
    parser.add_argument("--gammas", type=float_strictly_positive, nargs="*",
                        default=None, help=f"ladder (default {GAMMAS_DEFAULT})")
    parser.add_argument("--nb_epochs_training", type=int_strictly_positive,
                        default=80)
    parser.add_argument("--nb_epochs_fitting", type=int_strictly_positive,
                        default=1)
    parser.add_argument("--batch_size", type=int_strictly_positive, default=10)
    parser.add_argument("--nb_eval_examples", type=int_strictly_positive,
                        default=100)
    parser.add_argument("--path_to_training_data",
                        default="data/imagenet/training_data.npy")
    parser.add_argument("--path_to_validation_data",
                        default="data/imagenet/validation_data.npy")
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--seed", type=int_positive, default=0)
    return parser


def main(args=None):
    args = build_parser().parse_args(args)
    gammas = GAMMAS_DEFAULT if not args.gammas else args.gammas
    exp_dirs = [os.path.join(args.results_root,
                             experiment_suffix(args.bin_width_init, g, False))
                for g in gammas]
    paths_next = [os.path.join(d, f"model_{args.idx_training + 1}")
                  for d in exp_dirs]
    for path in paths_next:
        if checkpoint_exists(path):
            raise RuntimeError(f"{path} already exists; refusing to retrain "
                               f"part {args.idx_training}.")

    training_uint8 = numpy.load(args.path_to_training_data)
    validation_uint8 = numpy.load(args.path_to_validation_data)
    nb_batches = training_uint8.shape[0] // args.batch_size

    if args.idx_training == 0:
        ladder = init_ladder_state(jax.random.PRNGKey(args.seed), gammas,
                                   args.bin_width_init)
    else:
        singles = []
        for (gamma, exp_dir) in zip(gammas, exp_dirs):
            template = init_train_state(jax.random.PRNGKey(args.seed), gamma,
                                        args.bin_width_init, False)
            singles.append(load_checkpoint(
                os.path.join(exp_dir, f"model_{args.idx_training}"), template))
        ladder = ladder_stack_states(singles)

    fns = make_ladder_step_fns(gammas)
    eval_fn = make_ladder_eval_fn(gammas)
    key = jax.random.PRNGKey(args.seed + 1000 * args.idx_training + 1)

    t_start = time.time()
    training_dev = device_resident_dataset(training_uint8)
    if args.idx_training == 0:
        (key, sub) = jax.random.split(key)
        ladder = preliminary_fitting(training_dev, ladder, fns, args.batch_size,
                                     args.nb_epochs_fitting, sub)
    import jax.numpy as jnp

    nb_eval = min(args.nb_eval_examples, training_uint8.shape[0],
                  validation_uint8.shape[0])
    eval_train = training_dev[:nb_eval].astype(jnp.float32)
    eval_val = jax.device_put(
        jnp.asarray(validation_uint8[:nb_eval], jnp.float32))
    for epoch in range(args.nb_epochs_training):
        (key, k_train, k_eval_t, k_eval_v) = jax.random.split(key, 4)
        (rec_t, ent_t) = [numpy.asarray(x)
                          for x in eval_fn(ladder, eval_train, k_eval_t)]
        (rec_v, ent_v) = [numpy.asarray(x)
                          for x in eval_fn(ladder, eval_val, k_eval_v)]
        nb_itvs = numpy.asarray(ladder.density.nb_itvs_per_side)
        print(f"\nEpoch {epoch + 1} (global step "
              f"{int(numpy.asarray(ladder.step)[0])}):")
        for (k, gamma) in enumerate(gammas):
            print(f"  gamma={gamma:>8.0f}: approx-H {ent_t[k]:7.4f} "
                  f"(val {ent_v[k]:7.4f})  rec {rec_t[k]:9.2f} "
                  f"(val {rec_v[k]:9.2f})  grid {int(nb_itvs[k])}")
        t_epoch = time.time()
        ladder = run_epoch_training(training_dev, ladder, fns, args.batch_size,
                                    nb_batches, k_train)
        int(numpy.asarray(ladder.step)[0])  # completion barrier (host fetch)
        epoch_seconds = time.time() - t_epoch
        pixels = (nb_batches * args.batch_size
                  * int(numpy.prod(training_uint8.shape[1:3])))
        print(f"Epoch wall-clock: {epoch_seconds:.2f} s for {len(gammas)} "
              f"models ({nb_batches / epoch_seconds:.2f} ladder-steps/s, "
              f"{len(gammas) * pixels / epoch_seconds / 1e6:.2f} "
              "model-Mpix/s aggregate)")
        for (k, (gamma, path)) in enumerate(zip(gammas, paths_next)):
            save_checkpoint(path, ladder_slice_state(ladder, k, gamma),
                            allow_overwrite=True)
    for path in paths_next:
        mark_checkpoint_complete(path)
    elapsed = time.time() - t_start
    print(f"ladder part {args.idx_training} ({len(gammas)} models) done in "
          f"{int(elapsed // 3600)}h {int((elapsed % 3600) // 60)}m")


if __name__ == "__main__":
    main()
