"""Overfit sanity harness for the dense SVHN entropy autoencoder.

Counterpart of ``svhn/overfitting_eae_svhn.py``: trains on a handful of
digits and prints the objective trajectory - a fast smoke test that the
alternating optimization drives the rate-distortion objective down.
"""

import argparse

import jax
import numpy

from autoencoder_based_image_compression_tpu.data.svhn import (
    compute_preprocessing_stats,
    preprocess_svhn,
    synthetic_svhn,
)
from autoencoder_based_image_compression_tpu.models import dense_eae
from autoencoder_based_image_compression_tpu.utils.parsing import (
    float_strictly_positive,
    int_strictly_positive,
)
from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()


def main(args=None):
    parser = argparse.ArgumentParser(description="Overfit harness (SVHN EAE).")
    parser.add_argument("--gamma", type=float_strictly_positive, default=1.0)
    parser.add_argument("--nb_examples", type=int_strictly_positive, default=10)
    parser.add_argument("--nb_epochs", type=int_strictly_positive, default=400)
    parser.add_argument("--learn_bin_width", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(args)

    digits_uint8 = synthetic_svhn(args.nb_examples, seed=args.seed)
    (mean_training, std_training) = compute_preprocessing_stats(digits_uint8)
    digits = preprocess_svhn(digits_uint8, mean_training, std_training)

    state = dense_eae.init_dense_eae_state(jax.random.PRNGKey(args.seed))
    fns = dense_eae.make_dense_step_fns(args.gamma, args.learn_bin_width)
    key = jax.random.PRNGKey(args.seed + 1)
    key_eval = jax.random.PRNGKey(args.seed + 2)

    for _ in range(20):
        (key, sub) = jax.random.split(key)
        state = fns["training_fct"](state, digits, sub)
    for epoch in range(args.nb_epochs):
        (key, sub) = jax.random.split(key)
        state = fns["training_fct"](state, digits, sub)
        state = fns["training_eae_bw"](state, digits, sub)
        if epoch % 50 == 0 or epoch == args.nb_epochs - 1:
            (approx_h, scaled_h, rec, fct, _) = fns["evaluation"](state, digits, key_eval)
            print(f"epoch {epoch}: objective {float(scaled_h) + float(rec):.4f} "
                  f"(rec {float(rec):.4f}, scaled-H {float(scaled_h):.4f}) "
                  f"bw {float(state.bin_width):.3f}")
    print("overfit harness done - the objective above should be decreasing")


if __name__ == "__main__":
    main()
