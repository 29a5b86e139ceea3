"""Checkpoint-averaging stability protocol for the per-gamma family.

The one-model-per-gamma family's Bjontegaard summary is fragile at
short training budgets: individual gamma models fluctuate epoch to
epoch and the cubic fit amplifies it (round 4 measured +48.5% ->
+82.9% across a 2k-step probe). The reference's number rests on seven
*converged* models (``reconstructing_eae_kodak.py:607-611,837-856``);
until convergence, this script provides the explicit stability
protocol VERDICT r4 asked for:

1. for every gamma, average the parameters of the last K completed
   part checkpoints (tail averaging a la SWA; bin widths are fixed at
   1.0 for this family, and the per-gamma rate in the study is the
   empirical entropy of the quantized latents, so averaged params are
   self-contained),
2. export the averaged models as ``params_trained.npz`` artifacts under
   a separate results root,
3. run the same RD study (same cached anchors) on the averaged models,
4. write a side-by-side comparison of the last-checkpoint vs averaged
   Bjontegaard summaries (with the fit-quality flags) so the committed
   headline documents its own checkpoint sensitivity.

Usage::

    python scripts/stability_study.py --k 3 \
        [--results_root results/eae] [--study_dir results/eae/kodak_rd]
"""

import argparse
import glob
import json
import os
import pickle
import re
import shutil
import sys

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GAMMAS = [10000.0, 12000.0, 16000.0, 24000.0, 40000.0, 72000.0, 96000.0]


def _complete_part_indices(exp_dir):
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        checkpoint_part_complete)

    indices = []
    for path in glob.glob(os.path.join(exp_dir, "model_*.npz")):
        match = re.fullmatch(r"model_(\d+)\.npz", os.path.basename(path))
        if match and checkpoint_part_complete(path[:-len(".npz")]):
            indices.append(int(match.group(1)))
    return sorted(indices)


def average_gamma_params(exp_dir, gamma, k):
    """Mean of the params over the last ``k`` complete part checkpoints.

    Returns ``(params_mean, bin_widths, last_step, used_indices)``.
    """
    import jax

    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_checkpoint)
    from autoencoder_based_image_compression_tpu.train.state import (
        init_train_state)

    indices = _complete_part_indices(exp_dir)[-k:]
    if not indices:
        raise FileNotFoundError(f"no complete checkpoints under {exp_dir}")
    template = init_train_state(jax.random.PRNGKey(0), gamma, 1.0, False)
    total = None
    last = None
    for idx in indices:
        state = load_checkpoint(os.path.join(exp_dir, f"model_{idx}"), template)
        params = {name: numpy.asarray(value, numpy.float64)
                  for (name, value) in state.params.items()}
        total = (params if total is None else
                 {name: total[name] + params[name] for name in params})
        last = state
    mean = {name: (value / len(indices)).astype(numpy.float32)
            for (name, value) in total.items()}
    return (mean, numpy.asarray(last.bin_widths), int(last.step), indices)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--k", type=int, default=3,
                        help="number of tail checkpoints to average")
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--avg_root", default="results/eae_avg")
    parser.add_argument("--study_dir", default="results/eae/kodak_rd",
                        help="the main study's cache dir (its pickle is the "
                             "last-checkpoint side; its anchor caches are "
                             "copied so HM/JPEG2000 are not recomputed)")
    parser.add_argument("--out", default="results/eae/kodak_rd_stability")
    parser.add_argument("--path_to_kodak", default="data/campaign/kodak.npy")
    parser.add_argument("--hevc_encoder",
                        default="build/HM-16.15/bin/TAppEncoderStatic")
    parser.add_argument("--hevc_qps", type=int, nargs="*", default=None)
    args = parser.parse_args()

    from autoencoder_based_image_compression_tpu.cli import reconstruct_kodak
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        save_params_artifact)
    from autoencoder_based_image_compression_tpu.utils.naming import (
        experiment_suffix)

    used = {}
    for gamma in GAMMAS:
        suffix = experiment_suffix(1.0, gamma, False)
        exp_dir = os.path.join(args.results_root, suffix)
        (mean, bin_widths, last_step, indices) = average_gamma_params(
            exp_dir, gamma, args.k)
        out_dir = os.path.join(args.avg_root, suffix)
        os.makedirs(out_dir, exist_ok=True)
        save_params_artifact(os.path.join(out_dir, "params_trained.npz"),
                             mean, bin_widths, step=last_step)
        used[f"{gamma:.0f}"] = indices
        print(f"gamma {gamma:>8.0f}: averaged parts {indices} "
              f"(last step {last_step}) -> {out_dir}")

    # Reuse the main study's anchor caches (keyed by backend/encoder +
    # ladder + content hash, so a copied file stays valid).
    os.makedirs(args.out, exist_ok=True)
    for path in glob.glob(os.path.join(args.study_dir, "*_hevc_*.npy")) + \
            glob.glob(os.path.join(args.study_dir, "*_jpeg2000_*.npy")):
        dst = os.path.join(args.out, os.path.basename(path))
        if not os.path.isfile(dst):
            shutil.copy(path, dst)

    argv = ["--results_root", args.avg_root,
            "--cache_dir", args.out,
            "--path_to_kodak", args.path_to_kodak,
            "--idx_training", "999"]
    if args.hevc_encoder and os.path.isfile(args.hevc_encoder):
        argv += ["--hevc_encoder", args.hevc_encoder]
        if args.hevc_qps:
            argv += ["--hevc_qps"] + [str(q) for q in args.hevc_qps]
    reconstruct_kodak.main(argv)

    comparison = {"k": args.k, "averaged_parts": used}
    for (side, study_dir) in (("last_checkpoint", args.study_dir),
                              ("k_checkpoint_average", args.out)):
        path = os.path.join(study_dir, "dictionary_bjontegaard.pkl")
        if os.path.isfile(path):
            with open(path, "rb") as file:
                summary = pickle.load(file)
            comparison[side] = {
                key: (value if isinstance(value, (int, float))
                      else value["delta_pct"])
                for (key, value) in summary.items()
                if key.startswith("EAE one model")}
    path_out = os.path.join(args.out, "stability_comparison.json")
    with open(path_out, "w") as file:
        json.dump(comparison, file, indent=2)
    print(f"stability comparison written to {path_out}:")
    print(json.dumps(comparison, indent=2))


if __name__ == "__main__":
    main()
