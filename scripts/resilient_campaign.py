"""Stall-resilient training continuation: one FRESH process per part.

The axon dev tunnel's device grant has been observed to wedge after
~30-35 minutes of continuous holding by one client (both in round 3 -
the orphaned model_3/model_4 metadata died at the same ~21k-step mark -
and in this round's part-2 continuation, which froze mid-checkpoint
with the client blocked on a device fetch and zero CPU). Training is
multi-part-resumable by design (the reference anticipates cluster
breakdowns, ``eae/graph/EntropyAutoencoder.py:13-17``), so the fix is
operational: run every part in its own subprocess under a hard timeout.
A part is ~10 epochs (~10 min), well under the wedge horizon; a wedged
part is killed, its partial checkpoints cleaned, and retried.

Usage::

    python scripts/resilient_campaign.py --start_part 3 --end_part 11 \
        [--nb_epochs 10] [--timeout 1500]

Trains, for each part index p in [start, end]: the fixed-bw gamma
ladder (one vmapped program) and the learned-bin-width sweep model.
The learned-bw family is brought level first if it lags behind.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GAMMAS = ["10000.0", "12000.0", "16000.0", "24000.0", "40000.0",
          "72000.0", "96000.0"]


def _exp_dir(results_root, bw_init, gamma, learn_bw):
    from autoencoder_based_image_compression_tpu.utils.naming import (
        experiment_suffix)

    return os.path.join(results_root,
                        experiment_suffix(float(bw_init), float(gamma), learn_bw))


def _part_complete(exp_dir, idx_model):
    npz = os.path.join(exp_dir, f"model_{idx_model}.npz")
    meta = os.path.join(exp_dir, f"model_{idx_model}.json")
    if not os.path.isfile(npz):
        return False
    if not os.path.isfile(meta):
        # npz written, meta not: the writer died mid-save (the meta is
        # written last) - treat as partial so _clean_partial sweeps it.
        return False
    with open(meta) as file:
        return bool(json.load(file).get("part_complete", True))


def _clean_partial(exp_dirs, idx_model):
    for exp_dir in exp_dirs:
        for ext in (".npz", ".json"):
            path = os.path.join(exp_dir, f"model_{idx_model}{ext}")
            if os.path.isfile(path):
                os.remove(path)
                print(f"[resilient] removed partial {path}", flush=True)


def _newest_mtime(exp_dirs, idx_model):
    newest = 0.0
    for exp_dir in exp_dirs:
        for ext in (".npz", ".json"):
            path = os.path.join(exp_dir, f"model_{idx_model}{ext}")
            if os.path.isfile(path):
                newest = max(newest, os.path.getmtime(path))
    return newest


def _run_part(argv_tail, exp_dirs, idx_model, timeout_s, label, retries=4,
              stall_s=180, cooldown_s=20):
    """Runs one training part in a fresh subprocess; cleans + retries on
    stall, timeout or failure.

    Stall detection is progress-based: the training CLIs save a
    checkpoint after EVERY epoch (~40-75 s apart), so `stall_s` seconds
    without a checkpoint write means the client is wedged on a device
    response - kill and retry immediately instead of waiting out the
    full part timeout. Startup (data upload + compile-cache load) gets
    the same allowance from process start.
    """
    if all(_part_complete(d, idx_model) for d in exp_dirs):
        print(f"[resilient] {label}: model_{idx_model} complete, skipping",
              flush=True)
        return
    for attempt in range(retries + 1):
        _clean_partial(exp_dirs, idx_model)
        # Cool-down before (re)connecting: the observed wedges cluster
        # on fresh connects right after another client exited, so give
        # the tunnel a moment to release the previous grant.
        time.sleep(cooldown_s)
        t0 = time.time()
        print(f"[resilient] {label}: starting (attempt {attempt + 1})",
              flush=True)
        proc = subprocess.Popen([sys.executable, "-m"] + argv_tail, cwd=REPO)
        status = None
        while True:
            try:
                status = proc.wait(timeout=15)
                break
            except subprocess.TimeoutExpired:
                pass
            now = time.time()
            last_progress = max(_newest_mtime(exp_dirs, idx_model), t0)
            if now - last_progress > stall_s:
                proc.kill()
                proc.wait()
                status = "stalled"
                break
            if now - t0 > timeout_s:
                proc.kill()
                proc.wait()
                status = "timeout"
                break
        took = time.time() - t0
        if status == 0 and all(_part_complete(d, idx_model) for d in exp_dirs):
            print(f"[resilient] {label}: done in {took:.0f} s", flush=True)
            return
        print(f"[resilient] {label}: attempt {attempt + 1} failed "
              f"({status}, {took:.0f} s)", flush=True)
    raise RuntimeError(f"{label}: failed after {retries + 1} attempts")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--start_part", type=int, required=True)
    parser.add_argument("--end_part", type=int, required=True)
    parser.add_argument("--nb_epochs", type=int, default=10)
    parser.add_argument("--timeout", type=int, default=1500)
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--results_root", default="results/eae")
    parser.add_argument("--data_root", default="data/campaign")
    args = parser.parse_args()

    paths = {
        "training": os.path.join(args.data_root, "training_data.npy"),
        "validation": os.path.join(args.data_root, "validation_data.npy"),
    }
    common = ["--nb_epochs_training", str(args.nb_epochs),
              "--batch_size", str(args.batch_size),
              "--path_to_training_data", paths["training"],
              "--path_to_validation_data", paths["validation"],
              "--results_root", args.results_root]
    ladder_dirs = [_exp_dir(args.results_root, 1.0, g, False) for g in GAMMAS]
    learn_dir = _exp_dir(args.results_root, 0.5, 10000.0, True)

    pkg = "autoencoder_based_image_compression_tpu.cli"
    for idx_part in range(args.start_part, args.end_part + 1):
        # Bring the learned-bw family level first when it lags (e.g.
        # the ladder's part finished but the wedge hit before the
        # learned-bw model trained its own).
        for lag in range(idx_part - 1, idx_part + 1):
            if (lag >= args.start_part - 1
                    and not _part_complete(learn_dir, lag + 1)
                    and _part_complete(learn_dir, lag)):
                _run_part([f"{pkg}.train_eae", "0.5", "10000.0", str(lag),
                           "--learn_bin_widths"] + common,
                          [learn_dir], lag + 1, args.timeout,
                          f"learned-bw part {lag}")
        _run_part([f"{pkg}.train_ladder", "1.0", str(idx_part),
                   "--gammas"] + GAMMAS + common,
                  ladder_dirs, idx_part + 1, args.timeout,
                  f"ladder part {idx_part}")
        _run_part([f"{pkg}.train_eae", "0.5", "10000.0", str(idx_part),
                   "--learn_bin_widths"] + common,
                  [learn_dir], idx_part + 1, args.timeout,
                  f"learned-bw part {idx_part}")


if __name__ == "__main__":
    main()
