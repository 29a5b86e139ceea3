"""Headline benchmark: Kodak-24 encode+decode throughput (Mpix/s/chip).

Runs the flagship conv entropy autoencoder over a Kodak-shaped batch
(24 luminance images, 512x768 - real Kodak data if
``data/kodak/kodak.npy`` exists, synthetic otherwise) and reports
end-to-end encode + quantize + decode megapixels per second on one
chip.

Weights: the TRAINED artifact
``results/eae/learning_bw/0dot5_10000/params_trained.npz`` when
present (so the int8 fast-path fidelity number reflects a trained
weight distribution, not random init), random init otherwise.

The scan megabatch contains NB_SCAN *distinct* batches (rolled/flipped
variants with different pixels), so XLA cannot hoist a loop-invariant
body and fake the number.

``vs_baseline`` compares against a reference-style execution of the
*same* computation: per-mini-batch host round-trips with a synchronous
fetch after every batch (the reference's ``sess.run``-per-batch
pattern, ``eae/batching.py:48-53``) at its batch size of 4
(``reconstructing_eae_kodak.py:624``), versus our scan-megabatched
async-dispatch pipeline (``engine.fast_roundtrip_scan``).

Three fast-path variants run (int8 weight-only store, bf16-rounded
weights, and bf16w+ = precision-surgical fp32 tails on both
transforms - by default a full-fp32 HIGH-precision analysis transform
over a bf16 synthesis transform); the headline is bf16w+, the variant
that meets the WORST-CASE per-image 0.05 dB parity gate at every
probed bin-width multiplier (its mix auto-escalates until the gate
holds). Per-variant
fidelity vs the fp32 parity path is reported both as recon-vs-recon
PSNR and as the end-to-end PSNR-vs-original delta the gate is about.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline",
"headline_path", "int8_mpix_per_s", "bf16w_mpix_per_s",
"fp32_mpix_per_s", "fast_vs_fp32_psnr_db", "psnr_delta_vs_fp32_db",
"weights"}.
"""

import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache)

enable_persistent_cache()

TRAINED_ARTIFACT = os.path.join(
    os.path.dirname(__file__), "results", "eae", "learning_bw", "0dot5_10000",
    "params_trained.npz")


# AEIC_BENCH_SMOKE=1 shrinks every workload (tiny images, short scans)
# so the bench's code paths can be exercised on CPU in seconds; the
# printed numbers are then meaningless and the metric name says so.
SMOKE = os.environ.get("AEIC_BENCH_SMOKE", "") not in ("", "0")


def _kodak_batch():
    if SMOKE:
        from autoencoder_based_image_compression_tpu.data.synthetic import (
            synthetic_luminance_stack)

        return synthetic_luminance_stack(4, 64, 96, seed=0)
    path = os.path.join(os.path.dirname(__file__), "data", "kodak", "kodak.npy")
    if os.path.isfile(path):
        images = numpy.load(path)
        if images.ndim == 3:
            images = images[..., None]
        return images.astype(numpy.uint8)
    # Image-like synthetic luminances (band-limited noise + gradients),
    # NOT white noise: the fidelity numbers below are measured at a
    # realistic operating point (~30 dB / ~0.4 bpp on the trained
    # model) instead of the ~10 dB a codec reaches on noise.
    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_kodak)

    return synthetic_kodak(seed=0)


def _distinct_stack(images_f32, nb_scan):
    """NB_SCAN genuinely different batches: spatial rolls + flips of the
    Kodak batch (same shapes, different pixels - defeats loop-invariant
    hoisting of the scan body)."""
    variants = []
    for k in range(nb_scan):
        batch = numpy.roll(images_f32, 37 * k + 11, axis=2)
        if k % 2 == 1:
            batch = batch[:, ::-1]
        variants.append(batch)
    return numpy.stack(variants, axis=0)


def _timeit(fn, repeats=5):
    fn()  # warmup / compile
    times = []
    for _ in range(1 if SMOKE else repeats):
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
    return min(times)


def _timeit_median(fn, repeats=7):
    """Median + observed range over ``repeats`` runs (after warmup).

    The serving rows go through the host link (dev tunnels vary by
    ~1.5x run to run), so a min- or single-shot number is not
    reproducible across drivers; the committed row is the median and
    the spread is reported alongside (VERDICT r4 item 3).
    """
    import statistics

    fn()  # warmup / compile
    times = []
    for _ in range(1 if SMOKE else repeats):
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
    return (statistics.median(times), max(times), min(times))


def main():
    from autoencoder_based_image_compression_tpu.models import conv_eae
    from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
    from autoencoder_based_image_compression_tpu.ops.quantization import (
        cast_bt601,
        quantize_per_map,
    )
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact)

    learn_bin_widths = True
    if os.path.isfile(TRAINED_ARTIFACT):
        (params, bin_widths) = load_params_artifact(TRAINED_ARTIFACT)
        weights_kind = "trained"
    else:
        params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0),
                                               learn_bin_widths)
        bin_widths = jnp.ones((128,), jnp.float32)
        weights_kind = "random"
    images = _kodak_batch()
    nb_pixels = images.shape[0] * images.shape[1] * images.shape[2]

    from autoencoder_based_image_compression_tpu.engine import quantized as engine

    def _roundtrip_fp32(params, batch, bin_widths):
        y = conv_eae.encode(params, batch, learn_bin_widths)
        quantized = quantize_per_map(y, bin_widths)
        return conv_eae.decode(params, quantized, learn_bin_widths)

    roundtrip = jax.jit(_roundtrip_fp32)

    # --- ours: three fast-path variants, all bf16 activations with the
    # dequantizer folded into the first transposed conv (fp32 fold,
    # then weight rounding):
    #   int8   - int8 weight-only store + per-channel fp32 scales
    #   bf16w  - kernels rounded to bf16 (same MXU kernels/speed, no
    #            int8 rounding)
    #   bf16w+ - precision-surgical fp32 tails (engine.BF16WPLUS_*;
    #            default = full-fp32 HIGH-precision analysis transform
    #            for exact symbols + bf16 synthesis; escalates below
    #            until the worst-case gate holds; the serving default)
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    bf16wplus_enc = engine.BF16WPLUS_ENC_TAIL
    bf16wplus_dec = engine.BF16WPLUS_DEC_TAIL
    bf16wplus_prec = engine.BF16WPLUS_ENC_PRECISION

    def bf16wplus_params(enc, dec, prec):
        return (engine.bf16_weight_params(params, fp32_enc_tail=enc),
                engine.bf16_weight_params(folded, fp32_tail=dec),
                enc, dec, prec)

    variants = {
        "int8": (engine.quantize_params_int8(params),
                 engine.quantize_params_int8(folded), 0, 0, "highest"),
        "bf16w": (engine.bf16_weight_params(params),
                  engine.bf16_weight_params(folded), 0, 0, "highest"),
        "bf16w+": bf16wplus_params(bf16wplus_enc, bf16wplus_dec,
                                   bf16wplus_prec),
    }

    # A 4-byte checksum fetch is the completion barrier. Rationale:
    # fetching the full reconstruction would measure the dev-tunnel's
    # ~50 MB/s host link, not the chip (block_until_ready alone does
    # not reliably block on experimental PJRT platforms - measured an
    # absurd 60 Gpix/s without a fetch). The checksum forces the whole
    # computation while keeping the transfer out of the timing.
    #
    # Sustained throughput: each dispatch runs a K-batch lax.scan
    # megabatch over K DISTINCT batches (engine.fast_roundtrip_scan)
    # and NB_IN_FLIGHT of those are in flight, the way the serving
    # engine runs. Per-batch host dispatch would mostly measure this
    # environment's ~27 ms tunnel latency; the device computes a
    # Kodak-24 roundtrip in a few ms.
    NB_SCAN = 2 if SMOKE else 8
    NB_IN_FLIGHT = 2
    images_f32 = images.astype(numpy.float32)
    stack_all = jax.device_put(jnp.asarray(_distinct_stack(images_f32, NB_SCAN)))
    batch_all = jax.device_put(jnp.asarray(images_f32))

    @functools.partial(jax.jit, static_argnames=("fp32_tail", "fp32_enc_tail",
                                                 "enc_precision"))
    def scan_checksum(qparams, qfolded, stack, bin_widths, fp32_tail=0,
                      fp32_enc_tail=0, enc_precision="highest"):
        (recs, symbols) = engine.fast_roundtrip_scan(
            qparams, qfolded, stack, bin_widths, fp32_tail=fp32_tail,
            fp32_enc_tail=fp32_enc_tail, enc_precision=enc_precision)
        return jnp.sum(recs) + jnp.sum(symbols)

    def make_run(qparams, qfolded, enc_tail, dec_tail, enc_precision):
        def run():
            checksums = [scan_checksum(qparams, qfolded, stack_all, bin_widths,
                                       fp32_tail=dec_tail,
                                       fp32_enc_tail=enc_tail,
                                       enc_precision=enc_precision)
                         for _ in range(NB_IN_FLIGHT)]
            for checksum in checksums:
                numpy.asarray(checksum)
        return run

    # --- fp32 parity path on the same distinct stack, same dispatch
    # discipline (the no-quantization-tricks number).
    @jax.jit
    def scan_checksum_fp32(params, stack, bin_widths):
        def body(carry, batch):
            rec = _roundtrip_fp32(params, batch, bin_widths)
            return (carry + jnp.sum(rec), None)

        (total, _) = jax.lax.scan(body, jnp.float32(0.0), stack)
        return total

    def run_fp32():
        checksums = [scan_checksum_fp32(params, stack_all, bin_widths)
                     for _ in range(NB_IN_FLIGHT)]
        for checksum in checksums:
            numpy.asarray(checksum)

    fp32_seconds = _timeit(run_fp32, repeats=3)
    fp32_mpix = NB_SCAN * NB_IN_FLIGHT * nb_pixels / fp32_seconds / 1.0e6

    # --- fast-path fidelity vs the fp32 parity path, per variant, on
    # the actual weights used above (trained when the artifact exists):
    # recon-vs-recon PSNR and the end-to-end PSNR-vs-original delta
    # (the number the <=0.05 dB parity gate is about). The gate binds
    # the WORST image, not the batch mean, and is additionally probed
    # across the bin-width-multiplier sweep's larger multipliers where
    # low-precision symbol flips concentrate
    # (reconstructing_eae_kodak.py:612-623's ladder).
    orig = cast_bt601(images[..., 0].astype(numpy.float32))
    GATE_MULTIPLIERS = (1.0, 4.0, 10.0)
    rec_fp32_per_mult = {}
    psnr_fp32_per_mult = {}
    for mult in GATE_MULTIPLIERS:
        rec_m = cast_bt601(numpy.asarray(
            roundtrip(params, batch_all, bin_widths * mult))[..., 0])
        rec_fp32_per_mult[mult] = rec_m
        psnr_fp32_per_mult[mult] = numpy.array(
            [psnr_2d(orig[i], rec_m[i]) for i in range(rec_m.shape[0])])
    rec_fp32 = rec_fp32_per_mult[1.0]
    fidelity = {}
    psnr_delta = {}
    psnr_delta_worst = {}
    GATE_DB = 0.05

    def gate_rows(tag, qp, enc_tail, dec_tail, enc_precision):
        """Worst-case per-image PSNR delta vs the fp32 path per
        multiplier, plus the x1 mean fidelity numbers."""
        per_mult_worst = {}
        for mult in GATE_MULTIPLIERS:
            bw_m = bin_widths * mult
            folded_m = engine.fold_bin_widths_into_decoder(params, bw_m)
            qf_m = (engine.quantize_params_int8(folded_m) if tag == "int8"
                    else engine.bf16_weight_params(folded_m,
                                                   fp32_tail=dec_tail))
            (recs_fast, _) = engine.fast_roundtrip_scan(
                qp, qf_m, batch_all[None], bw_m, fp32_tail=dec_tail,
                fp32_enc_tail=enc_tail, enc_precision=enc_precision)
            rec_fast = cast_bt601(numpy.asarray(recs_fast[0])[..., 0])
            deltas = numpy.array(
                [psnr_2d(orig[i], rec_fast[i])
                 for i in range(rec_fast.shape[0])]) - psnr_fp32_per_mult[mult]
            per_mult_worst[f"x{mult:g}"] = float(deltas.min())
            if mult == 1.0:
                fidelity[tag] = numpy.mean([
                    psnr_2d(rec_fp32[i], rec_fast[i]) if not numpy.array_equal(
                        rec_fp32[i], rec_fast[i]) else 99.0
                    for i in range(rec_fp32.shape[0])])
                psnr_delta[tag] = float(deltas.mean())
        return per_mult_worst

    for (tag, (qp, _, enc_tail, dec_tail, prec)) in variants.items():
        psnr_delta_worst[tag] = gate_rows(tag, qp, enc_tail, dec_tail, prec)
    # Escalate the bf16w+ precision mix until the worst-case gate holds
    # at every multiplier (first to exact-fp32 encoder convs, then
    # ((3, 3) == both transforms entirely in HIGHEST fp32).
    ESCALATION = [(3, 0, "highest"), (3, 1, "highest"), (3, 3, "highest")]
    while (not SMOKE and ESCALATION
           and min(psnr_delta_worst["bf16w+"].values()) < -GATE_DB):
        (bf16wplus_enc, bf16wplus_dec, bf16wplus_prec) = ESCALATION.pop(0)
        variants["bf16w+"] = bf16wplus_params(bf16wplus_enc, bf16wplus_dec,
                                              bf16wplus_prec)
        psnr_delta_worst["bf16w+"] = gate_rows(
            "bf16w+", variants["bf16w+"][0], bf16wplus_enc, bf16wplus_dec,
            bf16wplus_prec)
    gate_pass = {tag: bool(min(worst.values()) >= -GATE_DB)
                 for (tag, worst) in psnr_delta_worst.items()}

    mpix = {}
    for (tag, (qp, qf, enc_tail, dec_tail, prec)) in variants.items():
        seconds = _timeit(make_run(qp, qf, enc_tail, dec_tail, prec))
        mpix[tag] = NB_SCAN * NB_IN_FLIGHT * nb_pixels / seconds / 1.0e6
    # The headline is the bf16w+ path (bf16 transforms + fp32 decode
    # tail): the fast variant that meets the worst-case-per-image
    # 0.05 dB gate at every probed multiplier. Falls back to bf16w only
    # if even the full-fp32-decode escalation failed the gate (then the
    # gate_pass flags record the failure explicitly).
    headline_tag = "bf16w+" if (SMOKE or gate_pass["bf16w+"]) else "bf16w"
    mpix_per_s = mpix[headline_tag]

    # --- reference-style: batch-of-4 feed_dict round trips -------------
    def run_reference_style():
        outs = []
        for i in range(0, images.shape[0], 4):
            host_batch = images[i:i + 4].astype(numpy.float32)  # host cast each call
            out = roundtrip(params, jnp.asarray(host_batch), bin_widths)
            outs.append(numpy.asarray(out))  # synchronous fetch per batch
        return outs

    baseline_seconds = _timeit(run_reference_style, repeats=3)
    baseline_mpix = nb_pixels / baseline_seconds / 1.0e6

    # --- true-bitstream serving path (secondary metric): device
    # encode/decode overlapped with the host C++ arithmetic coder via
    # PipelinedCompressor, using the trained extra-set statistics when
    # the campaign produced them. This is rate-validated serving (real
    # bits, bit-exact round trip asserted per image), so it bounds the
    # deployable true-rate throughput, coder-side included.
    coded_mpix = None
    coded_fast_mpix = None
    coded_compress_only_mpix = None
    coded_noverify_mpix = None
    coded_spread = {}
    coder_msym = None
    stats_dir = os.path.join(os.path.dirname(TRAINED_ARTIFACT), "statistics")

    def _stats_match_artifact():
        """The coded metric pairs the params artifact with the extra-set
        statistics; both record the training step they came from, and a
        disagreement (e.g. an interrupted multi-part campaign that
        re-collected stats for a newer model than the export) would
        silently benchmark mismatched rates - skip with a warning."""
        import sys

        from autoencoder_based_image_compression_tpu.train.checkpoint import (
            params_artifact_step)

        artifact_step = params_artifact_step(TRAINED_ARTIFACT)
        marker = os.path.join(stats_dir, "stats_model_idx.json")
        stats_step = None
        if os.path.isfile(marker):
            with open(marker) as file:
                stats_step = json.load(file).get("step")
        if artifact_step is None or stats_step is None:
            return True  # pre-step-stamp artifacts: assume the pair
        if artifact_step != stats_step:
            print(f"WARNING: params artifact (step {artifact_step}) and "
                  f"coding statistics (step {stats_step}) come from "
                  "different training steps; skipping the true-bitstream "
                  "metric.", file=sys.stderr)
            return False
        return True

    # Host<->device link bandwidth, measured so the serving rows are
    # interpretable across environments: through a dev tunnel the link
    # is the serving bottleneck and varies run to run (round 4's driver
    # and builder numbers disagreed ~45% for exactly this reason). The
    # serving ceiling scales with this number (uint8 upload 1 B/px +
    # int8 symbol fetch 0.5 B/px for compress-only).
    link_mb_per_s = None
    if not SMOKE:
        probe = numpy.zeros(16 << 20, numpy.uint8)
        up_times = []
        down_times = []
        for _ in range(3):
            start = time.perf_counter()
            dev = jax.device_put(probe)
            dev.block_until_ready()
            up_times.append(time.perf_counter() - start)
            start = time.perf_counter()
            numpy.asarray(dev)
            down_times.append(time.perf_counter() - start)
        link_mb_per_s = {
            "upload": round(16.0 / min(up_times), 1),
            "fetch": round(16.0 / min(down_times), 1)}

    if weights_kind == "trained" and os.path.isfile(
            os.path.join(stats_dir, "map_mean.npy")) and _stats_match_artifact():
        import pickle

        from autoencoder_based_image_compression_tpu.parallel.inference import (
            PipelinedCompressor)

        with open(os.path.join(stats_dir, "idx_map_exception.pkl"), "rb") as f:
            idx_exc = pickle.load(f)
        probabilities = numpy.load(
            os.path.join(stats_dir, "binary_probabilities_1.npy"))
        map_mean = numpy.load(os.path.join(stats_dir, "map_mean.npy"))
        # Every serving row is a MEDIAN over >=5 repetitions with the
        # observed range alongside: these rows ride the host link, whose
        # run-to-run variance through a dev tunnel is the reason the
        # r4 driver and builder numbers disagreed by ~45%. Batch size 4
        # (the reference's own eval batch): the round-5 sweep measured
        # compress-only 27.7 / 24.3 / 21.6 / 17.4 Mpix/s at batch
        # 4/8/12/24 - more batches in the window = deeper overlap
        # between link transfers and the coder pool.
        def serve_row(name, compressor_obj, repeats=5):
            (med, worst, best) = _timeit_median(
                lambda: compressor_obj(images), repeats=repeats)
            coded_spread[name] = {
                "median": round(nb_pixels / med / 1.0e6, 3),
                "min": round(nb_pixels / worst / 1.0e6, 3),
                "max": round(nb_pixels / best / 1.0e6, 3)}
            return nb_pixels / med / 1.0e6

        compressor = PipelinedCompressor(
            params, bin_widths, learn_bin_widths, probabilities, map_mean,
            idx_exc, batch_size=4)
        coded_mpix = serve_row("roundtrip", compressor)
        # Same pipeline on the bf16w+ serving transforms (the headline
        # fast path feeding real bitstreams).
        compressor_fast = PipelinedCompressor(
            params, bin_widths, learn_bin_widths, probabilities, map_mean,
            idx_exc, batch_size=4, fast_path="bf16w+")
        coded_fast_mpix = serve_row("roundtrip_fast", compressor_fast)
        # Compress-only serving (no decode dispatch / reconstruction
        # fetch - the production "archive this stream" workload).
        compressor_co = PipelinedCompressor(
            params, bin_widths, learn_bin_widths, probabilities, map_mean,
            idx_exc, batch_size=4, reconstruct=False)
        coded_compress_only_mpix = serve_row("compress_only", compressor_co,
                                             repeats=7)
        if compressor_co.last_timing is not None:
            wall = max(compressor_co.last_timing["wall"], 1e-9)
            coded_spread["compress_only"]["phase_fractions"] = {
                phase: round(compressor_co.last_timing[phase] / wall, 3)
                for phase in ("coder", "fetch_wait")}
        # Same workload with the verify-decode skipped (encode-only
        # coder entry; identical bitstreams - see the differential and
        # self tests).
        compressor_nv = PipelinedCompressor(
            params, bin_widths, learn_bin_widths, probabilities, map_mean,
            idx_exc, batch_size=4, reconstruct=False, verify=False)
        coded_noverify_mpix = serve_row("compress_only_noverify",
                                        compressor_nv, repeats=7)

        # Coder in isolation (no device, no link): Msym/s of the C++
        # pool on this host over the actual trained-model symbols of
        # the whole stack - separates the coder ceiling from the
        # tunnel-bound serving numbers above.
        from autoencoder_based_image_compression_tpu.coding.compression import (
            compress_lossless_images)

        symbol_batches = []
        for start in range(0, images.shape[0], 8):
            (s16, s8, bmax) = compressor_co.encode_symbols_fn(
                compressor_co.params, jnp.asarray(images[start:start + 8]),
                compressor_co.bin_widths, compressor_co.map_mean)
            symbol_batches.append(
                numpy.asarray(s8).astype(numpy.int16)
                if float(bmax) <= 127.0 else numpy.asarray(s16))
        symbols_all = numpy.concatenate(symbol_batches, axis=0)
        nb_symbols = symbols_all.size
        coder_msym = {}
        for (mode, verify) in (("roundtrip", True), ("encode_only", False)):
            seconds = _timeit(
                lambda v=verify: compress_lossless_images(
                    symbols_all, probabilities, idx_exc, verify=v),
                repeats=3)
            coder_msym[mode] = nb_symbols / seconds / 1.0e6

    print(json.dumps({
        "metric": ("SMOKE_kodak24_encode_decode_throughput" if SMOKE
                   else "kodak24_encode_decode_throughput"),
        "value": round(mpix_per_s, 3),
        "unit": "Mpix/s/chip",
        "vs_baseline": round(mpix_per_s / baseline_mpix, 3),
        "headline_path": headline_tag,
        "int8_mpix_per_s": round(mpix["int8"], 3),
        "bf16w_mpix_per_s": round(mpix["bf16w"], 3),
        "bf16wplus_mpix_per_s": round(mpix["bf16w+"], 3),
        "bf16wplus_fp32_tail": {"enc": bf16wplus_enc, "dec": bf16wplus_dec,
                                "enc_precision": bf16wplus_prec},
        "gate_pass_worst_0p05db": gate_pass,
        "fp32_mpix_per_s": round(fp32_mpix, 3),
        "fast_vs_fp32_psnr_db": {tag: round(float(v), 2)
                                 for (tag, v) in fidelity.items()},
        "psnr_delta_vs_fp32_db": {tag: round(float(v), 4)
                                  for (tag, v) in psnr_delta.items()},
        "psnr_delta_vs_fp32_worst_db": {
            tag: {m: round(v, 4) for (m, v) in worst.items()}
            for (tag, worst) in psnr_delta_worst.items()},
        "true_bitstream_fast_mpix_per_s": (round(coded_fast_mpix, 3)
                                           if coded_fast_mpix is not None
                                           else None),
        "true_bitstream_compress_only_mpix_per_s": (
            round(coded_compress_only_mpix, 3)
            if coded_compress_only_mpix is not None else None),
        "true_bitstream_mpix_per_s": (round(coded_mpix, 3)
                                      if coded_mpix is not None else None),
        "true_bitstream_compress_only_noverify_mpix_per_s": (
            round(coded_noverify_mpix, 3)
            if coded_noverify_mpix is not None else None),
        "true_bitstream_spread_mpix_per_s": coded_spread or None,
        "link_mb_per_s": link_mb_per_s,
        "coder_msym_per_s": ({mode: round(v, 2)
                              for (mode, v) in coder_msym.items()}
                             if coder_msym is not None else None),
        "weights": weights_kind,
    }))


if __name__ == "__main__":
    main()
