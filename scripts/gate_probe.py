"""On-chip probe: which (fp32_enc_tail, fp32_dec_tail) mix passes the
worst-case 0.05 dB parity gate, and at what throughput.

Round-5 finding that motivates this: with the WHOLE decode in fp32
(dec tail 3) the worst Kodak-shaped image still sat at -0.0502 dB vs
the fp32 path - the residual comes from encoder-side bf16 symbol
flips, so the encoder needs its own surgical fp32 tail
(``engine.fast_encode fp32_enc_tail``). This probe measures the
worst-case delta at bin-width multipliers {1, 4, 10} and the serving
throughput for a grid of mixes; the cheapest passing mix becomes the
"bf16w+" serving default in bench.py and PipelinedCompressor.

Usage: ``python scripts/gate_probe.py [--configs 1,3 2,3 1,1 ...]``
"""

import argparse
import json
import os
import sys
import time

import numpy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache)

enable_persistent_cache()

import jax
import jax.numpy as jnp


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="*",
                        default=["1,3", "2,3", "1,1", "1,2", "2,1", "2,2"],
                        help="enc,dec fp32-tail level pairs to probe")
    parser.add_argument("--out", default="build/gate_probe.json")
    args = parser.parse_args()
    def parse(c):
        (enc_s, dec_s) = c.split(",")
        enc_precision = "highest"
        if enc_s.endswith("h"):
            (enc_s, enc_precision) = (enc_s[:-1], "high")
        return (int(enc_s), int(dec_s), enc_precision)

    configs = [parse(c) for c in args.configs]

    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_kodak)
    from autoencoder_based_image_compression_tpu.engine import (
        quantized as engine)
    from autoencoder_based_image_compression_tpu.models import conv_eae
    from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
    from autoencoder_based_image_compression_tpu.ops.quantization import (
        cast_bt601,
        quantize_per_map,
    )
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact)

    artifact = os.path.join(REPO, "results", "eae", "learning_bw",
                            "0dot5_10000", "params_trained.npz")
    (params, bin_widths) = load_params_artifact(artifact)
    images = synthetic_kodak(seed=0)
    nb_pixels = images.shape[0] * images.shape[1] * images.shape[2]
    orig = cast_bt601(images[..., 0].astype(numpy.float32))
    batch_all = jax.device_put(jnp.asarray(images.astype(numpy.float32)))

    @jax.jit
    def roundtrip_fp32(params, batch, bw):
        y = conv_eae.encode(params, batch, True)
        return conv_eae.decode(params, quantize_per_map(y, bw), True)

    MULTS = (1.0, 4.0, 10.0)
    psnr_fp32 = {}
    for mult in MULTS:
        rec = cast_bt601(numpy.asarray(
            roundtrip_fp32(params, batch_all, bin_widths * mult))[..., 0])
        psnr_fp32[mult] = numpy.array(
            [psnr_2d(orig[i], rec[i]) for i in range(rec.shape[0])])

    # Distinct 8-batch stack for throughput (same discipline as bench.py).
    variants = []
    for k in range(8):
        v = numpy.roll(images.astype(numpy.float32), 37 * k + 11, axis=2)
        if k % 2 == 1:
            v = v[:, ::-1]
        variants.append(v)
    stack_all = jax.device_put(jnp.asarray(numpy.stack(variants, axis=0)))

    results = {}
    for (enc, dec, enc_precision) in configs:
        tag = f"enc{enc}{'h' if enc_precision == 'high' else ''}_dec{dec}"
        qp = engine.bf16_weight_params(params, fp32_tail=dec,
                                       fp32_enc_tail=enc)
        worst = {}
        for mult in MULTS:
            bw_m = bin_widths * mult
            folded_m = engine.fold_bin_widths_into_decoder(params, bw_m)
            qf_m = engine.bf16_weight_params(folded_m, fp32_tail=dec)
            (recs, _) = engine.fast_roundtrip_scan(
                qp, qf_m, batch_all[None], bw_m,
                fp32_tail=dec, fp32_enc_tail=enc,
                enc_precision=enc_precision)
            rec = cast_bt601(numpy.asarray(recs[0])[..., 0])
            deltas = numpy.array(
                [psnr_2d(orig[i], rec[i])
                 for i in range(rec.shape[0])]) - psnr_fp32[mult]
            worst[f"x{mult:g}"] = round(float(deltas.min()), 4)

        folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
        qf = engine.bf16_weight_params(folded, fp32_tail=dec)

        @jax.jit
        def checksum(qp, qf, stack, bw):
            (recs, symbols) = engine.fast_roundtrip_scan(
                qp, qf, stack, bw, fp32_tail=dec, fp32_enc_tail=enc,
                enc_precision=enc_precision)
            return jnp.sum(recs) + jnp.sum(symbols)

        def run():
            sums = [checksum(qp, qf, stack_all, bin_widths) for _ in range(2)]
            for s in sums:
                numpy.asarray(s)

        run()  # compile + warm
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        mpix = 8 * 2 * nb_pixels / min(times) / 1.0e6
        results[tag] = {"worst_delta_db": worst,
                        "gate_pass": bool(min(worst.values()) >= -0.05),
                        "mpix_per_s": round(mpix, 1)}
        print(tag, json.dumps(results[tag]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as file:
        json.dump(results, file, indent=2)
    print("written", args.out)


if __name__ == "__main__":
    main()
