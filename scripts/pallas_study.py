"""Measured Pallas-vs-XLA study for the GDN kernels (on the real chip).

Settles the "fused Pallas kernels" question with numbers instead of an
unused code path: benchmarks, at the codec's serving shapes,

1. GDN / IGDN in isolation - the XLA op (``ops.gdn.gdn`` fp32 /
   ``gdn_lowp`` bf16) against the Pallas kernel (``gdn_pallas_2d``,
   dtype-preserving), and
2. the fused GDN+quantize Pallas kernel against the unfused XLA
   sequence the encoder bottleneck otherwise runs, and
3. the END-TO-END serving engine (``engine.fast_roundtrip_scan``) with
   ``use_pallas`` off vs on (trained weights, Kodak-shaped batch).

The winner becomes the engine default; the table goes into BASELINE.md.

Timing discipline mirrors bench.py: a 4-byte checksum fetch is the
completion barrier (block_until_ready does not reliably block on the
axon platform, and bulk fetches would measure the dev tunnel).

Usage: ``python scripts/pallas_study.py`` (needs the TPU; do not run
while another process holds the chip).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from autoencoder_based_image_compression_tpu.utils.compile_cache import (
    enable_persistent_cache)

enable_persistent_cache()


def _timeit(fn, repeats=5):
    fn()  # warmup / compile
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
    return min(times)


def bench_gdn_isolated(nb_rows, repeats_in_flight=8):
    """GDN/IGDN at one serving shape, XLA vs Pallas, fp32 and bf16."""
    from autoencoder_based_image_compression_tpu.ops.gdn import (
        gdn,
        gdn_lowp,
        init_gdn_gamma,
    )
    from autoencoder_based_image_compression_tpu.ops.pallas.gdn_kernel import (
        gdn_pallas_2d,
        gdn_quantize_pallas_2d,
    )

    key = jax.random.PRNGKey(0)
    gamma = init_gdn_gamma(key, 128)
    beta = jnp.full((128,), 1.0e-3, jnp.float32)
    bin_widths = jnp.full((128,), 0.8, jnp.float32)
    x32 = jax.device_put(jax.random.normal(key, (nb_rows, 128), jnp.float32))
    x16 = jax.device_put(x32.astype(jnp.bfloat16))

    xla_gdn = jax.jit(lambda x: jnp.sum(gdn(x, gamma, beta)))
    xla_gdn_lowp = jax.jit(
        lambda x: jnp.sum(gdn_lowp(x, gamma, beta).astype(jnp.float32)))
    pallas_gdn32 = jax.jit(lambda x: jnp.sum(gdn_pallas_2d(x, gamma, beta)))
    pallas_gdn16 = jax.jit(
        lambda x: jnp.sum(gdn_pallas_2d(x, gamma, beta).astype(jnp.float32)))
    xla_gdn_quant = jax.jit(lambda x: jnp.sum(
        bin_widths * jnp.round(gdn(x, gamma, beta) / bin_widths)))
    pallas_gdn_quant = jax.jit(lambda x: jnp.sum(
        gdn_quantize_pallas_2d(x, gamma, beta, bin_widths)))

    def run(fn, x):
        def _run():
            checksums = [fn(x) for _ in range(repeats_in_flight)]
            for c in checksums:
                numpy.asarray(c)
        return _run

    out = {}
    for (tag, fn, x) in [
            ("xla_fp32", xla_gdn, x32),
            ("pallas_fp32", pallas_gdn32, x32),
            ("xla_bf16", xla_gdn_lowp, x16),
            ("pallas_bf16", pallas_gdn16, x16),
            ("xla_gdn_quant_fp32", xla_gdn_quant, x32),
            ("pallas_fused_gdn_quant_fp32", pallas_gdn_quant, x32)]:
        seconds = _timeit(run(fn, x))
        out[tag] = repeats_in_flight * nb_rows / seconds / 1.0e9  # Grows/s
    return out


def bench_end_to_end():
    """fast_roundtrip_scan with use_pallas off/on, trained weights."""
    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_kodak)
    from autoencoder_based_image_compression_tpu.engine import quantized as engine
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact)

    artifact = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "eae", "learning_bw", "0dot5_10000", "params_trained.npz")
    (params, bin_widths) = load_params_artifact(artifact)
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    qp = engine.bf16_weight_params(params)
    qf = engine.bf16_weight_params(folded)

    images = synthetic_kodak(seed=0).astype(numpy.float32)
    NB_SCAN = 8
    stack = numpy.stack([numpy.roll(images, 37 * k + 11, axis=2)
                         for k in range(NB_SCAN)])
    stack = jax.device_put(jnp.asarray(stack))
    nb_pixels = NB_SCAN * images.shape[0] * images.shape[1] * images.shape[2]

    out = {}
    for use_pallas in (False, True):
        fn = jax.jit(lambda s, up=use_pallas: (
            lambda pair: jnp.sum(pair[0]) + jnp.sum(pair[1]))(
                engine.fast_roundtrip_scan(qp, qf, s, bin_widths,
                                           use_pallas=up)))

        def run():
            checksums = [fn(stack) for _ in range(2)]
            for c in checksums:
                numpy.asarray(c)

        seconds = _timeit(run)
        out["pallas" if use_pallas else "xla"] = (
            2 * nb_pixels / seconds / 1.0e6)  # Mpix/s
    return out


def main():
    print(f"devices: {jax.devices()}")
    results = {"gdn_isolated_grows_per_s": {}}
    # Serving shapes: H/4 (conv1 output, 24 x 128 x 192 rows) and H/8.
    for (label, rows) in [("H4_24x128x192", 24 * 128 * 192),
                          ("H8_24x64x96", 24 * 64 * 96)]:
        results["gdn_isolated_grows_per_s"][label] = bench_gdn_isolated(rows)
    results["end_to_end_mpix_per_s"] = bench_end_to_end()
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
