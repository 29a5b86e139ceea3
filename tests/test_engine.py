"""Inference-engine tests: Pallas GDN kernel parity, int8 weight
quantization, dequant folding exactness, bf16 fast-path accuracy."""

import jax
import jax.numpy as jnp
import numpy

from autoencoder_based_image_compression_tpu.engine import quantized as engine
from autoencoder_based_image_compression_tpu.models import conv_eae
from autoencoder_based_image_compression_tpu.ops.gdn import gdn, inverse_gdn
from autoencoder_based_image_compression_tpu.ops.pallas.gdn_kernel import (
    gdn_pallas_2d,
    gdn_quantize_pallas_2d,
)
from autoencoder_based_image_compression_tpu.ops.quantization import quantize_per_map


def _gdn_inputs(rows=300, channels=128, seed=0):
    rng = numpy.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(rows, channels)).astype(numpy.float32))
    gamma = jnp.asarray(
        numpy.abs(rng.normal(size=(channels, channels))).astype(numpy.float32) * 0.01)
    beta = jnp.ones((channels,), jnp.float32)
    return (x, gamma, beta)


def test_pallas_gdn_matches_xla():
    (x, gamma, beta) = _gdn_inputs()
    out = gdn_pallas_2d(x, gamma, beta, interpret=True)
    numpy.testing.assert_allclose(numpy.asarray(out), numpy.asarray(gdn(x, gamma, beta)),
                                  rtol=1e-5, atol=1e-6)


def test_pallas_igdn_matches_xla():
    (x, gamma, beta) = _gdn_inputs(seed=1)
    out = gdn_pallas_2d(x, gamma, beta, inverse=True, interpret=True)
    numpy.testing.assert_allclose(numpy.asarray(out),
                                  numpy.asarray(inverse_gdn(x, gamma, beta)),
                                  rtol=1e-5, atol=1e-6)


def test_pallas_fused_gdn_quantize():
    (x, gamma, beta) = _gdn_inputs(seed=2)
    bin_widths = jnp.full((128,), 0.5, jnp.float32)
    out = gdn_quantize_pallas_2d(x, gamma, beta, bin_widths, interpret=True)
    expected = quantize_per_map(gdn(x, gamma, beta), bin_widths)
    numpy.testing.assert_allclose(numpy.asarray(out), numpy.asarray(expected),
                                  rtol=1e-5, atol=1e-6)


def test_pallas_gdn_row_padding():
    # Non-multiple row counts exercise the pad/slice path.
    (x, gamma, beta) = _gdn_inputs(rows=77, seed=3)
    out = gdn_pallas_2d(x, gamma, beta, block_rows=64, interpret=True)
    assert out.shape == x.shape
    numpy.testing.assert_allclose(numpy.asarray(out), numpy.asarray(gdn(x, gamma, beta)),
                                  rtol=1e-5, atol=1e-6)


def test_explicit_tconv_matches_linear_transpose():
    # The engine's hand-written lhs-dilated transposed conv must equal
    # the parity path's jax.linear_transpose formulation exactly (it is
    # the same linear operator).
    rng = numpy.random.default_rng(7)
    for (stride, kernel) in [(4, 9), (2, 5)]:
        w = jnp.asarray(rng.normal(size=(kernel, kernel, 5, 3)).astype(numpy.float32))
        y = jnp.asarray(rng.normal(size=(2, 6, 8, 3)).astype(numpy.float32))
        expected = conv_eae.conv_transpose_same(y, w, stride)
        got = engine._tconv_bf16(y, w, stride)
        # bf16 inputs: error is bounded relative to the output scale,
        # not elementwise (near-zero sums have large relative error).
        scale = numpy.abs(numpy.asarray(expected)).max()
        assert numpy.abs(numpy.asarray(got) - numpy.asarray(expected)).max() < 3e-2 * scale
        # And in a float32 variant of the same formula, exact:
        k = w.shape[0]
        pad_total = k - stride
        (lo, hi) = (pad_total // 2, pad_total - pad_total // 2)
        w_t = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
        exact = jax.lax.conv_general_dilated(
            y, w_t, (1, 1),
            ((k - 1 - lo, k - 1 - hi), (k - 1 - lo, k - 1 - hi)),
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        numpy.testing.assert_allclose(numpy.asarray(exact), numpy.asarray(expected),
                                      rtol=1e-5, atol=1e-5)


def test_int8_quantization_roundtrip_error():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    qparams = engine.quantize_params_int8(params)
    dequantized = engine.dequantize_int8_params(qparams, dtype=jnp.float32)
    for name in ("weights_1", "weights_4"):
        w = numpy.asarray(params[name])
        wq = numpy.asarray(dequantized[name])
        # absmax per-channel scaling bounds the error by scale/2.
        axis = engine._OUT_AXIS[name]
        reduce_axes = tuple(a for a in range(w.ndim) if a != axis)
        scale = numpy.abs(w).max(axis=reduce_axes, keepdims=True) / 127.0
        assert numpy.all(numpy.abs(w - wq) <= 0.5 * scale + 1e-9)
    # Non-conv leaves pass through untouched.
    numpy.testing.assert_array_equal(numpy.asarray(qparams["gamma_1"]),
                                     numpy.asarray(params["gamma_1"]))


def test_fold_bin_widths_exact():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(1), True)
    bin_widths = jnp.asarray(
        numpy.random.default_rng(2).uniform(0.8, 4.0, 128).astype(numpy.float32))
    rng = numpy.random.default_rng(3)
    symbols = jnp.asarray(
        rng.integers(-10, 11, size=(2, 4, 6, 128)).astype(numpy.float32))
    # Reference: dequantize then decode (fp32 path).
    reference = conv_eae.decode(params, symbols * bin_widths, True)
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    via_fold = conv_eae.decode(folded, symbols, True)
    # Exact up to float32 rounding; the random-init IGDN cascade blows
    # activations up to ~1e4+, so compare relative to the output scale.
    ref = numpy.asarray(reference)
    scale = numpy.abs(ref).max()
    assert numpy.abs(numpy.asarray(via_fold) - ref).max() <= 1e-5 * scale


def test_fold_rejects_fixed_bw_architecture():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(2), False)
    try:
        engine.fold_bin_widths_into_decoder(params, jnp.ones(128))
    except ValueError:
        return
    raise AssertionError("expected ValueError for the fixed-bw architecture")


def test_fast_decode_fixed_bw_runs():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(5), False)
    qparams = engine.quantize_params_int8(params)
    rng = numpy.random.default_rng(6)
    symbols = jnp.asarray(rng.integers(-5, 6, size=(1, 2, 3, 128)).astype(numpy.float32))
    bin_widths = jnp.full((128,), 1.5, jnp.float32)
    out = engine.fast_decode_fixed_bw(qparams, symbols, bin_widths)
    assert out.shape == (1, 32, 48, 1)
    # Structurally consistent with the fp32 path (gross-breakage bound;
    # see test_fast_path_close_to_parity_path for the rationale).
    reference = conv_eae.decode(params, symbols * bin_widths, False)
    ref = numpy.asarray(reference)
    rms_signal = numpy.sqrt(numpy.mean(ref ** 2))
    rms_delta = numpy.sqrt(numpy.mean((ref - numpy.asarray(out)) ** 2))
    assert rms_delta < 0.12 * rms_signal


def test_fast_path_close_to_parity_path():
    # bf16 activations + int8 weights must stay within a small PSNR-ish
    # delta of the fp32 parity path on image-scale inputs.
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(3), True)
    rng = numpy.random.default_rng(4)
    images = jnp.asarray(rng.integers(16, 236, size=(2, 64, 64, 1))
                         .astype(numpy.float32))
    bin_widths = jnp.ones((128,), jnp.float32)

    y_ref = conv_eae.encode(params, images, True)
    q_ref = quantize_per_map(y_ref, bin_widths)
    rec_ref = conv_eae.decode(params, q_ref, True)

    qparams = engine.quantize_params_int8(params)
    y_fast = engine.fast_encode(qparams, images, learn_bin_widths=True)
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    qfolded = engine.quantize_params_int8(folded)
    symbols = jnp.round(y_fast / bin_widths)
    rec_fast = engine.fast_decode(qfolded, symbols)

    ref = numpy.asarray(rec_ref)
    fast = numpy.asarray(rec_fast)
    rms_signal = numpy.sqrt(numpy.mean(ref ** 2))
    rms_delta = numpy.sqrt(numpy.mean((ref - fast) ** 2))
    # Gross-breakage guard only: at random init the IGDN cascade
    # amplifies the int8/bf16 error by orders of magnitude (activations
    # reach ~1e4), so elementwise parity is meaningless here. The real
    # accuracy gate for the fast path is PSNR-vs-parity-path on a
    # *trained* model (decoder outputs in the BT.601 range), evaluated
    # by the throughput/parity harness.
    assert rms_delta < 0.12 * rms_signal


def test_fast_roundtrip_scan_matches_per_batch():
    """One scan dispatch over K stacked batches must reproduce the
    per-batch fast path exactly (same program, different dispatch)."""
    rng = numpy.random.default_rng(11)
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(2), True)
    bin_widths = jnp.asarray(0.5 + rng.random(128).astype(numpy.float32))
    qparams = engine.quantize_params_int8(params)
    qfolded = engine.quantize_params_int8(
        engine.fold_bin_widths_into_decoder(params, bin_widths))
    stack = jnp.asarray(rng.integers(0, 256, size=(3, 2, 32, 32, 1))
                        .astype(numpy.float32))
    (recs, symbols) = engine.fast_roundtrip_scan(qparams, qfolded, stack,
                                                 bin_widths)
    assert recs.shape == stack.shape
    assert symbols.shape == (3, 2, 2, 2, 128)
    for k in range(3):
        y = engine.fast_encode(qparams, stack[k], learn_bin_widths=True)
        sym = jnp.round(y / bin_widths)
        rec = engine.fast_decode(qfolded, sym)
        numpy.testing.assert_array_equal(numpy.asarray(symbols[k]),
                                         numpy.asarray(sym))
        numpy.testing.assert_allclose(numpy.asarray(recs[k]),
                                      numpy.asarray(rec), rtol=1e-6, atol=1e-5)


def test_space_to_depth_conv1_matches_strided_conv():
    """The s2d formulation of the 9x9 stride-4 conv must reproduce the
    TF-SAME strided conv exactly (both sides computed in fp32)."""
    rng = numpy.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 64, 48, 1)).astype(numpy.float32))
    w9 = jnp.asarray(rng.normal(size=(9, 9, 1, 128)).astype(numpy.float32))
    direct = jax.lax.conv_general_dilated(
        x, w9, window_strides=(4, 4), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    s2d = engine._conv1_s2d(x, w9, dtype=jnp.float32)
    numpy.testing.assert_allclose(numpy.asarray(s2d), numpy.asarray(direct),
                                  rtol=1e-5, atol=1e-4)


def test_depth_to_space_tconv6_matches_transposed_conv():
    """fp32 s2d transposed conv vs the true linear transpose of the
    fp32 strided conv."""
    rng = numpy.random.default_rng(6)
    y = jnp.asarray(rng.normal(size=(2, 16, 12, 128)).astype(numpy.float32))
    w9 = jnp.asarray(rng.normal(size=(9, 9, 1, 128)).astype(numpy.float32))

    def forward(x):
        return jax.lax.conv_general_dilated(
            x, w9, window_strides=(4, 4), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    x0 = jnp.zeros((2, 64, 48, 1), jnp.float32)
    (direct,) = jax.linear_transpose(forward, x0)(y)
    s2d = engine._tconv6_s2d(y, w9, dtype=jnp.float32)
    numpy.testing.assert_allclose(numpy.asarray(s2d), numpy.asarray(direct),
                                  rtol=1e-5, atol=1e-4)


def test_fast_path_s2d_matches_plain():
    """bf16 fast path with and without space-to-depth agrees closely."""
    rng = numpy.random.default_rng(7)
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(3), True)
    bin_widths = jnp.ones((128,), jnp.float32)
    qparams = engine.quantize_params_int8(params)
    qfolded = engine.quantize_params_int8(
        engine.fold_bin_widths_into_decoder(params, bin_widths))
    batch = jnp.asarray(rng.integers(0, 256, size=(2, 32, 32, 1))
                        .astype(numpy.float32))
    y_plain = engine.fast_encode(qparams, batch, use_s2d=False)
    y_s2d = engine.fast_encode(qparams, batch, use_s2d=True)
    numpy.testing.assert_allclose(numpy.asarray(y_s2d), numpy.asarray(y_plain),
                                  rtol=1e-2, atol=2e-2)
    symbols = jnp.round(y_plain / bin_widths)
    rec_plain = engine.fast_decode(qfolded, symbols, use_s2d=False)
    rec_s2d = engine.fast_decode(qfolded, symbols, use_s2d=True)
    numpy.testing.assert_allclose(numpy.asarray(rec_s2d),
                                  numpy.asarray(rec_plain),
                                  rtol=1e-2, atol=2e-2)


def test_bf16_weight_variant_beats_int8_on_trained_model():
    """The bf16w+ serving default must sit closest to the fp32 parity
    path of all fast variants on the trained model (its reason to
    exist), and every variant must land within a sanity band on
    image-like content. (The relative ordering of the plain bf16w and
    int8 stores is weight-distribution-dependent - the step-84k weights
    reversed it on small samples - so it is not asserted.)"""
    import os

    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_luminance_stack)
    from autoencoder_based_image_compression_tpu.ops.metrics import psnr_2d
    from autoencoder_based_image_compression_tpu.ops.quantization import cast_bt601
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact)

    artifact = os.path.join(os.path.dirname(__file__), "..", "results", "eae",
                            "learning_bw", "0dot5_10000", "params_trained.npz")
    (params, bin_widths) = load_params_artifact(artifact)
    images = jnp.asarray(synthetic_luminance_stack(2, 128, 192, seed=5)
                         .astype(numpy.float32))

    y = conv_eae.encode(params, images, True)
    rec_ref = cast_bt601(numpy.asarray(
        conv_eae.decode(params, quantize_per_map(y, bin_widths), True))[..., 0])
    orig = cast_bt601(numpy.asarray(images)[..., 0])
    psnr_ref = numpy.mean([psnr_2d(orig[i], rec_ref[i]) for i in range(2)])

    sym_ref = numpy.asarray(jnp.round(y / bin_widths))
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    (enc_p, dec_p) = (engine.BF16WPLUS_ENC_TAIL, engine.BF16WPLUS_DEC_TAIL)
    deltas = {}
    flips = {}
    rvr = {}
    for (tag, qp, qf, enc_tail, dec_tail) in [
            ("int8", engine.quantize_params_int8(params),
             engine.quantize_params_int8(folded), 0, 0),
            ("bf16w", engine.bf16_weight_params(params),
             engine.bf16_weight_params(folded), 0, 0),
            ("bf16w+", engine.bf16_weight_params(params, fp32_enc_tail=enc_p),
             engine.bf16_weight_params(folded, fp32_tail=dec_p),
             enc_p, dec_p)]:
        y_fast = engine.fast_encode(qp, images, learn_bin_widths=True,
                                    fp32_enc_tail=enc_tail)
        sym = numpy.asarray(jnp.round(y_fast / bin_widths))
        flips[tag] = float((sym != sym_ref).mean())
        rec = cast_bt601(numpy.asarray(
            engine.fast_decode(qf, jnp.asarray(sym),
                               fp32_tail=dec_tail))[..., 0])
        rvr[tag] = numpy.mean([
            psnr_2d(rec_ref[i], rec[i])
            if not numpy.array_equal(rec_ref[i], rec[i]) else 99.0
            for i in range(2)])
        psnr = numpy.mean([psnr_2d(orig[i], rec[i]) for i in range(2)])
        deltas[tag] = abs(float(psnr - psnr_ref))
    # The serving default's fp32 analysis transform makes the SYMBOLS
    # (near-)exact - the property the worst-case gate rests on - and
    # its reconstruction tracks the parity reconstruction strictly
    # closer than the all-bf16 variant's. (Ordering of mean
    # PSNR-vs-original deltas on a 2-image sample is noise and is NOT
    # asserted; the 0.05 dB gate itself is measured on the full
    # Kodak-shaped batch in bench.py.)
    assert flips["bf16w+"] <= 1.0e-4
    assert flips["bf16w"] > flips["bf16w+"]
    assert rvr["bf16w+"] > rvr["bf16w"]
    assert rvr["bf16w+"] > 50.0
    # Sample-appropriate sanity bands for the all-low-precision stores.
    assert deltas["bf16w+"] < 0.12
    assert deltas["bf16w"] < 0.25
    assert deltas["int8"] < 0.5


def test_pallas_gdn_bf16_matches_gdn_lowp():
    # ADVICE r4: the bf16 branch of the Pallas kernel (gdn_lowp
    # semantics: bf16 MXU operands, fp32 accumulation/rsqrt, bf16 out)
    # must track ops.gdn.gdn_lowp in interpret mode, both directions.
    from autoencoder_based_image_compression_tpu.ops.gdn import gdn_lowp

    (x, gamma, beta) = _gdn_inputs(seed=11)
    x16 = x.astype(jnp.bfloat16)
    for inverse in (False, True):
        out = gdn_pallas_2d(x16, gamma, beta, inverse=inverse, interpret=True)
        assert out.dtype == jnp.bfloat16
        expected = gdn_lowp(x16, gamma, beta, inverse=inverse)
        diff = numpy.abs(numpy.asarray(out, numpy.float32)
                         - numpy.asarray(expected, numpy.float32))
        scale = numpy.abs(numpy.asarray(expected, numpy.float32)).max()
        # Both compute the same bf16-rounded math; tolerance covers the
        # final bf16 rounding of each path.
        assert diff.max() <= 0.02 * scale


def test_fp32_tail_full_decode_matches_parity():
    # fp32_tail=3 runs the whole synthesis transform in HIGHEST fp32:
    # on unrounded weights it must agree with the parity decoder up to
    # formulation-level float32 rounding (explicit tconv + s2d).
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(5), True)
    bin_widths = jnp.asarray(
        numpy.random.default_rng(6).uniform(0.8, 4.0, 128).astype(numpy.float32))
    symbols = jnp.asarray(numpy.random.default_rng(7).integers(
        -10, 11, size=(2, 4, 8, 128)).astype(numpy.float32))
    expected = numpy.asarray(conv_eae.decode(params, symbols * bin_widths, True))
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    qf = engine.bf16_weight_params(folded, fp32_tail=3)
    # The tail level keeps every decoder kernel unrounded.
    assert qf["weights_4"].dtype == jnp.float32
    assert qf["weights_6"].dtype == jnp.float32
    got = numpy.asarray(engine.fast_decode(qf, symbols, fp32_tail=3))
    scale = numpy.abs(expected).max()
    assert numpy.abs(got - expected).max() <= 1e-4 * scale


def test_fp32_tail_reduces_decode_error():
    # The precision-surgical levels must not be worse than plain bf16,
    # and the full-fp32 level must be far closer to the parity decode.
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(8), True)
    bin_widths = jnp.full((128,), 1.0, jnp.float32)
    symbols = jnp.asarray(numpy.random.default_rng(9).integers(
        -8, 9, size=(1, 4, 8, 128)).astype(numpy.float32))
    expected = numpy.asarray(conv_eae.decode(params, symbols * bin_widths, True))
    folded = engine.fold_bin_widths_into_decoder(params, bin_widths)
    errs = {}
    for tail in (0, 1, 3):
        qf = engine.bf16_weight_params(folded, fp32_tail=tail)
        got = numpy.asarray(engine.fast_decode(qf, symbols, fp32_tail=tail))
        errs[tail] = numpy.abs(got - expected).mean()
    assert errs[3] < 0.05 * errs[0]
    assert errs[1] <= 1.10 * errs[0]


def test_fp32_enc_tail_full_matches_parity_encode():
    # fp32_enc_tail=3 with the plain strided formulation runs the whole
    # analysis transform in HIGHEST fp32: it must agree with the parity
    # encoder up to float32 rounding (same ops, same padding).
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(12), True)
    rng = numpy.random.default_rng(13)
    batch = jnp.asarray(rng.integers(0, 256, size=(2, 32, 48, 1))
                        .astype(numpy.float32))
    expected = numpy.asarray(conv_eae.encode(params, batch, True))
    qp = engine.bf16_weight_params(params, fp32_enc_tail=3)
    assert qp["weights_1"].dtype == jnp.float32
    assert qp["weights_3"].dtype == jnp.float32
    got = numpy.asarray(engine.fast_encode(qp, batch, fp32_enc_tail=3,
                                           use_s2d=False))
    scale = numpy.abs(expected).max()
    assert numpy.abs(got - expected).max() <= 1e-4 * scale
    # And the surgical level reduces the latent error vs plain bf16.
    err = {}
    for enc_tail in (0, 1):
        qp_t = engine.bf16_weight_params(params, fp32_enc_tail=enc_tail)
        y = numpy.asarray(engine.fast_encode(qp_t, batch,
                                             fp32_enc_tail=enc_tail))
        err[enc_tail] = numpy.abs(y - expected).mean()
    assert err[1] < err[0]
