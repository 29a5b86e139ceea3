"""Weight quantization, dequant folding and fast bf16 transforms.

North-star items (BASELINE.json):

- **INT8 weight-only quantization with fp32 scales**: every conv kernel
  is stored int8 with a per-output-channel absmax scale; weights
  dequantize on the fly (XLA fuses the convert+scale into the conv).
- **Dequant fused into the decoder's first transposed conv**: the
  uniform dequantizer ``y = delta_c * q_c`` is linear per channel, and
  so is the transposed conv, so the bin widths fold into the kernel's
  input-channel axis ahead of time - the engine decodes raw integer
  symbols with literally zero dequant cost.
- **bf16 activations** on the MXU (2x fp32 throughput), fp32
  accumulation; GDN pools in fp32 (optionally via the Pallas kernel).

The fp32 path in ``models/conv_eae.py`` remains the parity reference;
tests measure the fast path's PSNR against it.
"""

import functools

import jax
import jax.numpy as jnp

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.models import conv_eae

_CONV_NAMES = ("weights_1", "weights_2", "weights_3", "weights_4", "weights_5",
               "weights_6")

# The "bf16w+" serving default: the cheapest precision mix whose WORST
# per-image PSNR delta vs the fp32 parity path stays inside the 0.05 dB
# gate at every probed bin-width multiplier (measured on chip by
# scripts/gate_probe.py - see BASELINE.md round 5). The measured
# structure across weight distributions: the gate binds through
# ENCODER symbol flips (any bf16 encoder stage breached at some
# multiplier on the step-84k weights), while the bf16 synthesis
# transform's error is benign once the symbols are exact - so the
# default is a full-fp32 analysis transform over a bf16 synthesis
# transform. The fp32 encoder convs run at MXU Precision.HIGH (3-pass
# bf16 emulation, ~2^-21 relative error): measured bit-for-bit the
# same worst-case gate margin as HIGHEST (-0.0137 dB, 3.6x inside the
# gate) at 805 vs 577 Mpix/s/chip - the binding residual comes from
# the bf16 synthesis side, not encoder precision.
BF16WPLUS_ENC_TAIL = 3
BF16WPLUS_DEC_TAIL = 0
BF16WPLUS_ENC_PRECISION = "high"
# Output-channel axis of each kernel: encoder convs are HWIO (out = O,
# axis 3); decoder tconv kernels are stored (kh, kw, tconv_out, tconv_in)
# so their output axis is 2.
_OUT_AXIS = {"weights_1": 3, "weights_2": 3, "weights_3": 3,
             "weights_4": 2, "weights_5": 2, "weights_6": 2}


def _fp32_tail_names(fp32_tail):
    """Decoder kernels kept fp32 for a given tail level.

    Level 1 keeps the final 9x9 transposed conv fp32; level 2 also the
    5x5 tconv_5; level 3 the whole synthesis transform.
    """
    if fp32_tail <= 0:
        return frozenset()
    if fp32_tail == 1:
        return frozenset(("weights_6",))
    if fp32_tail == 2:
        return frozenset(("weights_5", "weights_6"))
    return frozenset(("weights_4", "weights_5", "weights_6"))


def _fp32_enc_tail_names(fp32_enc_tail):
    """Encoder kernels kept fp32 for a given encoder tail level.

    The on-chip gate measurements (round 5) showed the worst-case
    PSNR delta vs the fp32 path is dominated by ENCODER-side bf16
    symbol flips (a full-fp32 decode alone still breached the 0.05 dB
    gate by a hair), so the analysis transform gets the same surgical
    knob: level 1 = the latent-producing conv_3, level 2 = + conv_2,
    level 3 = the whole encoder.
    """
    if fp32_enc_tail <= 0:
        return frozenset()
    if fp32_enc_tail == 1:
        return frozenset(("weights_3",))
    if fp32_enc_tail == 2:
        return frozenset(("weights_2", "weights_3"))
    return frozenset(("weights_1", "weights_2", "weights_3"))


def bf16_weight_params(params, fp32_tail=0, fp32_enc_tail=0):
    """The bf16-weight fast-path variant: conv kernels rounded to bf16
    once, ahead of time (GDN/bias stay fp32).

    Same MXU kernels and the same speed as the int8 store (int8 weights
    dequantize to bf16 before the conv anyway), but without the int8
    rounding: measured on the trained model, the reconstruction sits
    ~50 dB from the fp32 parity path (vs ~46 dB for int8), the PSNR
    delta vs the original images is ~0.005 dB (vs ~0.03 dB) and the
    symbol flip rate ~0.6% with a rate delta of ~0.003% - an order of
    magnitude inside the parity gates. The fast transforms accept the
    result anywhere ``qparams`` is expected (plain arrays pass through
    :func:`dequantize_int8_params` unchanged).

    ``fp32_tail`` / ``fp32_enc_tail`` keep the tail decoder / encoder
    kernels unrounded (fp32) for the precision-surgical "bf16w+"
    serving path - pair them with the same levels passed to
    :func:`fast_decode` / :func:`fast_encode` so those convs actually
    run fp32.
    """
    keep = _fp32_tail_names(fp32_tail) | _fp32_enc_tail_names(fp32_enc_tail)
    return {name: (value.astype(jnp.bfloat16)
                   if name in _CONV_NAMES and name not in keep else value)
            for (name, value) in params.items()}


def quantize_params_int8(params):
    """Converts conv kernels to int8 + per-output-channel fp32 scales.

    GDN parameters and biases stay fp32 (they are tiny and
    precision-critical). Returns a new params dict where each conv
    entry is ``{"int8": int8 kernel, "scale": fp32 per-out-channel}``.
    """
    qparams = {}
    for (name, value) in params.items():
        if name in _CONV_NAMES:
            axis = _OUT_AXIS[name]
            reduce_axes = tuple(a for a in range(value.ndim) if a != axis)
            absmax = jnp.max(jnp.abs(value), axis=reduce_axes, keepdims=True)
            scale = jnp.maximum(absmax, 1e-12) / 127.0
            int8 = jnp.clip(jnp.round(value / scale), -127, 127).astype(jnp.int8)
            qparams[name] = {"int8": int8, "scale": scale.astype(jnp.float32)}
        else:
            qparams[name] = value
    return qparams


def dequantize_int8_params(qparams, dtype=jnp.bfloat16):
    """Materializes fp kernels from the int8 store (XLA fuses this into
    the consuming conv when jitted together)."""
    params = {}
    for (name, value) in qparams.items():
        if name in _CONV_NAMES and isinstance(value, dict):
            params[name] = (value["int8"].astype(jnp.float32)
                            * value["scale"]).astype(dtype)
        else:
            params[name] = value
    return params


def fold_bin_widths_into_decoder(params, bin_widths):
    """Folds the per-channel dequantizer into ``weights_4`` (and the
    IGDN_4 input when present).

    ``tconv(q * delta, w) == tconv(q, w * delta[in-axis])`` - after
    folding, the decoder consumes raw integer symbols. Only valid for
    the learned-bin-width architecture (no IGDN_4 between the symbols
    and the first tconv); with fixed bin widths IGDN_4 is nonlinear in
    its input, so the fold stops at the IGDN input scaling and is not
    applied here.
    """
    if "gamma_4" in params:
        raise ValueError(
            "dequant folding requires the learned-bin-width architecture "
            "(no IGDN_4 at the bottleneck).")
    folded = dict(params)
    w4 = params["weights_4"]
    folded["weights_4"] = w4 * jnp.asarray(bin_widths).reshape(1, 1, 1, -1)
    return folded


_PRECISIONS = {"high": jax.lax.Precision.HIGH,
               "highest": jax.lax.Precision.HIGHEST}


def _conv_bf16(x, w, stride, out_dtype=jnp.float32, dtype=jnp.bfloat16,
               fp32_precision="highest"):
    """``fp32_precision`` selects the MXU emulation level of the fp32
    convs ("highest" = 6-pass bf16, exact fp32 semantics; "high" =
    3-pass, ~2^-21 relative error - two orders tighter than plain bf16
    at roughly half HIGHEST's cost). bf16 convs always run DEFAULT."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(_PRECISIONS[fp32_precision] if dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=out_dtype)


def _tconv_bf16(y, w, stride, out_dtype=jnp.float32, dtype=jnp.bfloat16):
    """Transpose of the TF-SAME strided conv, written explicitly.

    The gradient conv of a SAME conv with kernel k, stride s and pads
    (lo, hi) = (floor((k-s)/2), ceil((k-s)/2)) is an lhs-dilated conv
    with the spatially-flipped IO-swapped kernel and pads
    (k-1-lo, k-1-hi). Written out (instead of jax.linear_transpose)
    so the bf16 kernel/activation dtypes can be chosen freely. A
    float32 ``dtype`` pins HIGHEST precision so XLA cannot re-round the
    operands to bf16 passes (same rule as the parity path's convs).
    """
    k = w.shape[0]
    pad_total = k - stride
    (lo, hi) = (pad_total // 2, pad_total - pad_total // 2)
    w_t = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    return jax.lax.conv_general_dilated(
        y.astype(dtype), w_t.astype(dtype),
        window_strides=(1, 1),
        padding=((k - 1 - lo, k - 1 - hi), (k - 1 - lo, k - 1 - hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=out_dtype)


def _space_to_depth(x, block=4):
    """(B, H, W, 1) -> (B, H/b, W/b, b*b); channel index = i*b + j for
    pixel (i, j) inside each block."""
    (batch, height, width, _) = x.shape
    x = x.reshape(batch, height // block, block, width // block, block)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(
        batch, height // block, width // block, block * block)


def _depth_to_space(x, block=4):
    """Inverse of :func:`_space_to_depth`."""
    (batch, height_blocks, width_blocks, _) = x.shape
    x = x.reshape(batch, height_blocks, width_blocks, block, block)
    return jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(
        batch, height_blocks * block, width_blocks * block, 1)


def _s2d_kernel_from_conv1(w9):
    """Rearranges the (9, 9, 1, nb_out) stride-4 kernel into the
    (3, 3, 16, nb_out) kernel of the space-to-depth formulation.

    A TF-SAME 9x9 stride-4 conv on a 1-channel image pads (2, 3); after
    space-to-depth(4) the same linear map is a 3x3 stride-1 SAME conv
    over 16-channel block-pixels: tap t (offset d = t-2 from the output
    block's origin) lands in block a = 1 + floor(d/4) at intra-block
    position j = d mod 4. One input channel starves the MXU's 128-lane
    contraction; 16 channels cut the first/last transforms' wall time.
    """
    (_, _, _, nb_out) = w9.shape
    wk = jnp.zeros((3, 3, 16, nb_out), w9.dtype)
    for t_h in range(9):
        (a_h, j_h) = (1 + (t_h - 2) // 4, (t_h - 2) % 4)
        for t_w in range(9):
            (a_w, j_w) = (1 + (t_w - 2) // 4, (t_w - 2) % 4)
            wk = wk.at[a_h, a_w, j_h * 4 + j_w, :].set(w9[t_h, t_w, 0, :])
    return wk


def _conv1_s2d(x, w9, dtype=jnp.bfloat16, out_dtype=jnp.float32,
               fp32_precision="highest"):
    """The encoder's first conv as space-to-depth + 3x3 conv."""
    wk = _s2d_kernel_from_conv1(w9)
    return jax.lax.conv_general_dilated(
        _space_to_depth(x).astype(dtype), wk.astype(dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(_PRECISIONS[fp32_precision] if dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=out_dtype)


def _tconv6_s2d(y, w9, dtype=jnp.bfloat16):
    """The decoder's last transposed conv as 3x3 conv + depth-to-space.

    The adjoint of ``s2d -> conv(wk)`` is ``conv(wk flipped, io-swapped)
    -> d2s`` (stride-1 SAME 3x3 is self-adjoint in its padding), which
    is exactly the TF-SAME 9x9 stride-4 transposed conv.
    """
    wk = _s2d_kernel_from_conv1(w9)
    wk_t = jnp.transpose(wk[::-1, ::-1, :, :], (0, 1, 3, 2))
    out16 = jax.lax.conv_general_dilated(
        y.astype(dtype), wk_t.astype(dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=(jax.lax.Precision.HIGHEST if dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
        preferred_element_type=jnp.float32)
    return _depth_to_space(out16)


def _gdn_fast(x, gamma, beta, inverse, use_pallas):
    if use_pallas:
        from autoencoder_based_image_compression_tpu.ops.pallas.gdn_kernel import (
            gdn_pallas)

        # Dtype-preserving: a bf16 activation stream stays bf16 through
        # the kernel (gdn_lowp semantics), matching the XLA fast path
        # byte for byte in HBM traffic.
        return gdn_pallas(x, gamma, beta, inverse=inverse)
    if x.dtype == jnp.bfloat16:
        # Fast path keeps activations bf16 *through* the normalization:
        # at the H/4 feature resolution GDN is HBM-bandwidth-bound, so
        # halving the streamed bytes is worth ~20% end-to-end (pool
        # matmul still accumulates fp32; rsqrt in fp32 - ops/gdn.py).
        from autoencoder_based_image_compression_tpu.ops.gdn import gdn_lowp

        return gdn_lowp(x, gamma, beta, inverse=inverse)
    from autoencoder_based_image_compression_tpu.ops.gdn import gdn, inverse_gdn

    fn = inverse_gdn if inverse else gdn
    return fn(x.astype(jnp.float32), gamma, beta)


def _encode_tail_dtypes(fp32_enc_tail):
    """Per-stage dtypes of the analysis transform for an encoder tail
    level: ``(c1_dtype, c1_out, c2_dtype, c2_out, c3_dtype)``. From the
    chosen level on, every conv runs HIGHEST-precision fp32 and the GDN
    between fp32 stages pools/scales in fp32."""
    bf16 = jnp.bfloat16
    f32 = jnp.float32
    return (f32 if fp32_enc_tail >= 3 else bf16,  # conv_1 operand dtype
            f32 if fp32_enc_tail >= 2 else bf16,  # conv_1 output -> GDN_1
            f32 if fp32_enc_tail >= 2 else bf16,  # conv_2 operand dtype
            f32 if fp32_enc_tail >= 1 else bf16,  # conv_2 output -> GDN_2
            f32 if fp32_enc_tail >= 1 else bf16)  # conv_3 operand dtype


@functools.partial(jax.jit,
                   static_argnames=("learn_bin_widths", "use_pallas", "use_s2d",
                                    "fp32_enc_tail", "enc_precision"))
def fast_encode(qparams, visible_units, learn_bin_widths=True, use_pallas=False,
                use_s2d=True, fp32_enc_tail=0, enc_precision="highest"):
    """bf16 analysis transform over int8-stored weights.

    ``use_s2d`` runs the first conv in its space-to-depth formulation
    (16 input channels instead of 1 - see :func:`_s2d_kernel_from_conv1`).
    ``fp32_enc_tail`` runs the last encoder stages in HIGHEST-precision
    fp32 (level 1 = the latent-producing conv_3, level 2 = + conv_2,
    level 3 = whole encoder): the worst-case parity gate is dominated by
    symbol flips from bf16 latent error, and the error is cheapest to
    remove at the latent end where the spatial resolution is lowest.
    Pass ``qparams`` built with the same level so the tail kernels are
    unrounded.
    """
    p = dequantize_int8_params(qparams)
    (c1_dtype, c1_out, c2_dtype, c2_out, c3_dtype) = _encode_tail_dtypes(
        fp32_enc_tail)
    # Intermediate activations stream bf16 (convs accumulate fp32 on
    # the MXU, GDN pools accumulate fp32) except from the chosen fp32
    # tail stage on; the latent y is always emitted fp32 so the
    # quantizer's rounding keeps full resolution.
    if use_s2d:
        x = _conv1_s2d(visible_units, p["weights_1"], dtype=c1_dtype,
                       out_dtype=c1_out, fp32_precision=enc_precision)
    else:
        x = _conv_bf16(visible_units, p["weights_1"], csts.STRIDE_1,
                       out_dtype=c1_out, dtype=c1_dtype,
                       fp32_precision=enc_precision)
    x = x + p["biases_1"].astype(c1_out)
    x = _gdn_fast(x, p["gamma_1"], p["beta_1"], False, use_pallas)
    x = _conv_bf16(x, p["weights_2"], csts.STRIDE_2, out_dtype=c2_out,
                   dtype=c2_dtype, fp32_precision=enc_precision)
    x = x + p["biases_2"].astype(c2_out)
    x = _gdn_fast(x, p["gamma_2"], p["beta_2"], False, use_pallas)
    x = _conv_bf16(x, p["weights_3"], csts.STRIDE_3, dtype=c3_dtype,
                   fp32_precision=enc_precision) + p["biases_3"]
    if not learn_bin_widths:
        x = _gdn_fast(x.astype(jnp.float32), p["gamma_3"], p["beta_3"], False,
                      use_pallas)
    return x.astype(jnp.float32)


def _decode_tail_dtypes(fp32_tail):
    """Per-stage dtypes of the synthesis transform for a tail level.

    Returns ``(t4_dtype, t4_out, t5_dtype, t5_out, t6_dtype)``: from the
    chosen level on, every conv runs HIGHEST-precision fp32 and the
    preceding IGDN pools/scales in fp32 (its input arrives in the
    upstream stage's output dtype). Level 1 = IGDN_6 + final 9x9 tconv;
    level 2 = + tconv_5; level 3 = whole decode.
    """
    bf16 = jnp.bfloat16
    f32 = jnp.float32
    return (f32 if fp32_tail >= 3 else bf16,   # tconv_4 operand dtype
            f32 if fp32_tail >= 3 else bf16,   # tconv_4 output -> IGDN_5
            f32 if fp32_tail >= 2 else bf16,   # tconv_5 operand dtype
            f32 if fp32_tail >= 1 else bf16,   # tconv_5 output -> IGDN_6
            f32 if fp32_tail >= 1 else bf16)   # final tconv operand dtype


@functools.partial(jax.jit, static_argnames=("use_pallas", "use_s2d",
                                             "fp32_tail"))
def fast_decode_fixed_bw(qparams, symbols, bin_widths, use_pallas=False,
                         use_s2d=True, fp32_tail=0):
    """bf16 synthesis transform for the fixed-bin-width architecture.

    IGDN_4 sits between the symbols and the first transposed conv
    (``components.py:53-58``), so the dequantizer cannot fold into the
    kernel; it runs inline instead (XLA fuses the elementwise scale
    into the IGDN pool computation). ``fp32_tail`` is the
    precision-surgical serving knob (see :func:`fast_decode`).
    """
    p = dequantize_int8_params(qparams)
    (t4_dtype, t4_out, t5_dtype, t5_out, t6_dtype) = _decode_tail_dtypes(
        fp32_tail)
    x = symbols.astype(jnp.float32) * jnp.asarray(bin_widths)
    x = _gdn_fast(x, p["gamma_4"], p["beta_4"], True, use_pallas)
    x = _tconv_bf16(x, p["weights_4"], csts.STRIDE_3, out_dtype=t4_out,
                    dtype=t4_dtype)
    x = x + p["biases_4"].astype(t4_out)
    x = _gdn_fast(x, p["gamma_5"], p["beta_5"], True, use_pallas)
    x = _tconv_bf16(x, p["weights_5"], csts.STRIDE_2, out_dtype=t5_out,
                    dtype=t5_dtype)
    x = x + p["biases_5"].astype(t5_out)
    x = _gdn_fast(x, p["gamma_6"], p["beta_6"], True, use_pallas)
    if use_s2d:
        x = _tconv6_s2d(x, p["weights_6"], dtype=t6_dtype)
    else:
        x = _tconv_bf16(x, p["weights_6"], csts.STRIDE_1, dtype=t6_dtype)
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("use_pallas", "use_s2d",
                                             "fp32_tail", "fp32_enc_tail",
                                             "enc_precision"))
def fast_roundtrip_scan(qparams, qparams_folded, stacked_batches, bin_widths,
                        use_pallas=False, use_s2d=True, fp32_tail=0,
                        fp32_enc_tail=0, enc_precision="highest"):
    """Encode+quantize+decode K batches in ONE device program.

    ``stacked_batches`` is (K, B, H, W, 1); a ``lax.scan`` runs the full
    roundtrip per batch and returns (reconstructions, symbols) stacked
    the same way. Rationale: each host->device dispatch costs tens of
    ms of latency in serving environments (and ~27 ms through this
    dev tunnel) while the device computes a Kodak-24 roundtrip in
    ~13 ms - one scan dispatch per K batches amortizes dispatch to
    nothing, which measured ~2x end-to-end over per-batch dispatch.
    Learned-bin-width architecture (folded decoder params).
    """
    def body(carry, batch):
        y = fast_encode(qparams, batch, learn_bin_widths=True,
                        use_pallas=use_pallas, use_s2d=use_s2d,
                        fp32_enc_tail=fp32_enc_tail,
                        enc_precision=enc_precision)
        symbols = jnp.round(y / bin_widths)
        return (carry, (fast_decode(qparams_folded, symbols,
                                    use_pallas=use_pallas, use_s2d=use_s2d,
                                    fp32_tail=fp32_tail),
                        symbols))

    (_, (reconstructions, symbols)) = jax.lax.scan(body, 0, stacked_batches)
    return (reconstructions, symbols)


@functools.partial(jax.jit, static_argnames=("use_pallas", "use_s2d",
                                             "fp32_tail"))
def fast_decode(qparams_folded, symbols, use_pallas=False, use_s2d=True,
                fp32_tail=0):
    """bf16 synthesis transform consuming raw integer symbols.

    ``qparams_folded`` must come from :func:`fold_bin_widths_into_decoder`
    (dequant already inside ``weights_4``). Learned-bin-width
    architecture only. ``use_s2d`` runs the last transposed conv in its
    depth-to-space formulation (16 output channels instead of 1).

    ``fp32_tail`` is the precision-surgical "bf16w+" knob: from the
    given stage on, the synthesis transform runs HIGHEST-precision fp32
    (level 1 = IGDN_6 + final tconv, level 2 = + tconv_5, level 3 =
    whole decode). The last stages dominate the output error but are a
    small fraction of the FLOPs (the final tconv is ~2% of tconv_5 in
    the depth-to-space formulation), which is what lets the worst-case
    0.05 dB parity gate hold without giving up the bf16 throughput.
    Pass ``qparams_folded`` built with the same level
    (:func:`bf16_weight_params`) so the tail kernels are unrounded.
    """
    p = dequantize_int8_params(qparams_folded)
    (t4_dtype, t4_out, t5_dtype, t5_out, t6_dtype) = _decode_tail_dtypes(
        fp32_tail)
    x = _tconv_bf16(symbols.astype(jnp.float32), p["weights_4"], csts.STRIDE_3,
                    out_dtype=t4_out, dtype=t4_dtype)
    x = x + p["biases_4"].astype(t4_out)
    x = _gdn_fast(x, p["gamma_5"], p["beta_5"], True, use_pallas)
    x = _tconv_bf16(x, p["weights_5"], csts.STRIDE_2, out_dtype=t5_out,
                    dtype=t5_dtype)
    x = x + p["biases_5"].astype(t5_out)
    x = _gdn_fast(x, p["gamma_6"], p["beta_6"], True, use_pallas)
    if use_s2d:
        x = _tconv6_s2d(x, p["weights_6"], dtype=t6_dtype)
    else:
        x = _tconv_bf16(x, p["weights_6"], csts.STRIDE_1, dtype=t6_dtype)
    return x.astype(jnp.float32)
