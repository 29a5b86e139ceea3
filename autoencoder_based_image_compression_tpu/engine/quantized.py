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
# Output-channel axis of each kernel: encoder convs are HWIO (out = O,
# axis 3); decoder tconv kernels are stored (kh, kw, tconv_out, tconv_in)
# so their output axis is 2.
_OUT_AXIS = {"weights_1": 3, "weights_2": 3, "weights_3": 3,
             "weights_4": 2, "weights_5": 2, "weights_6": 2}


def bf16_weight_params(params):
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
    """
    return {name: (value.astype(jnp.bfloat16) if name in _CONV_NAMES else value)
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


def _conv_bf16(x, w, stride, out_dtype=jnp.float32):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=out_dtype)


def _tconv_bf16(y, w, stride, out_dtype=jnp.float32):
    """Transpose of the TF-SAME strided conv, written explicitly.

    The gradient conv of a SAME conv with kernel k, stride s and pads
    (lo, hi) = (floor((k-s)/2), ceil((k-s)/2)) is an lhs-dilated conv
    with the spatially-flipped IO-swapped kernel and pads
    (k-1-lo, k-1-hi). Written out (instead of jax.linear_transpose)
    so the bf16 kernel/activation dtypes can be chosen freely.
    """
    k = w.shape[0]
    pad_total = k - stride
    (lo, hi) = (pad_total // 2, pad_total - pad_total // 2)
    w_t = jnp.transpose(w[::-1, ::-1, :, :], (0, 1, 3, 2))
    return jax.lax.conv_general_dilated(
        y.astype(jnp.bfloat16), w_t.astype(jnp.bfloat16),
        window_strides=(1, 1),
        padding=((k - 1 - lo, k - 1 - hi), (k - 1 - lo, k - 1 - hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
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


def _conv1_s2d(x, w9, dtype=jnp.bfloat16, out_dtype=jnp.float32):
    """The encoder's first conv as space-to-depth + 3x3 conv."""
    wk = _s2d_kernel_from_conv1(w9)
    return jax.lax.conv_general_dilated(
        _space_to_depth(x).astype(dtype), wk.astype(dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
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


@functools.partial(jax.jit,
                   static_argnames=("learn_bin_widths", "use_pallas", "use_s2d"))
def fast_encode(qparams, visible_units, learn_bin_widths=True, use_pallas=False,
                use_s2d=True):
    """bf16 analysis transform over int8-stored weights.

    ``use_s2d`` runs the first conv in its space-to-depth formulation
    (16 input channels instead of 1 - see :func:`_s2d_kernel_from_conv1`).
    """
    p = dequantize_int8_params(qparams)
    bf16 = jnp.bfloat16
    # Intermediate activations stream bf16 end-to-end (convs accumulate
    # fp32 on the MXU, GDN pools accumulate fp32); only the latent y is
    # emitted fp32 so the quantizer's rounding keeps full resolution.
    if use_s2d:
        x = _conv1_s2d(visible_units, p["weights_1"], out_dtype=bf16)
    else:
        x = _conv_bf16(visible_units, p["weights_1"], csts.STRIDE_1,
                       out_dtype=bf16)
    x = x + p["biases_1"].astype(bf16)
    x = _gdn_fast(x, p["gamma_1"], p["beta_1"], False, use_pallas)
    x = _conv_bf16(x, p["weights_2"], csts.STRIDE_2, out_dtype=bf16)
    x = x + p["biases_2"].astype(bf16)
    x = _gdn_fast(x, p["gamma_2"], p["beta_2"], False, use_pallas)
    x = _conv_bf16(x, p["weights_3"], csts.STRIDE_3) + p["biases_3"]
    if not learn_bin_widths:
        x = _gdn_fast(x.astype(jnp.float32), p["gamma_3"], p["beta_3"], False,
                      use_pallas)
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("use_pallas", "use_s2d"))
def fast_decode_fixed_bw(qparams, symbols, bin_widths, use_pallas=False,
                         use_s2d=True):
    """bf16 synthesis transform for the fixed-bin-width architecture.

    IGDN_4 sits between the symbols and the first transposed conv
    (``components.py:53-58``), so the dequantizer cannot fold into the
    kernel; it runs inline instead (XLA fuses the elementwise scale
    into the IGDN pool computation).
    """
    p = dequantize_int8_params(qparams)
    bf16 = jnp.bfloat16
    x = symbols.astype(jnp.float32) * jnp.asarray(bin_widths)
    x = _gdn_fast(x, p["gamma_4"], p["beta_4"], True, use_pallas)
    x = _tconv_bf16(x, p["weights_4"], csts.STRIDE_3, out_dtype=bf16)
    x = x + p["biases_4"].astype(bf16)
    x = _gdn_fast(x, p["gamma_5"], p["beta_5"], True, use_pallas)
    x = _tconv_bf16(x, p["weights_5"], csts.STRIDE_2, out_dtype=bf16)
    x = x + p["biases_5"].astype(bf16)
    x = _gdn_fast(x, p["gamma_6"], p["beta_6"], True, use_pallas)
    if use_s2d:
        x = _tconv6_s2d(x, p["weights_6"])
    else:
        x = _tconv_bf16(x, p["weights_6"], csts.STRIDE_1)
    return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("use_pallas", "use_s2d"))
def fast_roundtrip_scan(qparams, qparams_folded, stacked_batches, bin_widths,
                        use_pallas=False, use_s2d=True):
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
                        use_pallas=use_pallas, use_s2d=use_s2d)
        symbols = jnp.round(y / bin_widths)
        return (carry, (fast_decode(qparams_folded, symbols,
                                    use_pallas=use_pallas, use_s2d=use_s2d),
                        symbols))

    (_, (reconstructions, symbols)) = jax.lax.scan(body, 0, stacked_batches)
    return (reconstructions, symbols)


@functools.partial(jax.jit, static_argnames=("use_pallas", "use_s2d"))
def fast_decode(qparams_folded, symbols, use_pallas=False, use_s2d=True):
    """bf16 synthesis transform consuming raw integer symbols.

    ``qparams_folded`` must come from :func:`fold_bin_widths_into_decoder`
    (dequant already inside ``weights_4``). Learned-bin-width
    architecture only. ``use_s2d`` runs the last transposed conv in its
    depth-to-space formulation (16 output channels instead of 1).
    """
    p = dequantize_int8_params(qparams_folded)
    bf16 = jnp.bfloat16
    x = _tconv_bf16(symbols.astype(jnp.float32), p["weights_4"], csts.STRIDE_3,
                    out_dtype=bf16)
    x = x + p["biases_4"].astype(bf16)
    x = _gdn_fast(x, p["gamma_5"], p["beta_5"], True, use_pallas)
    x = _tconv_bf16(x, p["weights_5"], csts.STRIDE_2, out_dtype=bf16)
    x = x + p["biases_5"].astype(bf16)
    x = _gdn_fast(x, p["gamma_6"], p["beta_6"], True, use_pallas)
    if use_s2d:
        x = _tconv6_s2d(x, p["weights_6"])
    else:
        x = _tconv_bf16(x, p["weights_6"], csts.STRIDE_1)
    return x.astype(jnp.float32)
