"""Inference engine: the TPU fast path of the codec.

Parity path (float32, ``models/conv_eae.py``) stays the numerical
reference; this package holds the performance variants: bf16
activations, bf16-rounded weights, INT8 weight-only conv kernels with
fp32 scales, the Pallas-fused GDN/quantizer, bin-width dequantization
folded into the decoder's first transposed conv, and the
precision-surgical fp32 encoder/decoder tails whose cheapest
gate-passing mix (``BF16WPLUS_ENC_TAIL``/``BF16WPLUS_DEC_TAIL``) is
the "bf16w+" serving default.
"""

from autoencoder_based_image_compression_tpu.engine.quantized import (
    BF16WPLUS_DEC_TAIL,
    BF16WPLUS_ENC_PRECISION,
    BF16WPLUS_ENC_TAIL,
    bf16_weight_params,
    dequantize_int8_params,
    fast_decode,
    fast_decode_fixed_bw,
    fast_encode,
    fold_bin_widths_into_decoder,
    quantize_params_int8,
)
