"""Convolutional GDN entropy autoencoder (the Kodak codec transforms).

Functional re-design of the reference graph builders
(``kodak_tensorflow/eae/graph/components.py:86-142`` encoder,
``:11-84`` decoder, ``:144-167`` weight l2 norm) and the variable
definitions of ``eae/graph/EntropyAutoencoder.py:108-224``.

Architecture (NHWC, 1 luminance channel in):

    encoder: conv 9x9 s4 -> GDN -> conv 5x5 s2 -> GDN -> conv 5x5 s2
             [-> GDN_3 iff bin widths are NOT learned]
    decoder: [IGDN_4 iff bin widths are NOT learned]
             tconv 5x5 s2 -> IGDN -> tconv 5x5 s2 -> IGDN -> tconv 9x9 s4

Biases sit between each conv and its GDN. All convs use TF 'SAME'
padding; the transposed convs are the *exact linear transpose* of the
corresponding forward SAME conv (TF defines ``conv2d_transpose`` as the
gradient of ``conv2d``), obtained here with ``jax.linear_transpose`` so
the padding asymmetry of TF SAME at strides 4/2 is reproduced by
construction instead of re-derived by hand.

Parameters live in a flat dict pytree. Decoder transpose-conv kernels
are stored in the layout of the forward conv they transpose
(``(kh, kw, tconv_out_ch, tconv_in_ch)``) - the same memory layout TF
uses for ``conv2d_transpose`` filters.
"""

import jax
import jax.numpy as jnp

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.ops.gdn import gdn, init_gdn_gamma, inverse_gdn

_DIMS = ("NHWC", "HWIO", "NHWC")


def _conv_same(x, w, stride):
    """Strided conv with TF 'SAME' padding (XLA SAME == TF SAME).

    Precision is pinned to HIGHEST: on TPU the default would run the
    MXU in bfloat16 passes, which breaks the <=0.05 dB PSNR parity gate;
    the INT8/bf16 fast path lives in the inference engine, not here.
    """
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=_DIMS,
        precision=jax.lax.Precision.HIGHEST,
    )


def conv_transpose_same(y, w, stride):
    """Transposed conv: the linear transpose of ``_conv_same``.

    ``w`` has shape ``(kh, kw, out_ch, in_ch)`` where ``out_ch`` is the
    channel count of the *output* of the transposed conv (i.e. the
    input-channel axis of the forward conv being transposed). Output
    spatial dims are ``stride``x the input's - the reference fixes
    ``output_shape`` the same way (``components.py:63-83``).
    """
    (batch, h_in, w_in, _) = y.shape
    out_shape = (batch, stride * h_in, stride * w_in, w.shape[2])
    forward = lambda x: _conv_same(x, w, stride)
    (x,) = jax.linear_transpose(forward, jax.ShapeDtypeStruct(out_shape, y.dtype))(y)
    return x


def init_conv_eae_params(key, learn_bin_widths):
    """Initializes the conv EAE parameter pytree.

    Init distributions follow ``EntropyAutoencoder.py:130-224``:
    conv kernels N(0, 0.01/0.02/0.05) by layer, zero biases, symmetric
    uniform GDN gammas, unit betas. When bin widths are *not* learned an
    extra GDN_3/IGDN_4 pair wraps the bottleneck
    (``EntropyAutoencoder.py:174-188``).
    """
    n1, n2, n3 = csts.NB_MAPS_1, csts.NB_MAPS_2, csts.NB_MAPS_3
    k1, k2, k3 = csts.WIDTH_KERNEL_1, csts.WIDTH_KERNEL_2, csts.WIDTH_KERNEL_3
    keys = jax.random.split(key, 16)
    normal = lambda k, shape, std: std * jax.random.normal(k, shape, jnp.float32)
    params = {
        "weights_1": normal(keys[0], (k1, k1, 1, n1), 0.01),
        "biases_1": jnp.zeros((n1,), jnp.float32),
        "gamma_1": init_gdn_gamma(keys[1], n1, csts.MIN_GAMMA_BETA),
        "beta_1": jnp.ones((n1,), jnp.float32),
        "weights_2": normal(keys[2], (k2, k2, n1, n2), 0.02),
        "biases_2": jnp.zeros((n2,), jnp.float32),
        "gamma_2": init_gdn_gamma(keys[3], n2, csts.MIN_GAMMA_BETA),
        "beta_2": jnp.ones((n2,), jnp.float32),
        "weights_3": normal(keys[4], (k3, k3, n2, n3), 0.05),
        "biases_3": jnp.zeros((n3,), jnp.float32),
        "weights_4": normal(keys[5], (k3, k3, n2, n3), 0.05),
        "biases_4": jnp.zeros((n2,), jnp.float32),
        "gamma_5": init_gdn_gamma(keys[6], n2, csts.MIN_GAMMA_BETA),
        "beta_5": jnp.ones((n2,), jnp.float32),
        "weights_5": normal(keys[7], (k2, k2, n1, n2), 0.02),
        "biases_5": jnp.zeros((n1,), jnp.float32),
        "gamma_6": init_gdn_gamma(keys[8], n1, csts.MIN_GAMMA_BETA),
        "beta_6": jnp.ones((n1,), jnp.float32),
        "weights_6": normal(keys[9], (k1, k1, 1, n1), 0.01),
    }
    if not learn_bin_widths:
        params.update({
            "gamma_3": init_gdn_gamma(keys[10], n3, csts.MIN_GAMMA_BETA),
            "beta_3": jnp.ones((n3,), jnp.float32),
            "gamma_4": init_gdn_gamma(keys[11], n3, csts.MIN_GAMMA_BETA),
            "beta_4": jnp.ones((n3,), jnp.float32),
        })
    return params


def encode(params, visible_units, learn_bin_widths):
    """Analysis transform: visible units -> latent feature maps.

    Reference ``components.py:86-142``. Input NHWC with one channel;
    output ``(B, H/16, W/16, 128)``.
    """
    x = _conv_same(visible_units, params["weights_1"], csts.STRIDE_1) + params["biases_1"]
    x = gdn(x, params["gamma_1"], params["beta_1"])
    x = _conv_same(x, params["weights_2"], csts.STRIDE_2) + params["biases_2"]
    x = gdn(x, params["gamma_2"], params["beta_2"])
    x = _conv_same(x, params["weights_3"], csts.STRIDE_3) + params["biases_3"]
    if not learn_bin_widths:
        x = gdn(x, params["gamma_3"], params["beta_3"])
    return x


def decode(params, y_tilde, learn_bin_widths):
    """Synthesis transform: (noisy or quantized) latents -> reconstruction.

    Reference ``components.py:11-84``. Also serves as the
    ``IsolatedDecoder`` (``eae/graph/IsolatedDecoder.py:21-131``): at
    test time it is fed *quantized* latents - being a pure function, no
    separate decoder-only graph is needed.
    """
    x = y_tilde
    if not learn_bin_widths:
        x = inverse_gdn(x, params["gamma_4"], params["beta_4"])
    x = conv_transpose_same(x, params["weights_4"], csts.STRIDE_3) + params["biases_4"]
    x = inverse_gdn(x, params["gamma_5"], params["beta_5"])
    x = conv_transpose_same(x, params["weights_5"], csts.STRIDE_2) + params["biases_5"]
    x = inverse_gdn(x, params["gamma_6"], params["beta_6"])
    x = conv_transpose_same(x, params["weights_6"], csts.STRIDE_1)
    return x


def weight_l2_norm(params):
    """Cumulated l2 loss ``sum(w**2)/2`` over the 6 conv kernels only.

    Reference ``components.py:144-167`` (GDN parameters and biases are
    exempt from weight decay).
    """
    names = ("weights_1", "weights_2", "weights_3", "weights_4", "weights_5", "weights_6")
    return sum(0.5 * jnp.sum(jnp.square(params[name])) for name in names)


def nb_parameters(params):
    """Total parameter count (reference ``eae/note_eae.txt``: 1,758,848)."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
