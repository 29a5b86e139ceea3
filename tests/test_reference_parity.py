"""End-to-end PSNR parity vs the reference TF graph builders.

Executes the reference's own ``eae/graph/components.py`` (encoder +
decoder, with GDN/IGDN from the reference ``tfutils.py``) under
``tf.compat.v1`` with OUR parameters, quantizes identically, and
asserts the 0.05 dB PSNR parity gate plus latent agreement - on both
model variants (learned / fixed bin widths, which toggle the extra
GDN3/IGDN4 pair, ``EntropyAutoencoder.py:174-188``).
"""

import numpy
import pytest

pytest.importorskip("tensorflow")

import jax

from autoencoder_based_image_compression_tpu.eval import reference_parity
from autoencoder_based_image_compression_tpu.models import conv_eae

pytestmark = pytest.mark.skipif(
    not reference_parity.reference_available(),
    reason="reference kodak_tensorflow sources not available")


def _images(seed, nb=2, size=64):
    rng = numpy.random.default_rng(seed)
    return rng.integers(16, 236, size=(nb, size, size)).astype(numpy.uint8)


@pytest.mark.parametrize("learn_bin_widths", [True, False])
def test_e2e_psnr_parity_gate(learn_bin_widths):
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0),
                                           learn_bin_widths)
    bin_widths = numpy.full(128, 0.8, numpy.float32)
    report = reference_parity.measure_psnr_parity(
        params, bin_widths, _images(1), learn_bin_widths, batch_size=2)
    # The parity gate (BASELINE.md): <=0.05 dB at every operating point.
    assert report["max_abs_delta_db"] <= 0.05, report
    # And the reconstructions themselves should be virtually identical.
    assert report["cross_psnr_db"] > 45.0, report


def test_latents_match_reference_graph():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(2), True)
    params_numpy = {k: numpy.asarray(v) for (k, v) in params.items()}
    images = _images(3, nb=1, size=48)[..., None].astype(numpy.float32)
    (y_ref, _) = reference_parity.reference_roundtrip_tf(
        params_numpy, numpy.ones(128, numpy.float32), images, True)
    import jax.numpy as jnp

    y_ours = numpy.asarray(conv_eae.encode(params, jnp.asarray(images), True))
    scale = numpy.abs(y_ref).max()
    assert numpy.abs(y_ours - y_ref).max() < 1e-4 * scale


@pytest.mark.parametrize("bw_init,learn_bw", [(0.5, True), (1.0, False)])
def test_e2e_psnr_parity_gate_trained_weights(bw_init, learn_bw):
    """The 0.05 dB gate on TRAINED weight distributions (both variants).

    Random-init parity (above) can mask distribution-dependent numeric
    drift; this asserts the gate on the checked-in trained artifacts
    when they exist (produced by ``scripts/rd_campaign.py``).
    """
    import os

    from autoencoder_based_image_compression_tpu.data.synthetic import (
        synthetic_luminance_stack)
    from autoencoder_based_image_compression_tpu.train.checkpoint import (
        load_params_artifact)
    from autoencoder_based_image_compression_tpu.utils.naming import (
        experiment_suffix)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results", "eae", experiment_suffix(bw_init, 10000.0, learn_bw),
        "params_trained.npz")
    if not os.path.isfile(path):
        pytest.skip(f"no trained artifact at {path}")
    (params, bin_widths) = load_params_artifact(path)
    images = synthetic_luminance_stack(2, 64, 64, seed=21)[..., 0]
    report = reference_parity.measure_psnr_parity(
        params, numpy.asarray(bin_widths), images, learn_bw, batch_size=2)
    assert report["max_abs_delta_db"] <= 0.05, report
    assert report["cross_psnr_db"] > 45.0, report
