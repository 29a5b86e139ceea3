"""Roofline accounting tests (analytic FLOP counts + report plumbing)."""

import jax
import numpy
import pytest

from autoencoder_based_image_compression_tpu import constants as csts
from autoencoder_based_image_compression_tpu.eval.roofline import (
    conv_eae_flops,
    measure_matmul_peak,
    roofline_report,
)
from autoencoder_based_image_compression_tpu.models import conv_eae


def test_conv_eae_flops_analytic():
    (height, width) = (64, 64)
    flops = conv_eae_flops(height, width, learn_bin_widths=True)
    # Hand count, encoder side: conv1 (H/4)^2*81*128, conv2
    # (H/8)^2*25*128^2, conv3 (H/16)^2*25*128^2, GDN1 (H/4)^2*128^2,
    # GDN2 (H/8)^2*128^2; decoder mirrors them.
    macs = (16 * 16 * 81 * 128 + 8 * 8 * 25 * 128 * 128
            + 4 * 4 * 25 * 128 * 128 + 16 * 16 * 128 * 128
            + 8 * 8 * 128 * 128)
    assert flops == 2 * 2 * macs  # x2 decoder mirror, x2 FLOPs per MAC


def test_conv_eae_flops_fixed_bw_adds_bottleneck_gdn_pair():
    extra = conv_eae_flops(64, 64, False) - conv_eae_flops(64, 64, True)
    assert extra == 2 * 2 * 4 * 4 * csts.NB_MAPS_3 ** 2


def test_measure_matmul_peak_runs_small():
    peak = measure_matmul_peak(size=128, repeats=1, nb_chained=2)
    assert peak > 0.0


def test_roofline_report_structure():
    params = conv_eae.init_conv_eae_params(jax.random.PRNGKey(0), True)
    bin_widths = numpy.ones(128, numpy.float32)
    images = numpy.random.default_rng(0).integers(
        16, 236, size=(1, 32, 32, 1)).astype(numpy.uint8)
    report = roofline_report(params, images, bin_widths, repeats=1,
                             peak_flops={"parity": 1e12, "fast": 1e12},
                             nb_in_flight=1)
    assert report["flops_per_pixel"] == pytest.approx(
        conv_eae_flops(32, 32, True) / (32 * 32))
    assert report["achieved_flops_per_s_fast"] == pytest.approx(
        report["mxu_utilization_fast"] * 1e12)
    assert report["mpix_per_s_parity"] > 0.0
