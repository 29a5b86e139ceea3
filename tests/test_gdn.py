"""Tests of GDN/IGDN against the reference channel-matmul formula.

Oracle: direct numpy transcription of
``kodak_tensorflow/tfutils/tfutils.py:363-397`` (reshape to 2D, matmul
over channels, sqrt).
"""

import jax
import numpy

from autoencoder_based_image_compression_tpu.ops.gdn import gdn, init_gdn_gamma, inverse_gdn


def _reference_gdn(x, gamma, beta):
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    out = flat / numpy.sqrt(flat ** 2 @ gamma + beta[None, :])
    return out.reshape(shape)


def _reference_igdn(x, gamma, beta):
    shape = x.shape
    flat = x.reshape(-1, shape[-1])
    out = flat * numpy.sqrt(flat ** 2 @ gamma + beta[None, :])
    return out.reshape(shape)


def test_gdn_matches_reference_formula():
    rng = numpy.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 16)).astype(numpy.float32)
    gamma = numpy.abs(rng.normal(size=(16, 16))).astype(numpy.float32) * 0.01
    beta = numpy.ones(16, numpy.float32)
    out = numpy.asarray(gdn(x, gamma, beta))
    numpy.testing.assert_allclose(out, _reference_gdn(x, gamma, beta), rtol=2e-5, atol=1e-6)


def test_inverse_gdn_matches_reference_formula():
    rng = numpy.random.default_rng(1)
    x = rng.normal(size=(2, 4, 4, 16)).astype(numpy.float32)
    gamma = numpy.abs(rng.normal(size=(16, 16))).astype(numpy.float32) * 0.01
    beta = numpy.ones(16, numpy.float32)
    out = numpy.asarray(inverse_gdn(x, gamma, beta))
    numpy.testing.assert_allclose(out, _reference_igdn(x, gamma, beta), rtol=2e-5, atol=1e-6)


def test_igdn_inverts_gdn_with_identity_pool():
    # With gamma = 0 and beta = 1, GDN and IGDN are both the identity.
    rng = numpy.random.default_rng(2)
    x = rng.normal(size=(1, 2, 2, 8)).astype(numpy.float32)
    gamma = numpy.zeros((8, 8), numpy.float32)
    beta = numpy.ones(8, numpy.float32)
    numpy.testing.assert_allclose(numpy.asarray(gdn(x, gamma, beta)), x, rtol=1e-6)
    numpy.testing.assert_allclose(numpy.asarray(inverse_gdn(x, gamma, beta)), x, rtol=1e-6)


def test_init_gdn_gamma_symmetric_and_bounded():
    gamma = numpy.asarray(init_gdn_gamma(jax.random.PRNGKey(0), 32, 2.0e-5))
    numpy.testing.assert_allclose(gamma, gamma.T, rtol=1e-6)
    assert gamma.min() >= 2.0e-5
    assert gamma.max() <= 0.01


def test_init_gdn_gamma_rejects_bad_min():
    try:
        init_gdn_gamma(jax.random.PRNGKey(0), 8, 0.5)
    except ValueError:
        return
    raise AssertionError("expected ValueError for min_gamma outside ]0, 0.01]")


def test_gdn_lowp_tracks_fp32_gdn():
    """The bf16 fast-path GDN/IGDN must track the fp32 op to bf16
    relative precision (fp32 pool accumulation keeps the error at the
    input-rounding level, ~1e-2 relative)."""
    from autoencoder_based_image_compression_tpu.ops.gdn import gdn_lowp
    import jax.numpy as jnp

    rng = numpy.random.default_rng(7)
    x = rng.normal(size=(2, 8, 8, 32)).astype(numpy.float32) * 10.0
    gamma = numpy.asarray(init_gdn_gamma(jax.random.PRNGKey(1), 32))
    beta = rng.uniform(0.5, 1.5, size=(32,)).astype(numpy.float32)

    for inverse in (False, True):
        exact = numpy.asarray((inverse_gdn if inverse else gdn)(x, gamma, beta))
        raw = gdn_lowp(jnp.asarray(x, jnp.bfloat16), jnp.asarray(gamma),
                       jnp.asarray(beta), inverse=inverse)
        # The fast path must stay bf16 end-to-end (no silent upcast).
        assert raw.dtype == jnp.bfloat16
        low = numpy.asarray(raw.astype(jnp.float32))
        scale = numpy.abs(exact).max()
        assert numpy.abs(exact - low).max() < 2.0e-2 * scale
