"""Finite-difference gradient checking.

The reference treats gradient checking as a first-class feature on the
SVHN side (``svhn/eae/EntropyAutoencoder.py:318-857`` runs
finite-difference comparisons inside its hand-derived backprop).
``jax.grad`` replaces the hand derivation, but the *check* is still
worth keeping: it validates the differentiability assumptions of the
custom losses (piecewise-linear gathers, entropy terms, noise
parameterization) against central differences.
"""

import jax
import numpy


def finite_difference_grad(fn, x, eps=1e-4):
    """Central-difference gradient of a scalar function at x (numpy)."""
    x = numpy.asarray(x, dtype=numpy.float64)
    grad = numpy.zeros_like(x)
    flat = x.reshape(-1)
    grad_flat = grad.reshape(-1)
    for i in range(flat.size):
        original = flat[i]
        flat[i] = original + eps
        up = float(fn(x.reshape(x.shape)))
        flat[i] = original - eps
        down = float(fn(x.reshape(x.shape)))
        flat[i] = original
        grad_flat[i] = (up - down) / (2.0 * eps)
    return grad


def check_grad(fn, x, rtol=1e-3, atol=1e-5, eps=1e-4):
    """Compares ``jax.grad(fn)`` against central differences.

    Returns (analytic, numeric); raises AssertionError on mismatch.
    Intended for small inputs (finite differences are O(n) evaluations).
    """
    analytic = numpy.asarray(jax.grad(lambda v: fn(v))(x), dtype=numpy.float64)
    numeric = finite_difference_grad(lambda v: fn(v.astype(numpy.float32)), x, eps)
    numpy.testing.assert_allclose(analytic, numeric, rtol=rtol, atol=atol)
    return (analytic, numeric)
