"""Math-layer oracles: Gauss rules, GLL points, Lagrange bases.

Mirrors the reference's ``tests/MathTests.cpp`` / ``tests/QuadratureTests.cpp``.
"""

import numpy as np

from l3ster_tpu.math.gauss import gauss_legendre, gauss_lobatto, legendre_values
from l3ster_tpu.math.lagrange import (
    lagrange_derivatives,
    lagrange_diff_matrix,
    lagrange_values,
)


def test_gauss_legendre_exactness():
    for n in range(1, 12):
        x, w = gauss_legendre(n)
        assert len(x) == n
        for k in range(2 * n):
            exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
            assert abs(np.sum(w * x**k) - exact) < 1e-12, (n, k)


def test_gauss_legendre_symmetry():
    x, w = gauss_legendre(7)
    assert np.allclose(x, -x[::-1])
    assert np.allclose(w, w[::-1])
    assert abs(np.sum(w) - 2.0) < 1e-14


def test_gauss_lobatto_known_values():
    x, w = gauss_lobatto(3)
    assert np.allclose(x, [-1, 0, 1])
    assert np.allclose(w, [1 / 3, 4 / 3, 1 / 3])
    x, _ = gauss_lobatto(4)
    assert np.allclose(x, [-1, -1 / np.sqrt(5), 1 / np.sqrt(5), 1])
    x, w = gauss_lobatto(5)
    assert np.allclose(x, [-1, -np.sqrt(3 / 7), 0, np.sqrt(3 / 7), 1])
    assert np.allclose(w, [1 / 10, 49 / 90, 32 / 45, 49 / 90, 1 / 10])


def test_gauss_lobatto_exactness():
    # n-point GLL is exact up to degree 2n - 3
    for n in range(2, 10):
        x, w = gauss_lobatto(n)
        for k in range(2 * n - 2):
            exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
            assert abs(np.sum(w * x**k) - exact) < 1e-12, (n, k)


def test_legendre_values():
    x = np.linspace(-1, 1, 7)
    v = legendre_values(3, x)
    assert np.allclose(v[0], 1)
    assert np.allclose(v[1], x)
    assert np.allclose(v[2], 0.5 * (3 * x**2 - 1))
    assert np.allclose(v[3], 0.5 * (5 * x**3 - 3 * x))


def test_lagrange_cardinality_and_reproduction():
    nodes, _ = gauss_lobatto(6)
    vals = lagrange_values(nodes, nodes)
    assert np.allclose(vals, np.eye(6), atol=1e-12)
    # degree-5 polynomial is reproduced exactly
    x = np.linspace(-1, 1, 31)
    f = lambda t: 2 * t**5 - t**3 + 0.5 * t - 3
    fx = lagrange_values(nodes, x) @ f(nodes)
    assert np.allclose(fx, f(x), atol=1e-12)
    dfx = lagrange_derivatives(nodes, x) @ f(nodes)
    assert np.allclose(dfx, 10 * x**4 - 3 * x**2 + 0.5, atol=1e-11)


def test_diff_matrix_constant_null():
    nodes, _ = gauss_lobatto(5)
    D = lagrange_diff_matrix(nodes)
    assert np.allclose(D @ np.ones(5), 0.0, atol=1e-12)


def test_polynomial_type():
    """Polynomial evaluation/calculus/roots (``math/Polynomial.hpp``)."""
    from l3ster_tpu.math.polynomial import Polynomial, lagrange_from_roots

    p = Polynomial((2.0, -3.0, 1.0))  # (x-1)(x-2)
    assert np.allclose(p([1.0, 2.0]), 0.0)
    assert np.allclose(sorted(p.real_roots()), [1.0, 2.0])
    d = p.derivative()
    assert d.coefficients == (-3.0, 2.0)
    # integral of (x-1)(x-2) over [1, 2] = -1/6
    assert abs(p.integrate(1.0, 2.0) + 1.0 / 6.0) < 1e-14
    q = p * Polynomial((0.0, 1.0))  # x * p
    assert np.allclose(sorted(q.real_roots()), [0.0, 1.0, 2.0])
    s = p + Polynomial((1.0,))
    assert np.allclose(s(0.0), 3.0)
    m = lagrange_from_roots([0.5, -0.5])
    assert np.allclose(m.real_roots(), [-0.5, 0.5])
    assert m.order == 2 and m.coefficients[-1] == 1.0
    # Legendre P3 roots vs the Gauss rule nodes
    p3 = Polynomial((0.0, -1.5, 0.0, 2.5))
    from l3ster_tpu.math.gauss import gauss_legendre

    x_rule, _ = gauss_legendre(3)
    assert np.allclose(sorted(p3.real_roots()), np.sort(np.asarray(x_rule)), atol=1e-12)
