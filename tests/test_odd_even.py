"""Odd-even decomposed 1D contractions vs the plain tables.

Analog of the reference's even-odd sum-factorization
(``algsys/SumFactorization.hpp:88-157``): GLL/Gauss symmetry lets every 1D
contraction split into two half-size ones.  Must be bit-tight against the
plain contraction, in both sweep directions, for odd and even table sizes.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from l3ster_tpu.ops import sumfact as sf


@pytest.mark.parametrize("order", [1, 2, 3, 4, 6])
@pytest.mark.parametrize("dim", [2, 3])
def test_oe_matches_plain(order, dim):
    q_order = 4 * order - 2 if order > 1 else 2
    N1, D1, _ = sf.sumfact_tables_1d(order, q_order)
    E, c = 4, 3
    n = (order + 1) ** dim
    Q = (q_order // 2 + 1) ** dim
    rng = np.random.default_rng(order * 10 + dim)
    u = jnp.asarray(rng.normal(size=(E, n, c)))
    t0 = jnp.asarray(rng.normal(size=(E, Q, c)))
    td = jnp.asarray(rng.normal(size=(E, dim, Q, c)))

    prev = os.environ.get("L3STER_TPU_ODD_EVEN")
    try:
        os.environ["L3STER_TPU_ODD_EVEN"] = "0"
        v0, d0 = sf.sumfact_interpolate(u, N1, D1, dim)
        y0 = sf.sumfact_transpose(t0, td, N1, D1, dim)
        os.environ["L3STER_TPU_ODD_EVEN"] = "1"
        v1, d1 = sf.sumfact_interpolate(u, N1, D1, dim)
        y1 = sf.sumfact_transpose(t0, td, N1, D1, dim)
    finally:
        if prev is None:
            os.environ.pop("L3STER_TPU_ODD_EVEN", None)
        else:
            os.environ["L3STER_TPU_ODD_EVEN"] = prev
    assert float(jnp.abs(v0 - v1).max()) < 1e-12
    assert float(jnp.abs(d0 - d1).max()) < 1e-12
    assert float(jnp.abs(y0 - y1).max()) < 1e-12


def test_oe_halves_shapes():
    N1, D1, _ = sf.sumfact_tables_1d(4, 8)  # (5, 5) tables
    Ne, No = sf._oe_halves(np.asarray(N1), False)
    De, Do = sf._oe_halves(np.asarray(D1), True)
    O, I = N1.shape
    assert Ne.shape == ((O + 1) // 2, (I + 1) // 2)
    assert No.shape == (O // 2, I // 2)
    assert De.shape == (O // 2, (I + 1) // 2)
    assert Do.shape == ((O + 1) // 2, I // 2)


def test_oe_rejects_asymmetric():
    M = np.arange(12.0).reshape(3, 4)
    assert sf._oe_halves(M, False) is None


def test_const_detection_rejects_piecewise():
    """Taint-based constancy must reject kernels that value-probing passes."""
    import l3ster_tpu as lt
    from l3ster_tpu.algsys.system import _constant_kernel_operators

    def pw(inp, out):
        ops, _ = out
        ops[1][0, 0] = jnp.where(inp.point.x > 1e6, 1.0, 2.0)

    kpw = lt.wrap_domain_equation_kernel(
        pw, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=1)
    )
    assert _constant_kernel_operators(kpw, 0.0) is None

    def const(inp, out):
        ops, _ = out
        ops[0][0, 0] = 3.0
        ops[1][0, 0] = -1.0

    kc = lt.wrap_domain_equation_kernel(
        const, lt.KernelParams(dimension=3, n_equations=1, n_unknowns=1)
    )
    A = _constant_kernel_operators(kc, 0.0)
    assert A is not None and A[0, 0, 0] == 3.0 and A[1, 0, 0] == -1.0
