"""Operator-based preconditioners.

Analogs of ``solve/NativePreconditioners.hpp`` (Richardson, Jacobi with
thresholded diagonal inversion) and the Ifpack2-backed Chebyshev
(``solve/Ifpack2Preconditioners.hpp:85-192``).  All are matrix-free-friendly:
they need at most the operator diagonal and operator applies, so they work
identically for the assembled and matrix-free systems.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = ["Identity", "Richardson", "Jacobi", "Chebyshev"]


@dataclass(frozen=True)
class Identity:
    def setup(self, system):
        return lambda r: r

    def setup_parts(self, system):
        return (lambda r, *pc: r), ()


@dataclass(frozen=True)
class Richardson:
    """M^-1 = factor * I (``NativePreconditioners.hpp`` Richardson)."""

    factor: float = 1.0

    def setup(self, system):
        f = self.factor
        return lambda r: f * r

    def setup_parts(self, system):
        f = self.factor
        return (lambda r, *pc: f * r), ()


@dataclass(frozen=True)
class Jacobi:
    """Inverted thresholded diagonal (``NativePreconditioners.hpp`` NativeJacobi)."""

    threshold: float = 1e-14

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system):
        """(apply(r, *consts), consts): the inverted diagonal travels as a jit
        argument so solvers never inline it into the compiled program."""
        d = system.diagonal()
        inv = jnp.where(jnp.abs(d) > self.threshold, 1.0 / d, 1.0)

        def apply(r, inv):
            return inv[..., None] * r if r.ndim == inv.ndim + 1 else inv * r

        return apply, (inv,)


@dataclass(frozen=True)
class Chebyshev:
    """Chebyshev polynomial preconditioner on the Jacobi-scaled operator.

    lambda_max of D^-1 A is estimated with power iteration at setup;
    lambda_min = lambda_max / eig_ratio (Ifpack2's convention).
    """

    degree: int = 4
    eig_ratio: float = 30.0
    power_iters: int = 20
    boost: float = 1.05

    def setup(self, system):
        apply, pc = self.setup_parts(system)
        return lambda r: apply(r, *pc)

    def setup_parts(self, system):
        fn, oconsts = system.operator_parts()
        d = system.diagonal()
        dinv_c = jnp.where(jnp.abs(d) > 1e-14, 1.0 / d, 1.0)

        def scaled_op(x):
            return dinv_c[..., None] * fn(x, *oconsts)

        key = jax.random.PRNGKey(0)
        v = jax.random.normal(key, d.shape + (1,), dtype=d.dtype)

        def power_step(_, v):
            w = scaled_op(v)
            return w / jnp.linalg.norm(w)

        v = jax.lax.fori_loop(0, self.power_iters, power_step, v)
        lam_max = jnp.vdot(v, scaled_op(v)) / jnp.vdot(v, v) * self.boost
        lam_min = lam_max / self.eig_ratio

        theta_c = 0.5 * (lam_max + lam_min)
        delta_c = 0.5 * (lam_max - lam_min)
        degree = self.degree

        def apply(r, dinv, theta, delta, *oc):
            # Chebyshev iteration on (D^-1 A) z = D^-1 r, z0 = 0; degree is
            # small and static, so the recurrence is unrolled at trace time.
            rs = dinv[..., None] * r
            z = rs / theta
            zp = jnp.zeros_like(z)
            rho = delta / theta
            for _ in range(degree - 1):
                rho_new = 1.0 / (2.0 * theta / delta - rho)
                resid = rs - dinv[..., None] * fn(z, *oc)
                z_new = z + rho_new * ((2.0 / delta) * resid + rho * (z - zp))
                zp, z, rho = z, z_new, rho_new
            return z

        return apply, (dinv_c, theta_c, delta_c) + tuple(oconsts)
