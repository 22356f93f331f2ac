"""Krylov solvers in pure JAX.

Analogs of the Belos-backed CG / GMRES (``solve/BelosSolvers.hpp:116-127``),
re-implemented as jit-compiled ``lax.while_loop`` iterations.  The operator is
any linear callable on (n_dofs, n_rhs) multivectors; dot products are plain
``jnp`` reductions, so under sharding XLA lowers them to ``psum`` collectives
over the device mesh (the analog of the reference's MPI allreduce per
iteration).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..utils.profiling import phase_fence, profile_enabled, profile_region, profile_report
from .interface import IterSolveResult, IterSolverOpts
from .precond import Identity

__all__ = ["cg_solve", "gmres_solve", "CG", "Gmres"]


def _lattice_solve_layout(system, precond) -> str:
    """"lattice" when both the operator and the preconditioner can run on
    channel-major vectors (see MatrixFreeSystem.lattice_layout_key): the
    whole Krylov loop then skips the operator's per-apply entry/exit
    transposes (~60us/iteration on TPU at the flagship), converting layouts
    once per solve inside the jitted program."""
    lk = getattr(system, "lattice_layout_key", None)
    if lk is None or not getattr(precond, "supports_lattice_layout", False):
        return "dof"
    try:
        return "lattice" if lk() is not None else "dof"
    except Exception:
        return "dof"


def _precond_parts(precond, system, layout: str = "dof"):
    """(apply(r, *consts), consts) for a preconditioner; falls back to the
    closure-style setup() for third-party preconditioners (small state only).

    Results are cached on the system keyed by (preconditioner, assembly
    epoch): repeated solves between reassemblies (e.g. inner iterations of a
    nonlinear step) reuse factors/level schedules for free, and a reassembly
    (``end_assembly`` bumps the epoch) invalidates them -- the analog of
    Ifpack2's ``initialize``/``compute`` split (factor reuse across solves,
    ``solve/Ifpack2Preconditioners.hpp:85-96``).

    A preconditioner may declare ``lag = k`` (int attribute): its factors are
    then reused for up to k reassemblies before recomputation -- the standard
    frozen-preconditioner trick for transient/nonlinear stepping, where the
    operator drifts slowly and a slightly stale M costs a few extra Krylov
    iterations but saves the whole setup (host ILU factorization, MG
    hierarchy) each step."""
    epoch = getattr(system, "_assembly_epoch", None)
    lag_attr = getattr(precond, "lag", 0) or 0
    if lag_attr == "auto" and epoch is not None:
        # adaptive freeze: keep the factors until the observed iteration
        # count degrades past refresh_ratio x the post-refresh baseline
        # (reported back by the solver via _note_precond_iters).  For slowly
        # drifting transient operators this amortizes the setup cost over
        # arbitrarily many steps instead of a fixed lag guess.
        st = _auto_refresh_state(system, precond)
        if st["stale"] or st["epoch"] is None:
            st["epoch"], st["stale"], st["baseline"] = epoch, False, None
        epoch = st["epoch"]
    elif lag_attr and epoch is not None:
        lag = int(lag_attr)
        epoch = epoch - (epoch % (lag + 1))  # bucket epochs: refresh every k+1
    key = None
    if epoch is not None:
        try:
            key = (precond, epoch, layout)
            hash(key)
        except TypeError:
            key = None
    if key is not None:
        cache = getattr(system, "_precond_parts_cache", None)
        if cache is None:
            cache = system._precond_parts_cache = {}
        else:
            # drop stale factors from earlier (bucketed) epochs -- per entry,
            # so a lagged preconditioner's live bucket survives other
            # preconditioners' refreshes
            for k in [k for k in cache if k[0] == precond and k[1] != epoch]:
                del cache[k]
            if len(cache) > 16:  # bound abandoned preconditioners' entries
                cache.clear()
        hit = cache.get(key)
        if hit is not None:
            return hit
    with profile_region(f"precond/setup[{type(precond).__name__}]"):
        setup_parts = getattr(precond, "setup_parts", None)
        if setup_parts is not None:
            parts = setup_parts(system, layout=layout) if layout != "dof" else setup_parts(system)
        elif layout != "dof":
            raise ValueError(f"{type(precond).__name__} does not support layout={layout!r}")
        else:
            M = precond.setup(system)
            parts = (lambda r, *pc: M(r)), ()
        if profile_enabled():
            phase_fence(parts[1])
    if key is not None:
        cache[key] = parts
    return parts


def _auto_refresh_state(system, precond) -> dict:
    # keyed by id(precond), with the object pinned in the value: hashing the
    # preconditioner would (a) TypeError on unhashable configs and (b) let two
    # distinct equal-config frozen dataclasses silently share one refresh
    # state/baseline
    states = getattr(system, "_precond_auto", None)
    if states is None:
        states = system._precond_auto = {}
    st = states.get(id(precond))
    if st is None:
        st = states[id(precond)] = {
            "epoch": None,
            "stale": True,
            "baseline": None,
            "_pin": precond,  # keep id() from being recycled
        }
    return st


def _note_precond_iters(system, precond, iters: int) -> None:
    """Feed the solve's iteration count back to a ``lag='auto'``
    preconditioner: the first post-refresh solve sets the baseline, and a
    solve exceeding ``refresh_ratio`` x baseline marks the factors stale
    (refreshed on the next setup).  No-op for fixed-lag preconditioners."""
    if getattr(precond, "lag", 0) != "auto":
        return
    st = _auto_refresh_state(system, precond)
    if iters <= 0:
        return
    if st["baseline"] is None:
        st["baseline"] = max(int(iters), 1)
    elif iters > float(getattr(precond, "refresh_ratio", 1.35)) * st["baseline"]:
        st["stale"] = True


def _finish_iter_solve(system, precond, name: str, o: IterSolverOpts, it, res):
    """Shared solve epilogue: auto-lag feedback, LOUD cap-hit signal, result.

    A solve that stops at ``max_iters`` without meeting ``tol`` is an easy
    thing to miss in a stepping loop (it silently pollutes the BDF2 history),
    so it always raises a ``RuntimeWarning`` and is recorded on the system for
    ``describe()`` (``solve/SolverInterface.hpp:39-43`` result contract)."""
    import warnings

    it, res = int(it), float(res)
    _note_precond_iters(system, precond, it)
    converged = res <= o.tol
    capped = (not converged) and it >= o.max_iters
    result = IterSolveResult(tol=res, num_iters=it, converged=converged, capped=capped)
    system._last_solve_result = result
    if capped:
        warnings.warn(
            f"{name}: NOT CONVERGED — hit max_iters={o.max_iters} at relative "
            f"residual {res:.3e} (tol {o.tol:.1e})",
            RuntimeWarning,
            stacklevel=3,
        )
    if o.verbosity >= 1:
        state = "" if converged else ("  [CAPPED]" if capped else "  [not converged]")
        print(f"{name}: {it} iterations, relative residual {res:.3e}{state}")
    if o.verbosity >= 2:
        print(profile_report())
    return result


def _cached_solve_fn(system, key_extra, build):
    """Cache a jitted solve program on the system keyed by the solver config
    AND the operator/preconditioner fn OBJECTS: a fresh ``@jax.jit`` closure
    per ``solve()`` call would re-TRACE the whole operator+preconditioner
    graph every solve (measured ~15s warm overhead for a 3-level MG program
    through the remote-compile tunnel).  Keying by the fns themselves makes
    invalidation follow identity: structurally-cached operators (transient
    stepping re-assemblies) keep their fn across epochs and HIT; rebuilt fns
    (new structure, value-baking preconditioners) miss and re-jit.  Keys hold
    strong references, so fn ids are never recycled into stale hits."""
    try:
        hash(key_extra)
    except TypeError:
        return build()
    cache = getattr(system, "_solve_fn_cache", None)
    if cache is None:
        cache = system._solve_fn_cache = {}
    hit = cache.get(key_extra)
    if hit is None:
        if len(cache) > 8:  # bound retained programs (and their fn refs)
            cache.clear()
        hit = cache[key_extra] = build()
    return hit


def _chunk_iters(o) -> int:
    """Per-device-program iteration bound for IterSolverOpts.chunk."""
    if not o.chunk:
        return o.max_iters
    if o.residual_scaling == "initial":
        raise ValueError(
            "chunked solves are incompatible with residual_scaling='initial' "
            "(each restart would re-normalize to its own initial residual)"
        )
    return min(int(o.chunk), o.max_iters)


def _run_chunked(solve_fn, o, b, x0, args):
    """Drive a bounded-iteration solve program to convergence with warm
    host-side restarts (IterSolverOpts.chunk).  The last chunk may overshoot
    ``max_iters`` by at most ``chunk - 1`` iterations (the bound is per
    program).  Returns (x, total_iters, res)."""
    # one batched device_get per chunk: separate int()/float() readbacks cost
    # a ~29 ms tunnel round trip EACH
    def _get(it, res):
        it_h, res_h = jax.device_get((it, res))
        return int(it_h), float(res_h)

    with profile_region("solve/krylov_chunk"):
        x, it, res = solve_fn(b, x0, *args)
        if not o.chunk:
            it_h, res_h = _get(it, res)
            return x, it_h, res_h
        it_h, res_h = _get(it, res)
    total = it_h
    while total < o.max_iters and res_h > o.tol and it_h > 0:
        with profile_region("solve/krylov_chunk"):
            x, it, res = solve_fn(b, x, *args)
            it_h, res_h = _get(it, res)
        total += it_h
    return x, total, res_h


def _col_dots(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-column inner products of (..., n_rhs) multivectors -> (n_rhs,).

    All leading axes are reduced, so the same code serves single-device
    (n, n_rhs) vectors and sharded stacked (n_shards, n_local, n_rhs) layouts
    (where the reduction lowers to a psum over the device mesh).
    """
    return jnp.sum(a * b, axis=tuple(range(a.ndim - 1)))


def _residual_scale(b, r0, residual_scaling: str):
    """Residual normalization (``solve/SolverInterface.hpp:26-37``):
    "rhs" (norm of b, the default), "initial" (norm of r0), or "none"."""
    if residual_scaling == "rhs":
        s = jnp.sqrt(_col_dots(b, b))
    elif residual_scaling == "initial":
        s = jnp.sqrt(_col_dots(r0, r0))
    elif residual_scaling == "none":
        return jnp.ones(b.shape[-1], b.dtype)
    else:
        raise ValueError(f"unknown residual_scaling {residual_scaling!r}")
    return jnp.where(s > 0, s, 1.0)


def cg_solve(operator, b, x0=None, precond=None, tol=1e-10, max_iters=1000,
             residual_scaling="rhs", verbosity=0):
    """Preconditioned conjugate gradients on an SPD operator; multivector RHS.

    Each right-hand-side column iterates with its own step lengths (the
    analog of Belos "Block CG" pseudo-block mode).  Returns (x, n_iters,
    achieved relative residual).
    """
    b = jnp.atleast_2d(b.T).T if b.ndim == 1 else b
    x0 = jnp.zeros_like(b) if x0 is None else x0
    M = precond if precond is not None else (lambda r: r)

    r0 = b - operator(x0)
    bnorm = _residual_scale(b, r0, residual_scaling)
    z0 = M(r0)
    rz0 = _col_dots(r0, z0)

    def cond(state):
        x, r, z, p, rz, it = state
        res = jnp.sqrt(_col_dots(r, r)) / bnorm
        return jnp.logical_and(it < max_iters, jnp.max(res) > tol)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = operator(p)
        pAp = _col_dots(p, Ap)
        alpha = jnp.where(pAp != 0, rz / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = _col_dots(r, z)
        beta = jnp.where(rz != 0, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta * p
        if verbosity >= 2:
            jax.debug.print(
                "CG it {it}: rel res {res:.3e}",
                it=it + 1,
                res=jnp.max(jnp.sqrt(_col_dots(r, r)) / bnorm),
            )
        return (x, r, z, p, rz_new, it + 1)

    state = (x0, r0, z0, z0, rz0, jnp.asarray(0))
    x, r, _, _, _, it = jax.lax.while_loop(cond, body, state)
    res = jnp.max(jnp.sqrt(_col_dots(r, r)) / bnorm)
    return x, it, res


def _back_substitute(R: jnp.ndarray, g: jnp.ndarray, m: int) -> jnp.ndarray:
    """Solve R y = g for upper-triangular R (m, m, n_rhs), g (m, n_rhs).

    Zero diagonal entries (happy breakdown / frozen columns) yield y=0 for
    that row instead of NaN.  Manual loop: no LU anywhere (TPU f64 safe).
    """
    tiny = jnp.asarray(1e-30, R.dtype)

    def body(k, y):
        j = m - 1 - k
        s = g[j] - jnp.sum(R[j] * y, axis=0)
        d = R[j, j]
        yj = jnp.where(jnp.abs(d) > tiny, s / jnp.where(jnp.abs(d) > tiny, d, 1.0), 0.0)
        return y.at[j].set(yj)

    return jax.lax.fori_loop(0, m, body, jnp.zeros_like(g))


def gmres_solve(operator, b, x0=None, precond=None, tol=1e-10, max_iters=1000, restart=50,
                residual_scaling="rhs", verbosity=0):
    """Restarted GMRES(m): native Arnoldi (modified Gram-Schmidt) + Givens.

    Analog of the Belos GMRES (``solve/BelosSolvers.hpp:124-127``), built as a
    jit-compiled ``lax.while_loop`` over restart cycles with a ``fori_loop``
    Arnoldi inside.  Layout-agnostic: the solution vector may be (n, n_rhs)
    or a sharded stacked (n_shards, n_local, n_rhs) -- all inner products are
    :func:`_col_dots` reductions over every axis but the last, so each RHS
    column runs its own Hessenberg system (pseudo-block mode), and under
    sharding the reductions lower to psum collectives.  Left-preconditioned;
    convergence is checked on the TRUE (unpreconditioned) relative residual at
    each restart boundary.  Returns (x, honest inner-iteration count, res).
    """
    b2 = b[:, None] if b.ndim == 1 else b
    x0_ = jnp.zeros_like(b2) if x0 is None else (x0[:, None] if x0.ndim == 1 else x0)
    M = precond if precond is not None else (lambda r: r)
    m = int(max(1, min(restart, max_iters)))
    n_rhs = b2.shape[-1]
    dt = b2.dtype
    tiny = jnp.asarray(1e-30, dt)

    bnorm = _residual_scale(b2, b2 - operator(x0_), residual_scaling)

    def safe_div(a, d):
        ok = jnp.abs(d) > tiny
        return jnp.where(ok, a / jnp.where(ok, d, 1.0), 0.0)

    def cycle(x, res_prev):
        r = M(b2 - operator(x))
        beta = jnp.sqrt(_col_dots(r, r))  # (n_rhs,)
        V = jnp.zeros((m + 1,) + b2.shape, dt)
        V = V.at[0].set(r * safe_div(jnp.ones_like(beta), beta))
        R = jnp.zeros((m + 1, m, n_rhs), dt)
        cs = jnp.zeros((m, n_rhs), dt)
        sn = jnp.zeros((m, n_rhs), dt)
        g = jnp.zeros((m + 1, n_rhs), dt).at[0].set(beta)
        # early-exit threshold for the PRECONDITIONED Givens estimate |g[j]|:
        # at cycle start est0 corresponds exactly to the known TRUE relative
        # residual res_prev, so `est * res_prev / est0 <= tol` predicts true
        # convergence; the 0.25 safety absorbs in-cycle drift of the
        # preconditioned/true norm ratio (without it, Jacobi-preconditioned
        # solves stagnate one Givens step short of the true tolerance)
        est0 = jnp.max(beta / bnorm)
        inner_tol = 0.25 * tol * safe_div(est0, jnp.maximum(res_prev, tiny))

        def arnoldi_cond(carry):
            # early exit when every column's Givens residual estimate has
            # converged -- no post-convergence applies inside the cycle; the
            # TRUE residual is still re-checked at the restart boundary.
            # At least ONE step always runs (j == 0 short-circuit), so the
            # outer loop cannot deadlock on a zero-step cycle
            V, R, cs, sn, g, j = carry
            est = jnp.max(jnp.abs(g[j]) / bnorm)
            return jnp.logical_and(j < m, jnp.logical_or(j == 0, est > inner_tol))

        def arnoldi(carry):
            V, R, cs, sn, g, j = carry
            w = M(operator(V[j]))
            h = jnp.zeros((m + 1, n_rhs), dt)

            def mgs(i, hw):
                h, w = hw
                hi = _col_dots(V[i], w)
                return h.at[i].set(hi), w - V[i] * hi

            h, w = jax.lax.fori_loop(0, j + 1, mgs, (h, w))
            hj1 = jnp.sqrt(_col_dots(w, w))
            h = h.at[j + 1].set(hj1)
            V = V.at[j + 1].set(w * safe_div(jnp.ones_like(hj1), hj1))

            def rot(i, h):
                hi, hi1 = h[i], h[i + 1]
                return h.at[i].set(cs[i] * hi + sn[i] * hi1).at[i + 1].set(
                    -sn[i] * hi + cs[i] * hi1
                )

            h = jax.lax.fori_loop(0, j, rot, h)
            denom = jnp.sqrt(h[j] ** 2 + h[j + 1] ** 2)
            cj = jnp.where(denom > tiny, safe_div(h[j], denom), 1.0)
            sj = safe_div(h[j + 1], denom)
            cs, sn = cs.at[j].set(cj), sn.at[j].set(sj)
            h = h.at[j].set(denom).at[j + 1].set(0.0)
            g = g.at[j + 1].set(-sj * g[j]).at[j].set(cj * g[j])
            R = R.at[:, j].set(h)
            return V, R, cs, sn, g, j + 1

        V, R, cs, sn, g, j_done = jax.lax.while_loop(
            arnoldi_cond, arnoldi, (V, R, cs, sn, g, jnp.asarray(0))
        )
        # rows past j_done have zero R diagonal -> y=0 there (see
        # _back_substitute), so the static-m back-substitution is exact
        y = _back_substitute(R[:m], g[:m], m)  # (m, n_rhs)
        yb = y.reshape((m,) + (1,) * (b2.ndim - 1) + (n_rhs,))
        return x + jnp.sum(V[:m] * yb, axis=0), j_done

    def cond(state):
        x, it, res = state
        return jnp.logical_and(it < max_iters, res > tol)

    def body(state):
        x, it, res_prev = state
        x, j_done = cycle(x, res_prev)
        r = b2 - operator(x)
        res = jnp.max(jnp.sqrt(_col_dots(r, r)) / bnorm)
        if verbosity >= 2:
            jax.debug.print(
                "GMRES it {it}: rel res {res:.3e}", it=it + j_done, res=res
            )
        return (x, it + j_done, res)

    r0 = b2 - operator(x0_)
    res0 = jnp.max(jnp.sqrt(_col_dots(r0, r0)) / bnorm)
    x, it, res = jax.lax.while_loop(cond, body, (x0_, jnp.asarray(0), res0))
    return (x[:, 0] if b.ndim == 1 else x), it, res


@dataclass
class CG:
    """User-facing CG solver (``solve/BelosSolvers.hpp:116``)."""

    opts: IterSolverOpts = field(default_factory=IterSolverOpts)
    precond: object = field(default_factory=Identity)

    def solve(self, system) -> IterSolveResult:
        o = self.opts
        layout = _lattice_solve_layout(system, self.precond)
        fn, consts = (
            system.operator_parts(layout=layout)
            if layout != "dof"
            else system.operator_parts()
        )
        M_fn, M_consts = _precond_parts(self.precond, system, layout)
        n_oc = len(consts)
        inner_iters = _chunk_iters(o)

        def build():
            @jax.jit
            def solve_fn(b, x0, *all_consts):
                oc = all_consts[:n_oc]
                pc = all_consts[n_oc:]
                if layout == "lattice":
                    # optimization_barrier is REQUIRED between the layout
                    # transpose and the Krylov while_loop: without it XLA:TPU
                    # mis-schedules the fused transpose-into-loop program and
                    # the solve diverges (verified f32 flagship: 8 iters with
                    # the barrier / stuck at 1e7 residual without; the
                    # transpose and a single apply are bit-exact either way).
                    b, x0 = jax.lax.optimization_barrier(
                        (system.to_lattice_layout(b), system.to_lattice_layout(x0))
                    )
                x, it, res = cg_solve(
                    lambda v: fn(v, *oc), b, x0=x0,
                    precond=lambda r: M_fn(r, *pc), tol=o.tol, max_iters=inner_iters,
                    residual_scaling=o.residual_scaling, verbosity=o.verbosity,
                )
                if layout == "lattice":
                    x = system.from_lattice_layout(x)
                return x, it, res

            return solve_fn

        solve_fn = _cached_solve_fn(
            system,
            ("cg", fn, M_fn, n_oc, len(M_consts), o.tol, inner_iters,
             o.residual_scaling, o.verbosity, layout),
            build,
        )
        b = system.effective_rhs()
        x, it, res = _run_chunked(
            solve_fn, o, b, system.solution_vector(), (*consts, *M_consts)
        )
        system.set_solution_vector(x)
        return _finish_iter_solve(system, self.precond, "CG", o, it, res)


@dataclass
class Gmres:
    """User-facing restarted GMRES solver (``solve/BelosSolvers.hpp:124``)."""

    opts: IterSolverOpts = field(default_factory=IterSolverOpts)
    precond: object = field(default_factory=Identity)

    def solve(self, system) -> IterSolveResult:
        o = self.opts
        layout = _lattice_solve_layout(system, self.precond)
        fn, consts = (
            system.operator_parts(layout=layout)
            if layout != "dof"
            else system.operator_parts()
        )
        M_fn, M_consts = _precond_parts(self.precond, system, layout)
        n_oc = len(consts)
        inner_iters = _chunk_iters(o)

        def build():
            @jax.jit
            def solve_fn(b, x0, *all_consts):
                oc = all_consts[:n_oc]
                pc = all_consts[n_oc:]
                if layout == "lattice":
                    # see CG.solve: barrier guards an XLA:TPU mis-schedule of
                    # the transpose fused into the Krylov while_loop
                    b, x0 = jax.lax.optimization_barrier(
                        (system.to_lattice_layout(b), system.to_lattice_layout(x0))
                    )
                x, it, res = gmres_solve(
                    lambda v: fn(v, *oc), b, x0=x0, precond=lambda r: M_fn(r, *pc),
                    tol=o.tol, max_iters=inner_iters, restart=o.restart,
                    residual_scaling=o.residual_scaling, verbosity=o.verbosity,
                )
                if layout == "lattice":
                    x = system.from_lattice_layout(x)
                return x, it, res

            return solve_fn

        solve_fn = _cached_solve_fn(
            system,
            ("gmres", fn, M_fn, n_oc, len(M_consts), o.tol, inner_iters,
             o.restart, o.residual_scaling, o.verbosity, layout),
            build,
        )
        b = system.effective_rhs()
        x, it, res = _run_chunked(
            solve_fn, o, b, system.solution_vector(), (*consts, *M_consts)
        )
        system.set_solution_vector(x)
        return _finish_iter_solve(system, self.precond, "GMRES", o, it, res)
