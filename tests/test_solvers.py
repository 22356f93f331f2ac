"""Solver x preconditioner matrix tests on a hand-built SPD system.

The analog of ``tests/SolverTests.cpp:14-41``: a small 1D-Laplacian-like SPD
matrix solved with every solver/preconditioner combination, checked against a
dense factorization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import l3ster_tpu as lt


class _DenseSystem:
    """Minimal system-protocol wrapper around an explicit SPD matrix."""

    def __init__(self, A: np.ndarray, b: np.ndarray):
        self.A = jnp.asarray(A)
        self.b = jnp.asarray(b).reshape(len(b), -1)
        self.n_dofs = A.shape[0]
        self.x = jnp.zeros_like(self.b)
        self.dtype = self.b.dtype  # part of the system protocol (direct.py)

    def operator_parts(self):
        return (lambda x, A: A @ x), (self.A,)

    def operator(self):
        fn, consts = self.operator_parts()
        return lambda x: fn(x, *consts)

    def effective_rhs(self):
        return self.b

    def diagonal(self):
        return jnp.diagonal(self.A)

    def solution_vector(self):
        return self.x

    def set_solution_vector(self, x):
        self.x = x.reshape(self.b.shape)

    def eliminated_csr(self):
        A = np.asarray(self.A)
        n = A.shape[0]
        indptr = np.arange(n + 1) * n
        indices = np.tile(np.arange(n), n)
        return jnp.asarray(A.reshape(-1)), indices, indptr, n


def _spd_system(n=60, n_rhs=2, seed=0):
    rng = np.random.default_rng(seed)
    # 1D Laplacian + mass: SPD, moderately conditioned
    A = 2.0 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1) + 0.1 * np.diag(rng.uniform(1, 2, n))
    b = rng.normal(size=(n, n_rhs))
    return _DenseSystem(A, b), np.linalg.solve(A, b)


SOLVERS = [
    ("cg-identity", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000))),
    ("cg-jacobi", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())),
    ("cg-richardson", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=lt.Richardson(0.4))),
    ("cg-chebyshev", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Chebyshev())),
    ("gmres-identity", lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-10, max_iters=4000))),
    ("gmres-jacobi", lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.Jacobi())),
    ("cg-blockjacobi", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.BlockJacobi(block_size=3))),
    ("cg-sgs", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.SGS())),
    ("cg-ilu0", lambda: lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.ILU0())),
    ("gmres-ilu0", lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.ILU0())),
    # note: ILUT's permuted factorization is nonsymmetric -> GMRES only
    ("gmres-ilut", lambda: lt.Gmres(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.ILUT(drop_tol=1e-5))),
    ("klu2", lt.Klu2),
    ("lapack", lt.Lapack),
]


@pytest.mark.parametrize("name,make", SOLVERS, ids=[s[0] for s in SOLVERS])
def test_solver_on_spd_matrix(name, make):
    system, x_exact = _spd_system()
    res = make().solve(system)
    x = np.asarray(system.solution_vector())
    err = np.abs(x - x_exact).max() / np.abs(x_exact).max()
    assert err < 1e-7, (name, err, res)


def test_cg_reports_convergence_failure():
    system, _ = _spd_system()
    res = lt.CG(lt.IterSolverOpts(tol=1e-14, max_iters=3)).solve(system)
    assert res.num_iters == 3 and res.tol > 1e-14  # honest non-convergence report


def _nonsym_system(n=60, n_rhs=2, seed=1):
    rng = np.random.default_rng(seed)
    # advection-diffusion-like: nonsymmetric, well-conditioned
    # mildly nonsymmetric (short-restart GMRES stagnates on strongly
    # non-normal matrices -- verified against scipy)
    A = (
        2.0 * np.eye(n)
        - 1.1 * np.eye(n, k=1)
        - 0.9 * np.eye(n, k=-1)
        + 0.02 * rng.normal(size=(n, n))
    )
    b = rng.normal(size=(n, n_rhs))
    return _DenseSystem(A, b), np.linalg.solve(A, b)


@pytest.mark.parametrize("restart", [10, 30, 200])
def test_gmres_nonsymmetric(restart):
    """Native Arnoldi/Givens GMRES on a nonsymmetric matrix, multivector RHS,
    across restart lengths; honest iteration counts."""
    system, x_exact = _nonsym_system()
    res = lt.Gmres(
        lt.IterSolverOpts(tol=1e-11, max_iters=2000, restart=restart), precond=lt.Jacobi()
    ).solve(system)
    x = np.asarray(system.solution_vector())
    err = np.abs(x - x_exact).max() / np.abs(x_exact).max()
    assert err < 1e-8, (err, res)
    assert res.num_iters > 0  # honest (the old delegate reported -1)
    assert res.tol < 1e-11


def test_gmres_reports_convergence_failure():
    system, _ = _nonsym_system()
    res = lt.Gmres(lt.IterSolverOpts(tol=1e-14, max_iters=5, restart=5)).solve(system)
    assert res.num_iters >= 5 and res.tol > 1e-14


def test_gmres_early_exit():
    """The Arnoldi loop must stop at convergence, not run the full restart
    cycle: a matrix with k distinct eigenvalues converges in <= k Krylov
    steps, so with restart=n the honest inner-iteration count must be ~k,
    not n (``solve/BelosSolvers.hpp:124-127`` per-iteration stopping)."""
    from l3ster_tpu.solve.krylov import gmres_solve

    rng = np.random.default_rng(3)
    n, k = 64, 5
    evals = np.resize(np.linspace(1.0, 2.0, k), n)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    A = Q @ np.diag(evals) @ Q.T
    b = rng.normal(size=(n, 1))

    x, it, res = gmres_solve(
        lambda v: jnp.asarray(A) @ v, jnp.asarray(b), tol=1e-10,
        max_iters=1000, restart=n,
    )
    assert float(res) < 1e-10
    assert int(it) <= k + 2, int(it)  # not a full n=64 cycle
    err = np.abs(np.asarray(x) - np.linalg.solve(A, b)).max()
    assert err < 1e-8


def test_gmres_stacked_layout():
    """GMRES must run on stacked (n_shards, n_local, n_rhs) vectors (the
    distributed layout) -- all reductions are layout-agnostic."""
    from l3ster_tpu.solve.krylov import gmres_solve

    system, x_exact = _nonsym_system(n=64)
    A = np.asarray(system.A)
    b3 = np.asarray(system.b).reshape(4, 16, 2)

    def op(v):
        return (A @ v.reshape(64, 2)).reshape(4, 16, 2)

    x, it, res = gmres_solve(op, jnp.asarray(b3), tol=1e-11, max_iters=2000, restart=48)
    assert x.shape == (4, 16, 2)
    err = np.abs(np.asarray(x).reshape(64, 2) - x_exact).max()
    assert err < 1e-8 and int(it) > 0


def test_strong_preconditioners_cut_iterations():
    """ILU0 / SGS / BlockJacobi on a real assembled LSFEM system must converge
    in far fewer Krylov iterations than point Jacobi
    (``Ifpack2Preconditioners.hpp:97-186`` rationale)."""
    import l3ster_tpu as lt
    from tests.test_diffusion_2d import adiabatic_bc, diffusion_kernel_2d

    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 5)), order=3)
    problem = lt.ProblemDefinition(3, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([3, 4], [0])
    system = lt.make_algebraic_system(mesh, problem, bcs)
    kd = lt.wrap_domain_equation_kernel(
        diffusion_kernel_2d, lt.KernelParams(dimension=2, n_equations=4, n_unknowns=3)
    )
    kn = lt.wrap_boundary_equation_kernel(
        adiabatic_bc, lt.KernelParams(dimension=2, n_equations=1, n_unknowns=3)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        lambda i, o: o.__setitem__(0, i.point.x), lt.KernelParams(dimension=2, n_equations=1)
    )
    opts = lt.AssemblyOptions(value_order=1, derivative_order=0)
    system.set_dirichlet_bc_values(kdir, [3, 4], [0])
    system.begin_assembly()
    system.assemble_problem(kd, [0], options=opts)
    system.assemble_problem(kn, [1, 2])
    system.end_assembly()

    iters = {}
    for name, pc in [
        ("jacobi", lt.Jacobi()),
        ("blockjacobi", lt.BlockJacobi()),
        ("sgs", lt.SGS()),
        ("ilu0", lt.ILU0()),
    ]:
        res = system.solve(lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=20000), precond=pc))
        assert res.tol < 1e-9, (name, res)
        iters[name] = res.num_iters
    assert iters["ilu0"] * 3 <= iters["jacobi"], iters
    assert iters["sgs"] * 3 <= iters["jacobi"], iters
    assert iters["blockjacobi"] < iters["jacobi"], iters


def test_solver_options_scaling_and_verbosity(capsys):
    """residual_scaling modes + verbosity output (SolverInterface.hpp:26-37)."""
    system, x_exact = _spd_system()
    res = lt.CG(
        lt.IterSolverOpts(tol=1e-12, max_iters=2000, residual_scaling="initial", verbosity=1)
    ).solve(system)
    assert res.tol < 1e-12
    out = capsys.readouterr().out
    assert "CG:" in out and "iterations" in out
    x = np.asarray(system.solution_vector())
    assert np.abs(x - x_exact).max() / np.abs(x_exact).max() < 1e-7

    system2, _ = _spd_system()
    res2 = lt.CG(lt.IterSolverOpts(tol=1e-9, max_iters=2000, residual_scaling="none")).solve(system2)
    assert res2.tol < 1e-9  # absolute residual converged

    import pytest as _pytest

    with _pytest.raises(ValueError):
        lt.CG(lt.IterSolverOpts(residual_scaling="bogus")).solve(_spd_system()[0])


def test_relaxation_sweep_options():
    """Ifpack2-style multi-sweep damped relaxation (Ifpack2Preconditioners.hpp:68-96):
    more sweeps must not hurt convergence, and all variants reach the answer."""
    iters = {}
    for name, pc in [
        ("jacobi-1", lt.Jacobi()),
        ("jacobi-3", lt.Jacobi(sweeps=3, damping=0.9)),
        ("sgs-2", lt.SGS(sweeps=2)),
    ]:
        system, x_exact = _spd_system()
        res = lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=4000), precond=pc).solve(system)
        x = np.asarray(system.solution_vector())
        assert np.abs(x - x_exact).max() / np.abs(x_exact).max() < 1e-7, name
        iters[name] = res.num_iters
    assert iters["jacobi-3"] <= iters["jacobi-1"]
    assert iters["sgs-2"] > 0


def test_precond_setup_cached_across_solves():
    """Preconditioner factors are reused across solves until the next
    end_assembly bumps the assembly epoch (Ifpack2 initialize/compute split,
    ``solve/Ifpack2Preconditioners.hpp:85-96``): transient runs must not
    re-factor when the operator is unchanged."""
    import l3ster_tpu as lt
    from l3ster_tpu.solve.krylov import _precond_parts

    mesh = lt.generate_mesh(lt.make_square_mesh(np.linspace(0.0, 1.0, 4)), order=2)
    problem = lt.ProblemDefinition(1, [0])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet([1, 2, 3, 4], [0])
    system = lt.make_algebraic_system(
        mesh, problem, bcs,
        lt.AlgebraicSystemParams(eval_strategy=lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY),
    )

    def kd(inp, out):
        ops, _ = out
        ops[1][0, 0] = 1.0
        ops[2][0, 0] = 1.0

    k = lt.wrap_domain_equation_kernel(kd, lt.KernelParams(dimension=2, n_equations=2))
    system.begin_assembly()
    system.assemble_problem(k, [0])
    system.end_assembly()

    calls = {"n": 0}
    orig = lt.ILU0.setup_parts

    def counting(self, s):
        calls["n"] += 1
        return orig(self, s)

    lt.ILU0.setup_parts = counting
    try:
        pre = lt.ILU0()
        p1 = _precond_parts(pre, system)
        p2 = _precond_parts(pre, system)
        assert calls["n"] == 1 and p1 is p2  # cached within the epoch
        # an equal-valued instance hits the same cache slot (frozen dataclass)
        _precond_parts(lt.ILU0(), system)
        assert calls["n"] == 1
        system.begin_assembly()
        system.assemble_problem(k, [0])
        system.end_assembly()
        _precond_parts(pre, system)
        assert calls["n"] == 2  # reassembly invalidates
    finally:
        lt.ILU0.setup_parts = orig


def test_precond_lag_reuses_factors():
    """ILU0(lag=2) must keep its factors across up to 2 reassembly epochs
    (frozen-preconditioner transient stepping) and refresh on the next
    bucket; the solve stays correct with the slightly stale M."""
    system, x_exact = _spd_system()
    system._assembly_epoch = 1
    lagged = lt.ILU0(lag=2)
    solver = lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lagged)
    solver.solve(system)
    cache = system._precond_parts_cache
    key0 = [k for k in cache if k[0] == lagged]
    assert len(key0) == 1
    entry = cache[key0[0]]
    # next epoch within the lag window: same factors object reused
    system._assembly_epoch = 2
    solver.solve(system)
    assert cache[[k for k in cache if k[0] == lagged][0]] is entry
    # past the window: refreshed
    system._assembly_epoch = 3
    solver.solve(system)
    new = cache[[k for k in cache if k[0] == lagged][0]]
    assert new is not entry
    x = np.asarray(system.solution_vector())
    assert np.abs(x - x_exact).max() / np.abs(x_exact).max() < 1e-7


def test_chunked_cg_matches_unchunked():
    """IterSolverOpts.chunk bounds each device program and warm-restarts on
    the host; the chunked solve must reach the same answer (restarted CG) and
    report the accumulated iteration count."""
    system, x_exact = _spd_system()
    full = lt.CG(lt.IterSolverOpts(tol=1e-12, max_iters=2000), precond=lt.Jacobi())
    r_full = full.solve(system)
    x_full = np.asarray(system.solution_vector())

    system.x = jnp.zeros_like(system.x)
    chunked = lt.CG(
        lt.IterSolverOpts(tol=1e-12, max_iters=2000, chunk=17), precond=lt.Jacobi()
    )
    r_chunk = chunked.solve(system)
    x_chunk = np.asarray(system.solution_vector())
    assert np.abs(x_chunk - x_exact).max() / np.abs(x_exact).max() < 1e-9
    assert np.abs(x_full - x_exact).max() / np.abs(x_exact).max() < 1e-9
    assert r_chunk.tol <= 1e-12
    # restarted CG may need a few extra iterations, but not runaway
    assert r_full.num_iters - 2 <= r_chunk.num_iters <= 3 * r_full.num_iters + 17


def test_chunked_gmres_matches_unchunked():
    system, x_exact = _spd_system()
    chunked = lt.Gmres(
        lt.IterSolverOpts(tol=1e-10, max_iters=4000, chunk=25, restart=20),
        precond=lt.Jacobi(),
    )
    r = chunked.solve(system)
    x = np.asarray(system.solution_vector())
    assert np.abs(x - x_exact).max() / np.abs(x_exact).max() < 1e-7
    assert r.tol <= 1e-10


def test_chunked_respects_max_iters():
    """A chunked non-converging solve stops launching chunks at max_iters."""
    system, _ = _spd_system()
    s = lt.CG(lt.IterSolverOpts(tol=1e-30, max_iters=40, chunk=16))
    r = s.solve(system)
    assert 40 <= r.num_iters <= 48  # last chunk may overshoot by < chunk


def test_chunk_rejects_initial_scaling():
    system, _ = _spd_system()
    s = lt.CG(lt.IterSolverOpts(chunk=8, residual_scaling="initial"))
    with pytest.raises(ValueError, match="initial"):
        s.solve(system)
