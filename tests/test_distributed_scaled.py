"""Scaled distributed regression: non-representable solution at 8 shards.

Every other distributed test uses an exactly-representable polynomial
solution on a toy mesh, which a halo bug that merely *degrades* accuracy
would pass.  Here a genuine manufactured solution (sin products, MMS) is
solved at p=4 in 3D over 8 shards: the error must (a) match the
single-shard answer and (b) sit at the converged MMS magnitude, which
requires every halo-coupled dof to be right.  A shard-sweep wall-clock is
recorded to ``benchmarks/SHARD_SWEEP.json`` so O(P^2) setup/comm
regressions show up in the record (the reference runs its MPI tests at
1/2/4 ranks, ``tests/CMakeLists.txt:53-91``; oracle pattern
``tests/Diffusion2D.hpp``).
"""

import json
import pathlib
import time

import numpy as np
import pytest

import l3ster_tpu as lt
from l3ster_tpu.parallel.distributed import make_distributed_system

PI = np.pi
DOMAIN = 0
FACES = [1, 2, 3, 4, 5, 6]


def _poisson_mms_3d(inp, out):
    import jax.numpy as jnp

    ops, rhs = out
    A0, Ax, Ay, Az = ops
    # eq 0: div q = f
    Ax[0, 1] = 1.0
    Ay[0, 2] = 1.0
    Az[0, 3] = 1.0
    # eq 1-3: q - grad u = 0
    A0[1, 1] = 1.0
    Ax[1, 0] = -1.0
    A0[2, 2] = 1.0
    Ay[2, 0] = -1.0
    A0[3, 3] = 1.0
    Az[3, 0] = -1.0
    x, y, z = inp.point.x, inp.point.y, inp.point.z
    rhs[0] = -3.0 * PI**2 * jnp.sin(PI * x) * jnp.sin(PI * y) * jnp.sin(PI * z)


def _exact_3d(inp, out):
    import jax.numpy as jnp

    x, y, z = inp.point.x, inp.point.y, inp.point.z
    out[0] = jnp.sin(PI * x) * jnp.sin(PI * y) * jnp.sin(PI * z)


def _solve_scaled(n_shards: int, n: int, order: int, partition_grid=None, solver=None):
    """Solve the 3D MMS problem distributed; return (L2 error, seconds, iters)."""
    mesh = lt.generate_mesh(
        lt.make_cube_mesh(np.linspace(0.0, 1.0, n)), order=order
    )
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet(FACES, [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY
    )
    t0 = time.perf_counter()
    system = make_distributed_system(
        mesh, problem, bcs, params, n_shards=n_shards, partition_grid=partition_grid
    )
    kd = lt.wrap_domain_equation_kernel(
        _poisson_mms_3d, lt.KernelParams(dimension=3, n_equations=4, n_unknowns=4)
    )
    kdir = lt.wrap_boundary_residual_kernel(
        _exact_3d, lt.KernelParams(dimension=3, n_equations=1)
    )
    system.set_dirichlet_bc_values(kdir, FACES, [0])
    system.begin_assembly()
    system.assemble_problem(kd, [DOMAIN])
    system.end_assembly()
    res = system.solve(
        solver
        if solver is not None
        else lt.CG(lt.IterSolverOpts(tol=1e-11, max_iters=4000), precond=lt.ILU0())
    )
    dt = time.perf_counter() - t0

    man = lt.SolutionManager(mesh, 1)
    system.update_solution([0], man, [0])

    def err_k(i, o):
        _exact_3d(i, o)
        o[0] = i.field_vals[0] - o[0]

    ek = lt.wrap_domain_residual_kernel(
        err_k, lt.KernelParams(dimension=3, n_equations=1, n_fields=1)
    )
    err = float(lt.compute_norm_l2(ek, mesh, [DOMAIN], man.field_access([0]))[0, 0])
    return err, dt, res.num_iters


def test_distributed_mms_2d_shard_grid():
    """8 shards on a (4, 2) grid (rcb2d partition + row-major ranks): same
    MMS error and CG iteration count as the single-shard solve — the
    multi-axis decomposition contract (``comm/DistributeMesh.hpp:207-227``
    topology re-ranking analog, VERDICT r3 item 9)."""
    n, order = 4, 3
    solver = lt.CG(lt.IterSolverOpts(tol=1e-10, max_iters=4000), precond=lt.Jacobi())
    e1, _, it1 = _solve_scaled(1, n, order, solver=solver)
    e8, _, it8 = _solve_scaled(8, n, order, partition_grid=(4, 2), solver=solver)
    assert abs(e8 - e1) < 1e-7 * max(e1, 1e-12), (e1, e8)
    # identical operator math modulo fp reduction order: iteration parity
    assert abs(it8 - it1) <= max(2, int(0.02 * it1)), (it1, it8)


def test_rcb2d_halo_offsets():
    """The (4, 2)-grid rcb2d partition's entire point (VERDICT r4 item 8):
    with row-major ranks the neighbor exchanges must land on the controlled
    ring offsets {±1, ±Pb, ±(Pb∓1)} (``parallel/partition.py:161-206``;
    reference topology re-rank ``comm/DistributeMesh.hpp:207-227``) — and the
    per-apply ppermute count must match ``describe()``'s claim."""
    mesh = lt.generate_mesh(lt.make_cube_mesh(np.linspace(0.0, 1.0, 5)), order=2)
    problem = lt.ProblemDefinition(4, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_dirichlet(FACES, [0])
    params = lt.AlgebraicSystemParams(
        eval_strategy=lt.OperatorEvaluationStrategy.GLOBAL_ASSEMBLY
    )
    system = make_distributed_system(
        mesh, problem, bcs, params, n_shards=8, partition_grid=(4, 2)
    )
    P, Pb = 8, 2
    allowed = {
        o % P for o in (1, -1, Pb, -Pb, Pb - 1, -(Pb - 1), Pb + 1, -(Pb + 1))
    }  # = {1, 2, 3, 5, 6, 7}: never the uncontrolled mid-ring offset 4
    offs = set(system._comm_offsets())
    assert offs and offs <= allowed, (sorted(offs), sorted(allowed))
    # one ppermute per offset per import/export; describe() must agree
    assert f"{len(offs)} neighbor offsets" in system.describe()


@pytest.mark.slow
def test_scaled_distributed_mms_8_shards():
    """p=4, 4^3 elements, 19.6k dofs, 8 shards: converged MMS accuracy and
    agreement with the single-shard solve; shard-sweep timing recorded."""
    n, order = 5, 4
    sweep = {}
    errs = {}
    for p in (1, 2, 4, 8):
        errs[p], sweep[p], _ = _solve_scaled(p, n, order)
    # (a) all shard counts agree to solver tolerance
    ref = errs[1]
    for p in (2, 4, 8):
        assert abs(errs[p] - ref) < 1e-8 * max(ref, 1e-12), (errs, p)
    # (b) the error is at the converged MMS magnitude for p=4 h=1/4
    # (~h^(p+1) = 1e-4 scale; a halo bug degrading accuracy lands >> this)
    assert ref < 5e-5, errs
    # (c) coarse-mesh sanity: refining 2^3 -> 4^3 must shrink the error
    # at roughly h^(p+1) (allowing generous slack)
    err_c, _, _ = _solve_scaled(8, 3, order)
    rate = np.log2(err_c / ref)
    assert rate > order - 0.5, (err_c, ref, rate)
    rec = {
        "test": "scaled_distributed_mms",
        "n_elements": (n - 1) ** 3,
        "order": order,
        "n_dofs": 4 * ((n - 1) * order + 1) ** 3,
        "l2_error": ref,
        "wall_s_by_shards": {str(k): round(v, 2) for k, v in sweep.items()},
    }
    out = pathlib.Path(__file__).resolve().parents[1] / "benchmarks" / "SHARD_SWEEP.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print("shard sweep:", rec)
