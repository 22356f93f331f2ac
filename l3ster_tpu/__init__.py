"""l3ster_tpu: TPU-native least-squares spectral/hp finite element framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of the L3STER
C++23 library (kubagalecki/L3STER): users declare systems of first-order PDEs
as pointwise kernels filling operators ``A0, A1..AD`` and source ``f``, supply
a high-order tensor-product mesh, and the framework assembles and solves the
least-squares FEM normal equations -- batched over struct-of-arrays element
blocks, matrix-free or explicitly assembled, sharded over a TPU device mesh.

The public surface mirrors the reference's umbrella header ``l3ster.hpp``.
"""

import os as _os

import jax as _jax

# Correctness-by-default on TPU: un-annotated f32 contractions otherwise run
# single-pass bf16 on the MXU, and FEM geometry/setup algebra (Jacobians are
# O(h) sums of O(1) coordinate products) loses its leading digits to
# cancellation — percent-level operator errors that grow as the mesh refines.
# Hot apply paths pass an explicit tuned ``precision=`` (see
# ops/lattice_sumfact._mxu_precision) and are unaffected.  Opt out with
# L3STER_TPU_DEFAULT_MATMUL=default.
_dmp = _os.environ.get("L3STER_TPU_DEFAULT_MATMUL", "highest")
if _dmp != "default":
    _jax.config.update("jax_default_matmul_precision", _dmp)

from .common.enums import CondensationPolicy, LocalEvalStrategy, OperatorEvaluationStrategy
from .common.kernel import (
    BoundaryInput,
    DomainInput,
    KernelParams,
    SpaceTimePoint,
    wrap_boundary_equation_kernel,
    wrap_boundary_residual_kernel,
    wrap_domain_equation_kernel,
    wrap_domain_residual_kernel,
)
from .common.problem import AlgebraicSystemParams, AssemblyOptions, BCDefinition, ProblemDefinition
from .algsys.system import AssembledSystem, MatrixFreeSystem, make_algebraic_system
from .mesh.convert_order import convert_mesh_to_order
from .mesh.core import ElementBlock, Mesh
from .mesh.generators import (
    CubeMeshIds,
    CylinderInChannel2DIds,
    SquareMeshIds,
    graded_distribution,
    extrude_to_3d,
    make_cube_mesh,
    make_cylinder_in_channel_2d,
    make_cylinder_in_channel_3d,
    make_half_cylinder_in_channel_2d,
    make_line_mesh,
    make_square_mesh,
)
from .mesh.gmsh import read_gmsh
from .mesh.traits import ElementType
from .parallel.box import BoxSystem, box_parallelize
from .parallel.distributed import DistributedSystem, make_distributed_system
from .post.integral import compute_integral, compute_norm_l2
from .post.native_io import Loader, load, save
from .post.solution import FieldAccess, SolutionManager
from .post.vtk import ExportDefinition, PvtuExporter
from .solve.adjoint import linear_solve
from .solve.direct import Klu2, Lapack
from .solve.interface import IterSolveResult, IterSolverOpts
from .solve.krylov import CG, Gmres
from .solve.lowordermg import LowOrderMG
from .solve.pmg import PMultigrid
from .solve.precond import (
    SGS,
    BlockJacobi,
    Chebyshev,
    Identity,
    ILU0,
    ILUT,
    Jacobi,
    Richardson,
)

__version__ = "0.1.0"


def generate_mesh(mesh: Mesh, order: int = 1) -> Mesh:
    """Convenience analog of ``generateAndDistributeMesh``: promote a generated
    order-1 mesh to the requested element order.  Tensor-grid meshes are
    relabeled to lattice node order so element access needs no gathers
    (``ops/lattice.py``)."""
    from .mesh.convert_order import lattice_renumber

    return lattice_renumber(convert_mesh_to_order(mesh, order))
