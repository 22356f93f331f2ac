"""Per-component periodic aliasing (``bcs/BCDefinition.hpp:95-103``).

The reference aliases only the components listed in the periodic BC's
``dof_inds``; other components of the matched nodes keep independent DOFs.
"""

import numpy as np

import l3ster_tpu as lt
from l3ster_tpu.bcs.periodic import match_periodic_nodes
from l3ster_tpu.dofs.dofmap import build_dof_map

DOMAIN, BOTTOM, TOP, LEFT, RIGHT = 0, 1, 2, 3, 4
NX = np.linspace(0.0, 1.0, 4)
NY = np.linspace(0.0, 1.0, 3)
W = NX[-1] - NX[0]


def _mesh(order=2):
    return lt.generate_mesh(lt.make_square_mesh(NX, NY), order=order)


def _pairs_and_masks(mesh, dof_inds, max_dofs):
    problem = lt.ProblemDefinition(max_dofs, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_periodic([LEFT], [RIGHT], [W, 0.0, 0.0], dof_inds=dof_inds)
    pairs, masks = match_periodic_nodes(mesh, bcs, max_dofs=max_dofs)
    return problem, pairs, masks


def test_component_masks_from_bc_definition():
    mesh = _mesh()
    _, pairs, masks = _pairs_and_masks(mesh, dof_inds=[0], max_dofs=2)
    assert len(pairs) > 0
    assert masks.shape == (len(pairs), 2)
    assert masks[:, 0].all() and not masks[:, 1].any()


def test_partial_aliasing_shares_only_selected_component():
    mesh = _mesh()
    problem, pairs, masks = _pairs_and_masks(mesh, dof_inds=[0], max_dofs=2)
    dm = build_dof_map(mesh, problem, pairs, periodic_dof_masks=masks)
    src, dst = pairs[:, 0], pairs[:, 1]
    # component 0 aliased: same global dof on both sides
    assert (dm.node_dof[src, 0] == dm.node_dof[dst, 0]).all()
    # component 1 independent: distinct global dofs
    assert (dm.node_dof[src, 1] != dm.node_dof[dst, 1]).all()
    # count: every (node, comp) numbered except the aliased images' comp 0
    assert dm.n_dofs == mesh.n_nodes * 2 - len(pairs)


def test_full_aliasing_shares_every_component():
    mesh = _mesh()
    problem, pairs, masks = _pairs_and_masks(mesh, dof_inds=[0, 1], max_dofs=2)
    dm = build_dof_map(mesh, problem, pairs, periodic_dof_masks=masks)
    src, dst = pairs[:, 0], pairs[:, 1]
    assert (dm.node_dof[src] == dm.node_dof[dst]).all()
    assert dm.n_dofs == mesh.n_nodes * 2 - 2 * len(pairs)


def test_system_respects_partial_periodic():
    mesh = _mesh()
    problem = lt.ProblemDefinition(2, [DOMAIN])
    bcs = lt.BCDefinition(problem)
    bcs.define_periodic([LEFT], [RIGHT], [W, 0.0, 0.0], dof_inds=[1])
    system = lt.make_algebraic_system(mesh, problem, bcs)
    pairs, _ = match_periodic_nodes(mesh, bcs, max_dofs=2)
    src, dst = pairs[:, 0], pairs[:, 1]
    nd = system.dofmap.node_dof
    assert (nd[src, 1] == nd[dst, 1]).all()
    assert (nd[src, 0] != nd[dst, 0]).all()
