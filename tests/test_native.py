"""Native C++ sweep kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from pbte_tpu import mesh as pmesh, native
from pbte_tpu.angular import quadrature as ang
from pbte_tpu.sweep import planner


@pytest.fixture(scope="module")
def problem():
    m = pmesh.make_cartesian_2d(6, 5, pmesh.GEOM_TRIANGLE)
    topo = pmesh.connect(m)
    quad = ang.build(ang.AngularOptions(dimension=2, azimuth_points=16))
    return topo, quad


def _numpy_levels(neighbor, normals, dirs):
    """The pure-numpy fixpoint (the planner's fallback path, inlined here so
    the comparison does not depend on which backend the planner picked)."""
    K = dirs.shape[0]
    ne, nf = neighbor.shape
    inflow = planner.upwind_inflow(neighbor, normals, dirs)
    nbr_safe = np.where(neighbor >= 0, neighbor, 0)
    level = np.zeros((K, ne), dtype=np.int64)
    for _ in range(ne + 1):
        cand = np.where(inflow, level[:, nbr_safe] + 1, 0)
        new = cand.max(axis=-1)
        if np.array_equal(new, level):
            return level.astype(np.int32)
        level = new
    raise RuntimeError("cycle")


def test_native_builds():
    assert native.get_lib() is not None, "native sweep library failed to build"


def test_native_levels_match_numpy(problem):
    topo, quad = problem
    got = native.compute_levels(topo.elem_neighbor, topo.normals, quad.directions)
    want = _numpy_levels(topo.elem_neighbor, topo.normals, quad.directions)
    np.testing.assert_array_equal(got, want)


def test_native_greedy_matches_semantics(problem):
    topo, quad = problem
    got = native.greedy_orders(topo.elem_neighbor, topo.normals, quad.directions)
    # validity: each element appears once, upwind deps before it
    inflow = planner.upwind_inflow(topo.elem_neighbor, topo.normals, quad.directions)
    ne = topo.mesh.num_elements
    for k in range(quad.num_directions):
        order = got[k]
        assert sorted(order) == list(range(ne))
        position = np.empty(ne, dtype=int)
        position[order] = np.arange(ne)
        for e in range(ne):
            for f in range(topo.faces_per_elem):
                if inflow[k, e, f]:
                    assert position[topo.elem_neighbor[e, f]] < position[e]


def test_native_signatures_match_packbits(problem):
    topo, quad = problem
    got = native.inflow_signatures(topo.elem_neighbor, topo.normals, quad.directions)
    inflow = planner.upwind_inflow(topo.elem_neighbor, topo.normals, quad.directions)
    want = np.packbits(inflow.reshape(quad.num_directions, -1), axis=1)
    np.testing.assert_array_equal(got, want)


def test_native_cycle_detection():
    neighbor = np.array([[1, -1], [2, -1], [0, -1]], dtype=np.int32)
    normals = np.tile(np.array([[[-1.0, 0.0]]]), (3, 2, 1))
    dirs = np.array([[1.0, 0.0, 0.0]])
    with pytest.raises(ValueError):
        native.compute_levels(neighbor, normals, dirs)
    with pytest.raises(ValueError):
        native.greedy_orders(neighbor, normals, dirs)
