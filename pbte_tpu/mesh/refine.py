"""Uniform mesh refinement (red refinement for all four geometries).

Equivalent of mfem::Mesh::UniformRefinement as driven by the reference CLI's
`-r` flag (ref: src/SpatialMesh.cpp:83-103). Vertex/element ordering follows
MFEM's layout so that sweep-order golden logs for refined meshes are
reproducible:

- new vertices appended after the originals: edge midpoints in edge-id order,
  then face centers (quad interiors / 3D faces), then cell centers,
- children of parent i are stored consecutively at positions
  nchild*i + c; for triangles the child order is
  [corner@v0, center, corner@v1, corner@v2] — this exact layout was
  reverse-engineered from the committed 8-element sweep-order golden
  (output/log/sweep_dim3_*.txt): it is the unique labeling of the red-refined
  triangles that reproduces all 576 greedy orders.

Edge/face ids are first-seen over elements in order with MFEM's local
edge/face ordering (core.LOCAL_EDGES / core.LOCAL_FACES).
"""

from __future__ import annotations

import numpy as np

from pbte_tpu.mesh import core


def _build_entity_table(elem_verts: np.ndarray, local_entities) -> tuple[dict, list]:
    index: dict = {}
    ordered: list = []
    for ev in elem_verts:
        for loc in local_entities:
            verts = tuple(int(ev[i]) for i in loc)
            key = tuple(sorted(verts))
            if key not in index:
                index[key] = len(ordered)
                ordered.append(verts)
    return index, ordered


def uniform_refine(mesh: core.MeshData, levels: int = 1) -> core.MeshData:
    for _ in range(max(0, levels)):
        mesh = _refine_once(mesh)
    return mesh


def _refine_once(mesh: core.MeshData) -> core.MeshData:
    geom = mesh.geom
    if geom == core.GEOM_MIXED:
        return _refine_once_mixed(mesh)
    ev = mesh.elem_verts
    ne = mesh.num_elements
    nv = mesh.num_vertices
    verts = mesh.vertices

    edge_index, edges = _build_entity_table(ev, core.LOCAL_EDGES[geom])
    nedges = len(edges)
    new_coords = [verts[list(e)].mean(axis=0) for e in edges]
    oedge = nv

    def emid(a: int, b: int) -> int:
        return oedge + edge_index[tuple(sorted((int(a), int(b))))]

    face_index: dict = {}
    ofa = oedge + nedges
    if geom == core.GEOM_HEX:
        face_index, faces = _build_entity_table(ev, core.LOCAL_FACES[geom])
        new_coords += [verts[list(f)].mean(axis=0) for f in faces]
        ocell = ofa + len(faces)
    elif geom == core.GEOM_QUAD:
        ocell = ofa  # per-element centers only
    else:
        ocell = ofa

    def fctr(quad_verts) -> int:
        return ofa + face_index[tuple(sorted(int(v) for v in quad_verts))]

    children = [[] for _ in range(ne)]  # nchild consecutive children per parent

    if geom == core.GEOM_TRIANGLE:
        for e in range(ne):
            v0, v1, v2 = (int(x) for x in ev[e])
            m0, m1, m2 = emid(v0, v1), emid(v1, v2), emid(v2, v0)
            # MFEM order: corner@v0, center, corner@v1, corner@v2
            children[e] = [[v0, m0, m2], [m0, m1, m2], [m0, v1, m1], [m2, m1, v2]]
    elif geom == core.GEOM_QUAD:
        for e in range(ne):
            v0, v1, v2, v3 = (int(x) for x in ev[e])
            m0, m1, m2, m3 = emid(v0, v1), emid(v1, v2), emid(v2, v3), emid(v3, v0)
            c = ocell + e
            children[e] = [
                [v0, m0, c, m3], [m0, v1, m1, c], [c, m1, v2, m2], [m3, c, m2, v3],
            ]
        new_coords += [verts[list(ev[e])].mean(axis=0) for e in range(ne)]
    elif geom == core.GEOM_TET:
        for e in range(ne):
            v0, v1, v2, v3 = (int(x) for x in ev[e])
            m01, m02, m03 = emid(v0, v1), emid(v0, v2), emid(v0, v3)
            m12, m13, m23 = emid(v1, v2), emid(v1, v3), emid(v2, v3)
            # corners then Bey's octahedron split along the m02-m13 diagonal
            children[e] = [
                [v0, m01, m02, m03],
                [m01, v1, m12, m13],
                [m02, m12, v2, m23],
                [m03, m13, m23, v3],
                [m01, m02, m03, m13],
                [m01, m02, m12, m13],
                [m02, m03, m13, m23],
                [m02, m12, m13, m23],
            ]
    elif geom == core.GEOM_HEX:
        local_faces = core.LOCAL_FACES[geom]
        # lattice coords (units of 1/2) for the 8 MFEM hex corners
        corner_xyz = [
            (0, 0, 0), (2, 0, 0), (2, 2, 0), (0, 2, 0),
            (0, 0, 2), (2, 0, 2), (2, 2, 2), (0, 2, 2),
        ]
        child_pattern = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                         (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
        for e in range(ne):
            c = [int(x) for x in ev[e]]
            lattice: dict = {}
            for li, xyz in enumerate(corner_xyz):
                lattice[xyz] = c[li]
            for (a, b) in core.LOCAL_EDGES[geom]:
                xyz = tuple((corner_xyz[a][d] + corner_xyz[b][d]) // 2 for d in range(3))
                lattice[xyz] = emid(c[a], c[b])
            for loc in local_faces:
                xyz = tuple(sum(corner_xyz[i][d] for i in loc) // 4 for d in range(3))
                lattice[xyz] = fctr([c[i] for i in loc])
            lattice[(1, 1, 1)] = ocell + e
            kids = []
            for (ox, oy, oz) in child_pattern:
                kid = [
                    lattice[(ox + dx, oy + dy, oz + dz)]
                    for (dx, dy, dz) in child_pattern
                ]
                kids.append(kid)
            children[e] = kids
        new_coords += [verts[list(ev[e])].mean(axis=0) for e in range(ne)]
    else:
        raise ValueError(f"unsupported geometry: {geom}")

    new_elems = []
    new_attrs = []
    for e in range(ne):
        new_elems.extend(children[e])
        new_attrs.extend([int(mesh.elem_attr[e])] * len(children[e]))

    # Boundary elements split with the same midpoint ids.
    new_bdry, new_battr = [], []
    for bv, attr in zip(mesh.bdry_verts, mesh.bdry_attr):
        b = [int(x) for x in bv]
        a = int(attr)
        if len(b) == 2:
            m = emid(b[0], b[1])
            new_bdry += [[b[0], m], [m, b[1]]]
            new_battr += [a, a]
        elif len(b) == 3:
            m01, m12, m20 = emid(b[0], b[1]), emid(b[1], b[2]), emid(b[2], b[0])
            new_bdry += [
                [b[0], m01, m20], [m01, b[1], m12], [m20, m12, b[2]], [m01, m12, m20],
            ]
            new_battr += [a] * 4
        elif len(b) == 4:
            m0, m1 = emid(b[0], b[1]), emid(b[1], b[2])
            m2, m3 = emid(b[2], b[3]), emid(b[3], b[0])
            c = fctr(b)
            new_bdry += [
                [b[0], m0, c, m3], [m0, b[1], m1, c], [c, m1, b[2], m2], [m3, c, m2, b[3]],
            ]
            new_battr += [a] * 4
        else:
            raise ValueError("unsupported boundary element arity")

    return core.MeshData(
        dim=mesh.dim,
        geom=geom,
        vertices=np.vstack([verts, np.asarray(new_coords)]) if new_coords else verts.copy(),
        elem_verts=np.asarray(new_elems, dtype=np.int32),
        elem_attr=np.asarray(new_attrs, dtype=np.int32),
        bdry_verts=(
            np.asarray(new_bdry, dtype=np.int32).reshape(len(new_bdry), -1)
            if new_bdry
            else mesh.bdry_verts[:0].copy()
        ),
        bdry_attr=np.asarray(new_battr, dtype=np.int32),
        source=mesh.source,
    )


def _refine_once_mixed(mesh: core.MeshData) -> core.MeshData:
    """Red refinement of a 2D mixed triangle+quad mesh: tri -> 4 tris,
    quad -> 4 quads. Edge midpoints are shared through the global
    sorted-vertex-pair table, so the tri/quad interface stays conforming.
    Vertex layout follows the single-geometry convention: originals, then
    edge midpoints (first-seen over each element's OWN local edges), then
    quad centers in element order."""
    ev = mesh.elem_verts
    ne = mesh.num_elements
    nv = mesh.num_vertices
    verts = mesh.vertices
    egeom = mesh.elem_geom
    tri_code = core.MFEM_CODE_OF_GEOM[core.GEOM_TRIANGLE]
    quad_code = core.MFEM_CODE_OF_GEOM[core.GEOM_QUAD]

    index: dict = {}
    ordered: list = []
    for e in range(ne):
        g = core.GEOM_TRIANGLE if egeom[e] == tri_code else core.GEOM_QUAD
        for loc in core.LOCAL_EDGES[g]:
            vv = tuple(int(ev[e][i]) for i in loc)
            key = tuple(sorted(vv))
            if key not in index:
                index[key] = len(ordered)
                ordered.append(vv)
    new_coords = [verts[list(p)].mean(axis=0) for p in ordered]
    oedge = nv

    def emid(a: int, b: int) -> int:
        return oedge + index[tuple(sorted((int(a), int(b))))]

    ofa = oedge + len(ordered)
    quad_ids = [e for e in range(ne) if egeom[e] == quad_code]
    center_of = {e: ofa + i for i, e in enumerate(quad_ids)}
    new_coords += [
        verts[[int(x) for x in ev[e][:4]]].mean(axis=0) for e in quad_ids
    ]

    new_elems, new_geoms, new_attrs = [], [], []
    for e in range(ne):
        a = int(mesh.elem_attr[e])
        if egeom[e] == tri_code:
            v0, v1, v2 = (int(x) for x in ev[e][:3])
            m0, m1, m2 = emid(v0, v1), emid(v1, v2), emid(v2, v0)
            kids = [
                [v0, m0, m2, -1], [m0, m1, m2, -1],
                [m0, v1, m1, -1], [m2, m1, v2, -1],
            ]
            gcode = tri_code
        else:
            v0, v1, v2, v3 = (int(x) for x in ev[e][:4])
            m0, m1 = emid(v0, v1), emid(v1, v2)
            m2, m3 = emid(v2, v3), emid(v3, v0)
            c = center_of[e]
            kids = [
                [v0, m0, c, m3], [m0, v1, m1, c],
                [c, m1, v2, m2], [m3, c, m2, v3],
            ]
            gcode = quad_code
        new_elems.extend(kids)
        new_geoms.extend([gcode] * 4)
        new_attrs.extend([a] * 4)

    new_bdry, new_battr = [], []
    for bv, attr in zip(mesh.bdry_verts, mesh.bdry_attr):
        b0, b1 = int(bv[0]), int(bv[1])
        m = emid(b0, b1)
        new_bdry += [[b0, m], [m, b1]]
        new_battr += [int(attr), int(attr)]

    return core.MeshData(
        dim=2,
        geom=core.GEOM_MIXED,
        vertices=np.vstack([verts, np.asarray(new_coords)]),
        elem_verts=np.asarray(new_elems, dtype=np.int32),
        elem_attr=np.asarray(new_attrs, dtype=np.int32),
        bdry_verts=np.asarray(new_bdry, dtype=np.int32).reshape(-1, 2),
        bdry_attr=np.asarray(new_battr, dtype=np.int32),
        source=mesh.source,
        elem_geom=np.asarray(new_geoms, dtype=np.int32),
    )
