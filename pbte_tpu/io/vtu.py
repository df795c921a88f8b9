"""ParaView VTU output for DG fields.

Replaces MacroscopicQuantities::WriteParaView (ref:
src/MacroscopicQuantities.cpp:168-271). Each element is written as its own
disconnected cell (vertex copies per element) so the discontinuous L2 field is
rendered faithfully; point values are the DG field evaluated at the element's
vertices.
"""

from __future__ import annotations

import os

import numpy as np

from pbte_tpu.fem import reference as fref
from pbte_tpu.mesh import core as mesh_core

_VTK_CELL = {
    mesh_core.GEOM_TRIANGLE: 5,
    mesh_core.GEOM_QUAD: 9,
    mesh_core.GEOM_TET: 10,
    mesh_core.GEOM_HEX: 12,
}


def write_vtu(mesh, order, scalar_fields=None, vector_fields=None, prefix="fields"):
    """scalar_fields: {name: (ne, D) coeffs}; vector_fields: {name: (dim, ne, D)}.

    Writes `{prefix}.vtu` (XML, appended ascii) and returns its path."""
    scalar_fields = scalar_fields or {}
    vector_fields = vector_fields or {}
    ne = mesh.num_elements
    nv_e = mesh.elem_verts.shape[1]
    dim = mesh.dim

    b = fref.basis(mesh.geom, order)
    # basis values at the reference-element vertices
    vert_shape = b.eval(fref.REF_VERTS[mesh.geom])  # (nv_e, D)

    pts = mesh.vertices[mesh.elem_verts].reshape(ne * nv_e, dim)
    if dim == 2:
        pts = np.hstack([pts, np.zeros((len(pts), 1))])

    conn = np.arange(ne * nv_e)
    offsets = (np.arange(ne) + 1) * nv_e
    ctype = np.full(ne, _VTK_CELL[mesh.geom])

    def eval_at_verts(coeffs):
        return np.einsum("ei,vi->ev", np.asarray(coeffs), vert_shape).reshape(-1)

    path = prefix + ".vtu"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?>\n')
        f.write('<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n')
        f.write("  <UnstructuredGrid>\n")
        f.write(f'    <Piece NumberOfPoints="{ne * nv_e}" NumberOfCells="{ne}">\n')
        f.write("      <Points>\n")
        f.write('        <DataArray type="Float64" NumberOfComponents="3" '
                'format="ascii">\n')
        for p in pts:
            f.write(f"          {p[0]:.16g} {p[1]:.16g} {p[2]:.16g}\n")
        f.write("        </DataArray>\n      </Points>\n")
        f.write("      <Cells>\n")
        f.write('        <DataArray type="Int64" Name="connectivity" format="ascii">\n')
        f.write("          " + " ".join(map(str, conn)) + "\n")
        f.write("        </DataArray>\n")
        f.write('        <DataArray type="Int64" Name="offsets" format="ascii">\n')
        f.write("          " + " ".join(map(str, offsets)) + "\n")
        f.write("        </DataArray>\n")
        f.write('        <DataArray type="UInt8" Name="types" format="ascii">\n')
        f.write("          " + " ".join(map(str, ctype)) + "\n")
        f.write("        </DataArray>\n      </Cells>\n")
        f.write("      <PointData>\n")
        for name, coeffs in scalar_fields.items():
            vals = eval_at_verts(coeffs)
            f.write(f'        <DataArray type="Float64" Name="{name}" format="ascii">\n')
            f.write("          " + " ".join(f"{v:.16g}" for v in vals) + "\n")
            f.write("        </DataArray>\n")
        for name, comp in vector_fields.items():
            comp = np.asarray(comp)  # (dim, ne, D)
            vecs = np.stack([eval_at_verts(comp[d]) for d in range(comp.shape[0])], -1)
            if vecs.shape[-1] == 2:
                vecs = np.hstack([vecs, np.zeros((len(vecs), 1))])
            f.write(f'        <DataArray type="Float64" Name="{name}" '
                    'NumberOfComponents="3" format="ascii">\n')
            for v in vecs:
                f.write(f"          {v[0]:.16g} {v[1]:.16g} {v[2]:.16g}\n")
            f.write("        </DataArray>\n")
        f.write("      </PointData>\n")
        f.write("    </Piece>\n  </UnstructuredGrid>\n</VTKFile>\n")
    return path
