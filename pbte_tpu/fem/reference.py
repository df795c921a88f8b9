"""Reference elements: MFEM-compatible L2 nodal bases.

The reference delegates bases to MFEM's L2_FECollection (default
BasisType::GaussLegendre): Lagrange bases on *open* Gauss-Legendre node sets.
We reproduce the same node placement and DOF ordering so that coefficient-level
golden outputs (output/log/Tc_all.txt, coeff_all.txt) are comparable:

- 1D open nodes: op[0..p] = (p+1)-point Gauss-Legendre nodes on [0, 1].
- triangle (MFEM L2_TriangleElement): for j<=p, i<=p-j:
    w = op[i]+op[j]+op[p-i-j]; node = (op[i]/w, op[j]/w);  j outer, i inner.
- tetrahedron (L2_TetrahedronElement): analogous with 3 indices, k outer.
- quad/hex (L2_Quadrilateral/HexahedronElement): tensor product, x fastest.

Shape functions are evaluated as monomials times an inverse-Vandermonde
coefficient matrix (exactly the legacy Reference Project's approach,
cf. BasisFunctions.hpp LagrangianBasis; numerically identical to MFEM's
orthogonal-basis change-of-basis for the same nodes).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import numpy as np

from pbte_tpu.mesh import core as mesh_core

# Reference-element vertex coordinates (MFEM ordering).
REF_VERTS = {
    mesh_core.GEOM_TRIANGLE: np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
    mesh_core.GEOM_QUAD: np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),
    mesh_core.GEOM_TET: np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    ),
    mesh_core.GEOM_HEX: np.array(
        [
            [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [1.0, 1.0, 0.0], [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0], [1.0, 0.0, 1.0], [1.0, 1.0, 1.0], [0.0, 1.0, 1.0],
        ]
    ),
}


def open_gauss_points(p: int) -> np.ndarray:
    """MFEM poly1d.OpenPoints(p, GaussLegendre): (p+1)-point GL nodes on [0,1]."""
    x, _ = np.polynomial.legendre.leggauss(p + 1)
    return 0.5 * (x + 1.0)


def _simplex_exponents(p: int, dim: int) -> np.ndarray:
    """Graded exponent multi-indices matching MFEM's L2 simplex DOF order."""
    out = []
    if dim == 2:
        for j in range(p + 1):
            for i in range(p + 1 - j):
                out.append((i, j))
    else:
        for k in range(p + 1):
            for j in range(p + 1 - k):
                for i in range(p + 1 - k - j):
                    out.append((i, j, k))
    return np.array(out, dtype=np.int64)


def _tensor_exponents(p: int, dim: int) -> np.ndarray:
    rng = np.arange(p + 1)
    if dim == 2:
        I, J = np.meshgrid(rng, rng, indexing="xy")
        return np.stack([I.reshape(-1), J.reshape(-1)], axis=-1)
    K, J, I = np.meshgrid(rng, rng, rng, indexing="ij")
    return np.stack([I.reshape(-1), J.reshape(-1), K.reshape(-1)], axis=-1)


def nodes(geom: str, p: int) -> np.ndarray:
    """L2 nodal points on the reference element, MFEM DOF order. (D, dim)."""
    op = open_gauss_points(p)
    if geom == mesh_core.GEOM_TRIANGLE:
        pts = []
        for j in range(p + 1):
            for i in range(p + 1 - j):
                w = op[i] + op[j] + op[p - i - j]
                pts.append((op[i] / w, op[j] / w))
        return np.array(pts)
    if geom == mesh_core.GEOM_TET:
        pts = []
        for k in range(p + 1):
            for j in range(p + 1 - k):
                for i in range(p + 1 - k - j):
                    w = op[i] + op[j] + op[k] + op[p - i - j - k]
                    pts.append((op[i] / w, op[j] / w, op[k] / w))
        return np.array(pts)
    if geom == mesh_core.GEOM_QUAD:
        return np.array([(op[i], op[j]) for j in range(p + 1) for i in range(p + 1)])
    if geom == mesh_core.GEOM_HEX:
        return np.array(
            [
                (op[i], op[j], op[k])
                for k in range(p + 1)
                for j in range(p + 1)
                for i in range(p + 1)
            ]
        )
    raise ValueError(f"unsupported geometry: {geom}")


def exponents(geom: str, p: int) -> np.ndarray:
    dim = mesh_core.GEOM_DIM[geom]
    if geom in (mesh_core.GEOM_TRIANGLE, mesh_core.GEOM_TET):
        return _simplex_exponents(p, dim)
    return _tensor_exponents(p, dim)


def monomials(expo: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Evaluate monomials x^a [y^b [z^c]]. pts (..., dim) -> (..., D)."""
    pts = np.asarray(pts, dtype=np.float64)
    out = np.ones(pts.shape[:-1] + (len(expo),))
    for d in range(pts.shape[-1]):
        out = out * pts[..., d:d + 1] ** expo[:, d]
    return out


def monomial_gradients(expo: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """d(monomial)/dr. pts (..., dim) -> (..., D, dim)."""
    pts = np.asarray(pts, dtype=np.float64)
    dim = pts.shape[-1]
    D = len(expo)
    out = np.zeros(pts.shape[:-1] + (D, dim))
    for d in range(dim):
        e = expo.copy()
        coef = e[:, d].astype(np.float64)
        e[:, d] = np.maximum(e[:, d] - 1, 0)
        term = np.ones(pts.shape[:-1] + (D,))
        for dd in range(dim):
            term = term * pts[..., dd:dd + 1] ** e[:, dd]
        out[..., d] = coef * term
    return out


@dataclasses.dataclass(frozen=True)
class Basis:
    """Lagrange basis on an L2 node set: phi_i(x) = sum_k coeff[i,k] m_k(x)."""

    geom: str
    order: int
    nodes: np.ndarray  # (D, dim)
    expo: np.ndarray  # (D, dim)
    coeff: np.ndarray  # (D, D) inverse-Vandermonde transpose

    @property
    def ndof(self) -> int:
        return len(self.nodes)

    def eval(self, pts: np.ndarray) -> np.ndarray:
        """Shape values. pts (..., dim) -> (..., D)."""
        return monomials(self.expo, pts) @ self.coeff.T

    def eval_grad(self, pts: np.ndarray) -> np.ndarray:
        """Reference-coordinate gradients. pts (..., dim) -> (..., D, dim)."""
        dm = monomial_gradients(self.expo, pts)  # (..., D, dim)
        return np.einsum("ik,...kd->...id", self.coeff, dm)


@lru_cache(maxsize=None)
def basis(geom: str, p: int) -> Basis:
    nds = nodes(geom, p)
    expo = exponents(geom, p)
    V = monomials(expo, nds)  # (D, D): V[i,k] = m_k(node_i)
    coeff = np.linalg.inv(V).T  # phi_i(node_j) = delta_ij
    return Basis(geom=geom, order=p, nodes=nds, expo=expo, coeff=coeff)


def vertex_shape(geom: str, pts: np.ndarray) -> np.ndarray:
    """Multilinear geometry shape functions at ref points: (..., n_verts)."""
    pts = np.asarray(pts, dtype=np.float64)
    x = pts[..., 0]
    y = pts[..., 1]
    if geom == mesh_core.GEOM_TRIANGLE:
        return np.stack([1 - x - y, x, y], axis=-1)
    if geom == mesh_core.GEOM_QUAD:
        return np.stack(
            [(1 - x) * (1 - y), x * (1 - y), x * y, (1 - x) * y], axis=-1
        )
    z = pts[..., 2]
    if geom == mesh_core.GEOM_TET:
        return np.stack([1 - x - y - z, x, y, z], axis=-1)
    if geom == mesh_core.GEOM_HEX:
        return np.stack(
            [
                (1 - x) * (1 - y) * (1 - z), x * (1 - y) * (1 - z),
                x * y * (1 - z), (1 - x) * y * (1 - z),
                (1 - x) * (1 - y) * z, x * (1 - y) * z,
                x * y * z, (1 - x) * y * z,
            ],
            axis=-1,
        )
    raise ValueError(f"unsupported geometry: {geom}")


def vertex_shape_grad(geom: str, pts: np.ndarray) -> np.ndarray:
    """d(vertex shape)/dr at ref points: (..., n_verts, dim)."""
    pts = np.asarray(pts, dtype=np.float64)
    shp = pts.shape[:-1]
    if geom == mesh_core.GEOM_TRIANGLE:
        g = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
        return np.broadcast_to(g, shp + g.shape).copy()
    if geom == mesh_core.GEOM_TET:
        g = np.array([[-1.0, -1.0, -1.0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
        return np.broadcast_to(g, shp + g.shape).copy()
    x, y = pts[..., 0], pts[..., 1]
    if geom == mesh_core.GEOM_QUAD:
        out = np.empty(shp + (4, 2))
        out[..., 0, 0] = -(1 - y); out[..., 0, 1] = -(1 - x)
        out[..., 1, 0] = (1 - y);  out[..., 1, 1] = -x
        out[..., 2, 0] = y;        out[..., 2, 1] = x
        out[..., 3, 0] = -y;       out[..., 3, 1] = (1 - x)
        return out
    z = pts[..., 2]
    if geom == mesh_core.GEOM_HEX:
        out = np.empty(shp + (8, 3))
        signs = [
            (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
            (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
        ]
        for vi, (sx, sy, sz) in enumerate(signs):
            fx = x if sx else (1 - x)
            fy = y if sy else (1 - y)
            fz = z if sz else (1 - z)
            dfx = 1.0 if sx else -1.0
            dfy = 1.0 if sy else -1.0
            dfz = 1.0 if sz else -1.0
            out[..., vi, 0] = dfx * fy * fz
            out[..., vi, 1] = fx * dfy * fz
            out[..., vi, 2] = fx * fy * dfz
        return out
    raise ValueError(f"unsupported geometry: {geom}")
