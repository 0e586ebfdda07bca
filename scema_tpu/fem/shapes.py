"""Q1 trilinear shape functions, Gauss quadrature, and geometry precompute.

The macroscale solver is matrix-free: everything the per-cell loops of the
reference's assembly (FE_problem.h:732-878) need from deal.II's ``FEValues``
is precomputed once here as dense device arrays:

* ``grads``  (n_cells, n_qp, 8, 3): real-space shape-function gradients,
* ``shapes`` (n_qp, 8):             reference-cell shape values,
* ``jxw``    (n_cells, n_qp):       det(J) * quadrature weight.

Reference element is the unit cube [0,1]^3 with vertex ``v`` at the bit
pattern ``(v&1, (v>>1)&1, (v>>2)&1)`` — matching fem/mesh.py cell ordering.
Quadrature is tensor-product Gauss-Legendre, x-index fastest, matching
deal.II QGauss so the reference's ``qp_id = cell*n_qp + q`` enumerates the
same physical points (FE_problem.h:485).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


def gauss_1d(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre points/weights on [0,1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def tensor_quadrature(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(n^3, 3) points and (n^3,) weights on the unit cube, x fastest."""
    x, w = gauss_1d(n)
    pts = np.array([[xi, yi, zi] for zi in x for yi in x for xi in x])
    wts = np.array([wz * wy * wx for wz in w for wy in w for wx in w])
    return pts, wts


def q1_shape_values(pts: np.ndarray) -> np.ndarray:
    """(n_q, 8) trilinear shape values at reference points."""
    n_q = pts.shape[0]
    vals = np.empty((n_q, 8))
    for v in range(8):
        bits = np.array([(v >> d) & 1 for d in range(3)], dtype=float)
        comp = np.where(bits[None, :] > 0.5, pts, 1.0 - pts)
        vals[:, v] = comp.prod(axis=1)
    return vals


def q1_shape_grads(pts: np.ndarray) -> np.ndarray:
    """(n_q, 8, 3) reference-space gradients of the trilinear shapes."""
    n_q = pts.shape[0]
    grads = np.empty((n_q, 8, 3))
    for v in range(8):
        bits = np.array([(v >> d) & 1 for d in range(3)], dtype=float)
        comp = np.where(bits[None, :] > 0.5, pts, 1.0 - pts)  # (n_q, 3)
        dcomp = np.where(bits[None, :] > 0.5, 1.0, -1.0) * np.ones_like(pts)
        for d in range(3):
            others = [o for o in range(3) if o != d]
            grads[:, v, d] = dcomp[:, d] * comp[:, others[0]] * comp[:, others[1]]
    return grads


@dataclass(frozen=True)
class FEGeometry:
    """Precomputed per-cell FE data (device arrays)."""

    grads: jnp.ndarray  # (n_cells, n_qp, 8, 3) real-space shape grads
    shapes: jnp.ndarray  # (n_qp, 8)
    jxw: jnp.ndarray  # (n_cells, n_qp)
    qpoints: jnp.ndarray  # (n_cells, n_qp, 3) physical quadrature points
    cells: jnp.ndarray  # (n_cells, 8) int32
    n_nodes: int

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def n_qp_per_cell(self) -> int:
        return self.shapes.shape[0]

    @property
    def n_qp_total(self) -> int:
        return self.n_cells * self.n_qp_per_cell


def precompute_geometry(nodes, cells, n_gauss: int, dtype=jnp.float64) -> FEGeometry:
    """Map reference-cell quantities to every (possibly distorted) hex."""
    pts, wts = tensor_quadrature(n_gauss)
    shp = q1_shape_values(pts)  # (n_qp, 8)
    gref = q1_shape_grads(pts)  # (n_qp, 8, 3)

    nodes = np.asarray(nodes)
    cells = np.asarray(cells)
    cell_xyz = nodes[cells]  # (n_cells, 8, 3)

    # Jacobian J[a][b] = d x_a / d xi_b = sum_v x_v[a] * dN_v/dxi_b
    jac = np.einsum("cva,qvb->cqab", cell_xyz, gref)
    det = np.linalg.det(jac)
    inv = np.linalg.inv(jac)
    # real grad[v][a] = sum_b inv[b][a] * gref[v][b]  (J^{-T} grad_ref)
    grads = np.einsum("cqba,qvb->cqva", inv, gref)
    jxw = det * wts[None, :]
    qpoints = np.einsum("qv,cva->cqa", shp, cell_xyz)

    return FEGeometry(
        grads=jnp.asarray(grads, dtype=dtype),
        shapes=jnp.asarray(shp, dtype=dtype),
        jxw=jnp.asarray(jxw, dtype=dtype),
        qpoints=jnp.asarray(qpoints, dtype=dtype),
        cells=jnp.asarray(cells, dtype=jnp.int32),
        n_nodes=int(nodes.shape[0]),
    )
