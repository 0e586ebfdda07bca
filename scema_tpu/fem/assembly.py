"""Matrix-free explicit-dynamics FE kernels.

The reference assembles a PETSc system ``M dv = dt * (f_ext - f_int)`` with a
*lumped* (diagonal) mass matrix (FE_problem.h:732-878; lumping trick at
:776-800) and solves it with CG+Jacobi (:882-914) — which for a diagonal
matrix is an elementwise division.  Here the whole solve is three fused
device ops: gather (cell dofs) -> per-cell einsum -> segment-sum scatter.

Key identity used for the internal force: for a symmetric stress tensor,
``sigma : eps(phi_v e_a) = (sigma . grad phi_v)_a``, so the reference's
per-dof ``new_stress * get_strain(fe_values, i, q)`` (FE_problem.h:817-827)
becomes a single einsum over quadrature points.

Mass lumping: the reference accumulates ``sum_j rho phi_i phi_j JxW`` into
the diagonal; by the partition of unity ``sum_j phi_j = 1`` this equals
``sum_q rho phi_i JxW`` (row-sum lumping), computed directly here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import tensors as T
from .shapes import FEGeometry

GRAVITY = 9.81  # m/s^2 — BodyForce magnitude (FE.h:143-147), applied along -z


def gather_cell_dofs(geom: FEGeometry, nodal: jax.Array) -> jax.Array:
    """(n_dofs,) -> (n_cells, 8, 3) per-cell nodal values."""
    return nodal.reshape(geom.n_nodes, 3)[geom.cells]


def scatter_add_cell_dofs(geom: FEGeometry, cell_vals: jax.Array) -> jax.Array:
    """(n_cells, 8, 3) -> (n_dofs,) via segment-sum over node ids."""
    flat = cell_vals.reshape(-1, 3)
    out = jax.ops.segment_sum(flat, geom.cells.reshape(-1), num_segments=geom.n_nodes)
    return out.reshape(-1)


def qp_gradients(geom: FEGeometry, nodal: jax.Array) -> jax.Array:
    """Displacement gradient d u_i / d x_j at every qp.

    Returns (n_cells, n_qp, 3, 3).  Replaces FEValues::get_function_gradients
    (FE_problem.h:1080-1082).
    """
    cell_u = gather_cell_dofs(geom, nodal)  # (c, 8, 3)
    return jnp.einsum("cvi,cqvj->cqij", cell_u, geom.grads)


def qp_strains(geom: FEGeometry, nodal: jax.Array) -> jax.Array:
    """Voigt strain at every qp, flattened to (n_qp_total, 6)."""
    grad = qp_gradients(geom, nodal)
    eps = T.strain_from_grad(grad)
    return T.sym_to_voigt(eps).reshape(geom.n_qp_total, 6)


def lumped_mass_diag(geom: FEGeometry, rho_qp: jax.Array) -> jax.Array:
    """Diagonal mass (n_dofs,), identical for the 3 components of a node.

    reference: FE_problem.h:776-800.
    """
    rho = rho_qp.reshape(geom.n_cells, geom.n_qp_per_cell)
    contrib = jnp.einsum("cq,qv,cq->cv", rho, geom.shapes, geom.jxw)
    m_node = jax.ops.segment_sum(
        contrib.reshape(-1), geom.cells.reshape(-1), num_segments=geom.n_nodes
    )
    return jnp.repeat(m_node, 3)


def internal_force(geom: FEGeometry, stress_voigt: jax.Array) -> jax.Array:
    """f_int (n_dofs,) = sum_q sigma : eps(phi) JxW  (FE_problem.h:817-827)."""
    sig = T.voigt_to_sym(stress_voigt.reshape(geom.n_cells, geom.n_qp_per_cell, 6))
    cell_f = jnp.einsum("cqij,cqvj,cq->cvi", sig, geom.grads, geom.jxw)
    return scatter_add_cell_dofs(geom, cell_f)


def external_force(geom: FEGeometry, rho_qp: jax.Array) -> jax.Array:
    """Gravity body force f_ext (n_dofs,)  (FE_problem.h:802-816)."""
    rho = rho_qp.reshape(geom.n_cells, geom.n_qp_per_cell)
    contrib = jnp.einsum("cq,qv,cq->cv", rho, geom.shapes, geom.jxw)  # (c, v)
    f_node = jax.ops.segment_sum(
        contrib.reshape(-1), geom.cells.reshape(-1), num_segments=geom.n_nodes
    )
    f = jnp.zeros((geom.n_nodes, 3), dtype=rho_qp.dtype)
    f = f.at[:, 2].set(-GRAVITY * f_node)
    return f.reshape(-1)


def assemble_rhs(
    geom: FEGeometry,
    stress_voigt: jax.Array,
    rho_qp: jax.Array,
    dt: float,
    constrained: jax.Array,
) -> jax.Array:
    """rhs = dt * (f_ext - f_int) with constrained rows zeroed.

    Matches assemble_system's rhs (FE_problem.h:802-878) followed by
    apply_boundary_values with zero values (:862-871).
    """
    rhs = dt * (external_force(geom, rho_qp) - internal_force(geom, stress_voigt))
    return jnp.where(constrained, 0.0, rhs)


def solve_explicit(rhs: jax.Array, mass_diag: jax.Array, constrained: jax.Array) -> jax.Array:
    """Diagonal solve M dv = rhs (the reference's CG, FE_problem.h:882-914)."""
    dv = rhs / mass_diag
    return jnp.where(constrained, 0.0, dv)


def reaction_force(
    geom: FEGeometry,
    stress_voigt: jax.Array,
    rho_qp: jax.Array,
    loaded_mask: jax.Array,
) -> jax.Array:
    """Sum of nodal internal-minus-external force over loaded dofs.

    reference: compute_internal_forces + output_lbc_force
    (FE_problem.h:1801-1858, 1941-1980).
    """
    f = internal_force(geom, stress_voigt) - external_force(geom, rho_qp)
    return jnp.sum(jnp.where(loaded_mask, f, 0.0))
