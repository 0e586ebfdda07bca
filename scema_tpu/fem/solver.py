"""Matrix-free linear solvers for the velocity update.

The reference assembles the mass matrix in PETSc and offers CG / GMRES /
BiCGStab / MUMPS (FE_problem.h:882-1017), but the matrix is *lumped*
(diagonal), so its CG converges trivially; assembly.solve_explicit is the
exact equivalent.  For the consistent-mass variant (the reference's
commented-out ``cell_mass(i,j)`` path, FE_problem.h:797) this module
provides a matrix-free CG on the per-cell mass operator with Jacobi
preconditioning — same semantics as PETSc CG + PreconditionJacobi.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .shapes import FEGeometry
from . import assembly


def consistent_cell_mass(geom: FEGeometry, rho_qp: jax.Array) -> jax.Array:
    """(n_cells, 8, 8) consistent mass blocks: M_ij = sum_q rho phi_i phi_j JxW."""
    rho = rho_qp.reshape(geom.n_cells, geom.n_qp_per_cell)
    return jnp.einsum("cq,qi,qj,cq->cij", rho, geom.shapes, geom.shapes, geom.jxw)


def consistent_mass_matvec(geom: FEGeometry, cell_mass: jax.Array, v: jax.Array) -> jax.Array:
    """y = M v, matrix-free (gather -> block product -> scatter)."""
    vc = assembly.gather_cell_dofs(geom, v)  # (c, 8, 3)
    yc = jnp.einsum("cij,cjd->cid", cell_mass, vc)
    return assembly.scatter_add_cell_dofs(geom, yc)


def cg_solve(
    matvec,
    b: jax.Array,
    diag: jax.Array,
    constrained: jax.Array,
    tol: float = 1.0e-10,
    maxiter: int = 200,
) -> jax.Array:
    """Jacobi-preconditioned CG with constrained dofs pinned to zero.

    Equivalent to apply_boundary_values + PETSc CG (FE_problem.h:862-914):
    constrained rows/columns behave as identity equations with zero rhs.
    """

    def op(x):
        x = jnp.where(constrained, 0.0, x)
        y = matvec(x)
        return jnp.where(constrained, x, y)

    b = jnp.where(constrained, 0.0, b)
    minv = jnp.where(constrained, 1.0, 1.0 / diag)

    x, _ = jax.scipy.sparse.linalg.cg(
        op, b, M=lambda r: minv * r, tol=tol, maxiter=maxiter
    )
    return jnp.where(constrained, 0.0, x)


def gmres_solve(
    matvec,
    b: jax.Array,
    diag: jax.Array,
    constrained: jax.Array,
    tol: float = 1.0e-10,
    maxiter: int = 200,
    restart: int = 30,
) -> jax.Array:
    """Jacobi-preconditioned GMRES — the reference's
    ``solve_linear_problem_GMRES`` (FE_problem.h:918-950), matrix-free."""

    def op(x):
        x = jnp.where(constrained, 0.0, x)
        y = matvec(x)
        return jnp.where(constrained, x, y)

    b = jnp.where(constrained, 0.0, b)
    minv = jnp.where(constrained, 1.0, 1.0 / diag)
    x, _ = jax.scipy.sparse.linalg.gmres(
        op, b, M=lambda r: minv * r, tol=tol, maxiter=maxiter,
        restart=restart,
    )
    return jnp.where(constrained, 0.0, x)


def bicgstab_solve(
    matvec,
    b: jax.Array,
    diag: jax.Array,
    constrained: jax.Array,
    tol: float = 1.0e-10,
    maxiter: int = 200,
) -> jax.Array:
    """Jacobi-preconditioned BiCGStab — the reference's
    ``solve_linear_problem_BiCGStab`` (FE_problem.h:954-991; its BoomerAMG
    preconditioner becomes Jacobi here — the operator is an SPD mass
    matrix, where Jacobi is the appropriate lightweight choice)."""

    def op(x):
        x = jnp.where(constrained, 0.0, x)
        y = matvec(x)
        return jnp.where(constrained, x, y)

    b = jnp.where(constrained, 0.0, b)
    minv = jnp.where(constrained, 1.0, 1.0 / diag)
    x, _ = jax.scipy.sparse.linalg.bicgstab(
        op, b, M=lambda r: minv * r, tol=tol, maxiter=maxiter
    )
    return jnp.where(constrained, 0.0, x)


def direct_solve(
    matvec,
    n_dofs: int,
    b: jax.Array,
    constrained: jax.Array,
) -> jax.Array:
    """Dense direct solve — the reference's MUMPS path
    (``solve_linear_problem_direct``, FE_problem.h:995-1017).  The
    matrix-free operator is materialized column-by-column and factorized
    with LU; only sensible for small meshes (as is MUMPS on one rank)."""
    eye = jnp.eye(n_dofs, dtype=b.dtype)

    def op(x):
        x = jnp.where(constrained, 0.0, x)
        y = matvec(x)
        return jnp.where(constrained, x, y)

    A = jax.vmap(op, in_axes=1, out_axes=1)(eye)
    # constrained columns are zero under op (input entries are masked);
    # make those equations x_i = 0 explicitly or A is singular
    A = A + jnp.diag(constrained.astype(b.dtype))
    b = jnp.where(constrained, 0.0, b)
    x = jax.scipy.linalg.solve(A, b)
    return jnp.where(constrained, 0.0, x)
