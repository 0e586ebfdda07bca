"""Matrix-free consistent-mass CG solver."""
import numpy as np
import jax.numpy as jnp

from scema_tpu.fem import mesh as M
from scema_tpu.fem import shapes as S
from scema_tpu.fem import assembly as A
from scema_tpu.fem import solver as SOL


def test_consistent_mass_row_sums_equal_lumped():
    """Row sums of the consistent mass = the lumped diagonal (partition of
    unity), and total mass is exact."""
    m = M.build_cuboid(1.0, 1.0, 1.0, 2, 2, 2)
    g = S.precompute_geometry(m.nodes, m.cells, 2)
    rho = jnp.full((g.n_qp_total,), 950.0)
    cm = SOL.consistent_cell_mass(g, rho)
    ones = jnp.ones((g.n_nodes * 3,))
    row_sums = np.asarray(SOL.consistent_mass_matvec(g, cm, ones))
    lumped = np.asarray(A.lumped_mass_diag(g, rho))
    assert np.allclose(row_sums, lumped, rtol=1e-12)
    assert np.isclose(row_sums.reshape(-1, 3)[:, 0].sum(), 950.0, rtol=1e-12)


def test_cg_solves_consistent_system():
    m = M.build_cuboid(1.0, 1.0, 1.5, 2, 2, 3)
    g = S.precompute_geometry(m.nodes, m.cells, 2)
    rho = jnp.full((g.n_qp_total,), 1200.0)
    cm = SOL.consistent_cell_mass(g, rho)
    diag = A.lumped_mass_diag(g, rho)
    n_dofs = g.n_nodes * 3
    rng = np.random.default_rng(0)
    constrained = jnp.asarray(rng.random(n_dofs) < 0.1)
    x_true = jnp.asarray(rng.standard_normal(n_dofs))
    x_true = jnp.where(constrained, 0.0, x_true)
    b = SOL.consistent_mass_matvec(g, cm, x_true)
    b = jnp.where(constrained, 0.0, b)
    x = SOL.cg_solve(
        lambda v: SOL.consistent_mass_matvec(g, cm, v), b, diag, constrained,
        tol=1e-12, maxiter=500,
    )
    assert np.allclose(np.asarray(x), np.asarray(x_true), atol=1e-7)


def _consistent_system(seed=1):
    m = M.build_cuboid(1.0, 1.0, 1.5, 2, 2, 3)
    g = S.precompute_geometry(m.nodes, m.cells, 2)
    rho = jnp.full((g.n_qp_total,), 1200.0)
    cm = SOL.consistent_cell_mass(g, rho)
    diag = A.lumped_mass_diag(g, rho)
    n_dofs = g.n_nodes * 3
    rng = np.random.default_rng(seed)
    constrained = jnp.asarray(rng.random(n_dofs) < 0.1)
    x_true = jnp.where(constrained, 0.0,
                       jnp.asarray(rng.standard_normal(n_dofs)))
    mv = lambda v: SOL.consistent_mass_matvec(g, cm, v)
    b = jnp.where(constrained, 0.0, mv(x_true))
    return mv, b, diag, constrained, x_true, n_dofs


def test_gmres_bicgstab_direct_solve_consistent_system():
    """The reference's GMRES / BiCGStab / MUMPS solver variants
    (FE_problem.h:918-1017), matrix-free."""
    mv, b, diag, constrained, x_true, n_dofs = _consistent_system()
    for solve in (
        lambda: SOL.gmres_solve(mv, b, diag, constrained, tol=1e-12,
                                maxiter=500),
        lambda: SOL.bicgstab_solve(mv, b, diag, constrained, tol=1e-12,
                                   maxiter=500),
        lambda: SOL.direct_solve(mv, n_dofs, b, constrained),
    ):
        x = solve()
        err = float(jnp.linalg.norm(x - x_true) / jnp.linalg.norm(x_true))
        assert err < 1e-7, err
