"""FE substrate tests: mesh, shapes, assembly identities, static patch test."""
import numpy as np
import jax.numpy as jnp

from scema_tpu.fem import mesh as M
from scema_tpu.fem import shapes as S
from scema_tpu.fem import assembly as A
from scema_tpu.utils import tensors as T


def small_geom(nx=2, ny=2, nz=3, lx=1.0, ly=1.0, lz=1.5, ng=2):
    m = M.build_cuboid(lx, ly, lz, nx, ny, nz)
    return m, S.precompute_geometry(m.nodes, m.cells, ng)


def test_cuboid_mesh_counts():
    m = M.build_cuboid(0.03, 0.03, 0.08, 3, 3, 8)
    assert m.n_cells == 3 * 3 * 8
    assert m.n_nodes == 4 * 4 * 9
    assert np.isclose(m.extent(2), 0.08)


def test_jxw_sums_to_volume():
    m, g = small_geom()
    vol = float(jnp.sum(g.jxw))
    assert np.isclose(vol, 1.0 * 1.0 * 1.5, rtol=1e-12)


def test_shape_partition_of_unity():
    pts, _ = S.tensor_quadrature(2)
    vals = S.q1_shape_values(pts)
    assert np.allclose(vals.sum(axis=1), 1.0)
    grads = S.q1_shape_grads(pts)
    assert np.allclose(grads.sum(axis=1), 0.0, atol=1e-14)


def test_linear_field_exact_gradient():
    """Q1 elements reproduce a linear displacement field exactly."""
    m, g = small_geom()
    G = np.array([[1.0, 2.0, 3.0], [0.5, -1.0, 0.25], [-0.75, 0.1, 2.0]]) * 1e-3
    u = (m.nodes @ G.T).reshape(-1)  # u_i = G_ij x_j
    grad = np.asarray(A.qp_gradients(g, jnp.asarray(u)))
    assert np.allclose(grad, G[None, None, :, :], atol=1e-12)
    eps = np.asarray(A.qp_strains(g, jnp.asarray(u)))
    expect = T.sym_to_voigt(jnp.asarray(0.5 * (G + G.T)))
    assert np.allclose(eps, np.asarray(expect)[None, :], atol=1e-12)


def test_lumped_mass_total():
    m, g = small_geom()
    rho = jnp.full((g.n_qp_total,), 1200.0)
    diag = np.asarray(A.lumped_mass_diag(g, rho))
    total_per_comp = diag.reshape(-1, 3).sum(axis=0)
    assert np.allclose(total_per_comp, 1200.0 * 1.5, rtol=1e-12)


def test_internal_force_zero_for_uniform_stress():
    """Divergence-free uniform stress gives zero interior nodal force."""
    m, g = small_geom()
    sig = jnp.tile(jnp.asarray([1e6, 2e6, -1e6, 3e5, -2e5, 1e5]), (g.n_qp_total, 1))
    f = np.asarray(A.internal_force(g, sig)).reshape(-1, 3)
    interior = (
        (m.nodes[:, 0] > 1e-9) & (m.nodes[:, 0] < 1.0 - 1e-9)
        & (m.nodes[:, 1] > 1e-9) & (m.nodes[:, 1] < 1.0 - 1e-9)
        & (m.nodes[:, 2] > 1e-9) & (m.nodes[:, 2] < 1.5 - 1e-9)
    )
    assert np.allclose(f[interior], 0.0, atol=1e-6)


def test_internal_force_matches_boundary_traction():
    """Uniform uniaxial stress: top-face nodal forces sum to sigma*A."""
    m, g = small_geom()
    sig = jnp.tile(jnp.asarray([0.0, 0.0, 5e6, 0.0, 0.0, 0.0]), (g.n_qp_total, 1))
    f = np.asarray(A.internal_force(g, sig)).reshape(-1, 3)
    top = np.abs(m.nodes[:, 2] - 1.5) < 1e-9
    # internal force = -external equilibrating traction; top face area 1.0
    assert np.isclose(f[top, 2].sum(), 5e6 * 1.0, rtol=1e-12)


def test_gravity_external_force_total():
    m, g = small_geom()
    rho = jnp.full((g.n_qp_total,), 1000.0)
    f = np.asarray(A.external_force(g, rho)).reshape(-1, 3)
    assert np.allclose(f[:, :2], 0.0)
    assert np.isclose(f[:, 2].sum(), -A.GRAVITY * 1000.0 * 1.5, rtol=1e-12)


def test_gmsh_roundtrip(tmp_path):
    """Write a tiny msh v2 file and read it back."""
    m = M.build_cuboid(1.0, 1.0, 1.0, 1, 1, 1)
    # gmsh order from bit order: [0,1,3,2,4,5,7,6]
    gmsh_order = [0, 1, 3, 2, 4, 5, 7, 6]
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(m.n_nodes)]
    for i, p in enumerate(m.nodes):
        lines.append(f"{i+1} {p[0]} {p[1]} {p[2]}")
    lines += ["$EndNodes", "$Elements", "1"]
    conn = " ".join(str(m.cells[0][b] + 1) for b in gmsh_order)
    lines.append(f"1 5 2 0 1 {conn}")
    lines += ["$EndElements"]
    p = tmp_path / "cube.msh"
    p.write_text("\n".join(lines))
    m2 = M.read_msh(str(p))
    assert m2.n_cells == 1 and m2.n_nodes == 8
    g = S.precompute_geometry(m2.nodes, m2.cells, 2)
    assert np.isclose(float(jnp.sum(g.jxw)), 1.0)
