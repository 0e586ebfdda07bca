"""Independent pure-numpy twin of the reference's explicit-dynamics HMM in
Hooke mode — the golden-value generator for the 1e-6 parity test.

This module deliberately shares NO code with scema_tpu: it builds its own
structured hex mesh (its own node/cell numbering), evaluates standard
trilinear shape functions at 2x2x2 Gauss points with an explicit Jacobian,
assembles row-sum lumped mass and internal forces with plain per-cell
loops, and advances the reference's velocity-form explicit update
(FE_problem.h:1021-1037, 2400-2502) with the Hooke fake-MD constitutive
path (stmd_problem.h:479-483, FE_problem.h:1631-1752).  Quadrature points
are identified by physical coordinates so the twin's ordering never has to
match the framework's.

Semantics implemented (dogbone, 'approximate md with hookes law'):
  per step:  ts += 1;  inc_u = 0;  inc_v = BC (load at ts == 1 only)
             rhs = dt*(f_ext - f_int(sigma));  rhs[constrained] = 0
             dv  = rhs / M_lumped;             dv[constrained] = 0
             du  = dt*(v + inc_v + dv) - inc_u;  inc_v += dv;  inc_u += du
             eps_newton = sym grad du at qps;  eps += eps_newton
             upd += eps_newton;  flags |= (voigt_norm(upd) >= tol)
             sigma = flagged ? sigma_old + C:upd (then upd = 0)
                             : sigma + C:eps_newton
             v += inc_v;  u += inc_u
Gravity body force g = 9.81 along -z (FE.h:143-147).
"""
from __future__ import annotations

import numpy as np

GRAVITY = 9.81


def isotropic_c66(E, nu):
    lam = E * nu / ((1 + nu) * (1 - 2 * nu))
    mu = E / (2 * (1 + nu))
    C = np.zeros((6, 6))
    C[:3, :3] = lam
    C[np.arange(3), np.arange(3)] += 2 * mu
    C[np.arange(3, 6), np.arange(3, 6)] = mu
    return C


def voigt_from_sym(t):
    """3x3 symmetric tensor -> [xx, yy, zz, xy, xz, yz] (strain uses the
    tensorial component, not the engineering double)."""
    return np.array([t[0, 0], t[1, 1], t[2, 2], t[0, 1], t[0, 2], t[1, 2]])


def contract_c66(C, eps_voigt):
    """sigma_voigt = C : eps with the off-diagonal doubling (C here is the
    rank-4 tensor in 6x6 Voigt layout acting on tensorial strain)."""
    w = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    return C @ (w * eps_voigt)


def voigt_norm(eps_voigt):
    """Frobenius norm of the symmetric tensor the Voigt vector encodes."""
    w = np.array([1.0, 1.0, 1.0, 2.0, 2.0, 2.0])
    return np.sqrt(np.sum(w * eps_voigt**2, axis=-1))


class TwinMesh:
    def __init__(self, lx, ly, lz, nx, ny, nz):
        xs = np.linspace(0.0, lx, nx + 1)
        ys = np.linspace(0.0, ly, ny + 1)
        zs = np.linspace(0.0, lz, nz + 1)
        # node id = i + (nx+1)*(j + (ny+1)*k)
        X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
        self.nodes = np.stack(
            [X.ravel(order="F"), Y.ravel(order="F"), Z.ravel(order="F")], axis=1
        )

        def nid(i, j, k):
            return i + (nx + 1) * (j + (ny + 1) * k)

        cells = []
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    cells.append(
                        [
                            nid(i, j, k), nid(i + 1, j, k),
                            nid(i + 1, j + 1, k), nid(i, j + 1, k),
                            nid(i, j, k + 1), nid(i + 1, j, k + 1),
                            nid(i + 1, j + 1, k + 1), nid(i, j + 1, k + 1),
                        ]
                    )
        self.cells = np.asarray(cells, dtype=int)
        self.lz = lz


# local corner coords matching the cell ordering above
_CORNERS = np.array(
    [
        [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
        [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ],
    dtype=float,
)


def shape_funcs(xi):
    """Trilinear N_v(xi) and dN_v/dxi for one local point xi (3,)."""
    s = _CORNERS
    N = np.prod(1.0 + s * xi[None, :], axis=1) / 8.0
    dN = np.zeros((8, 3))
    for d in range(3):
        term = 1.0 + s * xi[None, :]
        term[:, d] = s[:, d]
        dN[:, d] = np.prod(term, axis=1) / 8.0
    return N, dN


def gauss_points(n):
    if n == 2:
        g = 1.0 / np.sqrt(3.0)
        pts_1d, w_1d = np.array([-g, g]), np.array([1.0, 1.0])
    else:
        raise NotImplementedError
    pts, ws = [], []
    # deal.II tensor-product order: x fastest
    for k in pts_1d:
        for j in pts_1d:
            for i in pts_1d:
                pts.append([i, j, k])
                ws.append(1.0)
    return np.asarray(pts), np.asarray(ws)


class TwinFE:
    """Precomputed per-cell quadrature data + the explicit step loop."""

    def __init__(self, mesh: TwinMesh, E, nu, rho, dt, strain_rate,
                 min_strain_norm=1e-10):
        self.mesh = mesh
        self.C = isotropic_c66(E, nu)
        self.rho = rho
        self.dt = dt
        self.tol = min_strain_norm
        nc = mesh.cells.shape[0]
        pts, ws = gauss_points(2)
        nq = pts.shape[0]
        self.nq = nq
        self.grads = np.zeros((nc, nq, 8, 3))  # dN/dx
        self.shapes = np.zeros((nq, 8))
        self.jxw = np.zeros((nc, nq))
        self.qp_xyz = np.zeros((nc, nq, 3))
        for q in range(nq):
            N, dN = shape_funcs(pts[q])
            self.shapes[q] = N
            for c in range(nc):
                xyz = mesh.nodes[mesh.cells[c]]  # (8, 3)
                # J[i, j] = sum_v dN_v/dxi_i * x_v[j] (so J = (dx/dxi)^T);
                # dN/dx = dN/dxi @ J^{-T}
                J = dN.T @ xyz
                detJ = np.linalg.det(J)
                dNdx = np.linalg.solve(J, dN.T).T
                self.grads[c, q] = dNdx
                self.jxw[c, q] = detJ * ws[q]
                self.qp_xyz[c, q] = N @ xyz

        # lumped mass: m_node = sum_cells sum_q rho N_v(q) jxw
        nn = mesh.nodes.shape[0]
        m = np.zeros(nn)
        for c in range(nc):
            for q in range(nq):
                m[mesh.cells[c]] += rho * self.shapes[q] * self.jxw[c, q]
        self.mass = np.repeat(m, 3)  # per dof

        # gravity external force (constant): f_z = -g * m_node
        f = np.zeros((nn, 3))
        f[:, 2] = -GRAVITY * m
        self.f_ext = f.ravel()

        # dogbone BCs
        z = mesh.nodes[:, 2]
        delta = 1e-9 + 0.1 * np.min(
            np.linalg.norm(np.diff(mesh.nodes[mesh.cells[0]], axis=0), axis=1)
        )
        base = np.where(np.abs(z) < delta)[0]
        top = np.where(np.abs(z - mesh.lz) < delta)[0]
        self.constrained = np.zeros(3 * nn, dtype=bool)
        for n in base:
            self.constrained[3 * n : 3 * n + 3] = True
        for n in top:
            self.constrained[3 * n] = True
            self.constrained[3 * n + 1] = True
            self.constrained[3 * n + 2] = True  # loaded dof is constrained too
        self.loaded = np.zeros(3 * nn, dtype=bool)
        for n in top:
            self.loaded[3 * n + 2] = True
        self.load_value = strain_rate * mesh.lz / dt

    def internal_force(self, sigma):
        """sigma: (nc, nq, 6) voigt -> f_int (ndofs,)."""
        nc = self.mesh.cells.shape[0]
        f = np.zeros(self.mesh.nodes.shape[0] * 3)
        for c in range(nc):
            fc = np.zeros((8, 3))
            for q in range(self.nq):
                s = sigma[c, q]
                S = np.array(
                    [
                        [s[0], s[3], s[4]],
                        [s[3], s[1], s[5]],
                        [s[4], s[5], s[2]],
                    ]
                )
                # sigma : eps(phi_v e_a) = (sigma . grad phi_v)_a
                fc += (self.grads[c, q] @ S.T) * self.jxw[c, q]
            for v in range(8):
                n = self.mesh.cells[c, v]
                f[3 * n : 3 * n + 3] += fc[v]
        return f

    def qp_strain(self, du):
        """Symmetric gradient of the nodal field du at all qps -> (nc,nq,6)."""
        nc = self.mesh.cells.shape[0]
        out = np.zeros((nc, self.nq, 6))
        d = du.reshape(-1, 3)
        for c in range(nc):
            ue = d[self.mesh.cells[c]]  # (8, 3)
            for q in range(self.nq):
                g = ue.T @ self.grads[c, q]  # du_i/dx_j
                e = 0.5 * (g + g.T)
                out[c, q] = voigt_from_sym(e)
        return out

    def run(self, n_steps):
        """Advance n_steps; returns dict of trajectories."""
        nn = self.mesh.nodes.shape[0]
        nc = self.mesh.cells.shape[0]
        u = np.zeros(3 * nn)
        v = np.zeros(3 * nn)
        eps = np.zeros((nc, self.nq, 6))
        upd = np.zeros((nc, self.nq, 6))
        sigma = np.zeros((nc, self.nq, 6))
        flags = np.zeros((nc, self.nq), dtype=bool)
        sig_hist, u_hist = [], []
        for ts in range(1, n_steps + 1):
            inc_u = np.zeros(3 * nn)
            inc_v = np.where(self.loaded & (ts == 1), self.load_value, 0.0)
            rhs = self.dt * (self.f_ext - self.internal_force(sigma))
            rhs[self.constrained] = 0.0
            dv = rhs / self.mass
            dv[self.constrained] = 0.0
            du = self.dt * (v + inc_v + dv) - inc_u
            inc_v = inc_v + dv
            inc_u = inc_u + du
            de = self.qp_strain(du)
            eps = eps + de
            upd = upd + de
            flags = flags | (voigt_norm(upd) >= self.tol)
            sig_md = sigma + np.einsum(
                "ab,cqb->cqa", self.C, upd * np.array([1, 1, 1, 2, 2, 2.0])
            )
            sig_tan = sigma + np.einsum(
                "ab,cqb->cqa", self.C, de * np.array([1, 1, 1, 2, 2, 2.0])
            )
            sigma = np.where(flags[..., None], sig_md, sig_tan)
            upd = np.where(flags[..., None], 0.0, upd)
            v = v + inc_v
            u = u + inc_u
            sig_hist.append(sigma.copy())
            u_hist.append(u.copy())
        return {
            "sigma": np.stack(sig_hist),  # (n_steps, nc, nq, 6)
            "u": np.stack(u_hist),
            "qp_xyz": self.qp_xyz,
            "nodes": self.mesh.nodes,
        }


def run_dogbone_twin(n_steps=10):
    """The inputs_dogbone_cuboid Hooke-mode golden run."""
    mesh = TwinMesh(0.03, 0.03, 0.08, 3, 3, 8)
    fe = TwinFE(mesh, E=3.0e9, nu=0.35, rho=1200.0, dt=5.0e-7,
                strain_rate=0.002)
    return fe.run(n_steps)
