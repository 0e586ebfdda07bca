"""Stillinger-Weber three-body potential (single element).

reference physics: ``pair_style sw`` with Si.sw (the streched_polyhedron
example's force field, examples/.../lammps_scripts_sisw/in.set.lammps).
Functional form (Stillinger & Weber, PRB 31, 5262 (1985)):

  E = sum_{i<j} phi2(r_ij) + sum_i sum_{j<k} phi3(r_ij, r_ik, theta_jik)
  phi2(r) = A eps (B (sig/r)^p - (sig/r)^q) exp(sig / (r - a sig))
  phi3    = lam eps (cos th - cos0)^2 exp(gam sig/(r_ij - a sig))
                                      exp(gam sig/(r_ik - a sig))

both cut at r = a*sig.  The two-body sum runs over the full neighbor list
(halved); the three-body sum enumerates ordered pairs (j < k) within each
atom's own list — an (N, K, K) dense masked computation, which is the
TPU-shaped replacement for LAMMPS's triple loop.

NOTE on units: LAMMPS interprets .sw file energies in the *active* unit
system; the shipped example runs a metal-units file under ``units real``
and the reference inherits that — parameters here are taken verbatim from
the file, same behavior.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import neighbor as NB


@dataclass(frozen=True)
class SW:
    epsilon: float
    sigma: float
    a: float
    lam: float
    gamma: float
    costheta0: float
    A: float
    B: float
    p: float
    q: float

    @property
    def cutoff(self) -> float:
        return self.a * self.sigma

    def energy(self, pos: jax.Array, h: jax.Array, nbr: NB.NeighborList) -> jax.Array:
        dr = NB.neighbor_disp(pos, h, nbr)  # (N, K, 3)
        r2 = jnp.sum(dr * dr, axis=-1)
        rc = self.cutoff
        mask = nbr.mask & (r2 < (rc - 1e-6) ** 2)
        r = jnp.sqrt(jnp.where(mask, r2, 1.0))

        sig, eps = self.sigma, self.epsilon
        # two-body
        sr = sig / r
        srp = sr**self.p
        srq = sr**self.q
        expo = jnp.exp(sig / jnp.where(mask, r - rc, -1.0))
        e2 = self.A * eps * (self.B * srp - srq) * expo
        e2 = 0.5 * jnp.sum(jnp.where(mask, e2, 0.0))

        # three-body: ordered neighbor pairs (j, k) of each center i
        g = jnp.exp(self.gamma * sig / jnp.where(mask, r - rc, -1.0))
        g = jnp.where(mask, g, 0.0)  # (N, K)
        u = dr / r[..., None]  # unit vectors (N, K, 3)
        cos = jnp.einsum("nkd,nld->nkl", u, u)  # (N, K, K)
        dcos = cos - self.costheta0
        pair_mask = mask[:, :, None] & mask[:, None, :]
        K = dr.shape[1]
        upper = jnp.triu(jnp.ones((K, K), dtype=bool), k=1)
        w = g[:, :, None] * g[:, None, :]
        e3 = self.lam * eps * dcos * dcos * w
        e3 = jnp.sum(jnp.where(pair_mask & upper[None], e3, 0.0))
        return e2 + e3


def read_sw_file(path: str, element: str = "Si") -> SW:
    """Parse the first matching single-element entry of a LAMMPS .sw file."""
    vals = []
    with open(path) as f:
        for line in f:
            line = line.split("#")[0].strip()
            if line:
                vals.extend(line.split())
    # find "el el el" triple
    for i in range(len(vals) - 2):
        if vals[i] == element and vals[i + 1] == element and vals[i + 2] == element:
            nums = [float(x) for x in vals[i + 3 : i + 14]]
            (epsilon, sigma, a, lam, gamma, costheta0, A, B, p, q, _tol) = nums
            return SW(
                epsilon=epsilon, sigma=sigma, a=a, lam=lam, gamma=gamma,
                costheta0=costheta0, A=A, B=B, p=p, q=q,
            )
    raise ValueError(f"no {element} entry found in {path}")


# The shipped example's parameters (examples/.../lammps_scripts_sisw/Si.sw):
SI = SW(
    epsilon=2.1683, sigma=2.0951, a=1.80, lam=21.0, gamma=1.20,
    costheta0=-0.333333333333, A=7.049556277, B=0.6022245584, p=4.0, q=0.0,
)
