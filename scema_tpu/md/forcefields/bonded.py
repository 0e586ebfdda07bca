"""Bonded interactions: harmonic bonds/angles, OPLS dihedrals, harmonic
impropers — over a fixed molecular topology.

reference physics (lammps_scripts_opls/in.set.lammps):
  bond_style harmonic      E = K (r - r0)^2
  angle_style harmonic     E = K (theta - theta0)^2
  dihedral_style opls      E = 0.5 K1 (1+cos phi) + 0.5 K2 (1-cos 2phi)
                             + 0.5 K3 (1+cos 3phi) + 0.5 K4 (1-cos 4phi)
  improper_style harmonic  E = K (chi - chi0)^2

All terms are computed as dense gathers over static topology arrays with a
validity mask (padded rows), energies only — forces via autodiff upstream.
Angles in degrees in parameter files (LAMMPS convention), radians inside.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import box as B


class Topology(NamedTuple):
    """Static bonded topology (padded; mask rows with type < 0)."""

    bonds: jax.Array  # (nb, 2) int32 atom indices
    bond_type: jax.Array  # (nb,) int32, -1 = padding
    angles: jax.Array  # (na, 3) — vertex atom is the middle index
    angle_type: jax.Array
    dihedrals: jax.Array  # (nd, 4)
    dihedral_type: jax.Array
    impropers: jax.Array  # (ni, 4)
    improper_type: jax.Array


class BondedParams(NamedTuple):
    bond_k: jax.Array  # (n_bond_types,)
    bond_r0: jax.Array
    angle_k: jax.Array  # (n_angle_types,)
    angle_theta0: jax.Array  # radians
    dihedral_k: jax.Array  # (n_dihedral_types, 4) K1..K4
    improper_k: jax.Array  # (n_improper_types,)
    improper_chi0: jax.Array  # radians


def empty_topology(dtype=jnp.int32) -> Topology:
    z2 = jnp.zeros((0, 2), dtype)
    z3 = jnp.zeros((0, 3), dtype)
    z4 = jnp.zeros((0, 4), dtype)
    z = jnp.zeros((0,), dtype)
    return Topology(z2, z, z3, z, z4, z, z4, z)


def bond_energy(pos, h, topo: Topology, par: BondedParams) -> jax.Array:
    if topo.bonds.shape[0] == 0:
        return jnp.asarray(0.0, pos.dtype)
    i, j = topo.bonds[:, 0], topo.bonds[:, 1]
    dr = B.min_image_disp(h, pos[j] - pos[i])
    r = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-30)
    t = jnp.clip(topo.bond_type, 0, par.bond_k.shape[0] - 1)
    e = par.bond_k[t] * (r - par.bond_r0[t]) ** 2
    return jnp.sum(jnp.where(topo.bond_type >= 0, e, 0.0))


def angle_energy(pos, h, topo: Topology, par: BondedParams) -> jax.Array:
    if topo.angles.shape[0] == 0:
        return jnp.asarray(0.0, pos.dtype)
    i, j, k = topo.angles[:, 0], topo.angles[:, 1], topo.angles[:, 2]
    r1 = B.min_image_disp(h, pos[i] - pos[j])
    r2 = B.min_image_disp(h, pos[k] - pos[j])
    c = jnp.sum(r1 * r2, axis=-1) / jnp.sqrt(
        jnp.sum(r1 * r1, axis=-1) * jnp.sum(r2 * r2, axis=-1) + 1e-30
    )
    theta = jnp.arccos(jnp.clip(c, -1.0 + 1e-12, 1.0 - 1e-12))
    t = jnp.clip(topo.angle_type, 0, par.angle_k.shape[0] - 1)
    e = par.angle_k[t] * (theta - par.angle_theta0[t]) ** 2
    return jnp.sum(jnp.where(topo.angle_type >= 0, e, 0.0))


def _dihedral_angle(pos, h, quads):
    """Signed dihedral angle phi for (n, 4) atom quadruples."""
    a, b, c, d = (quads[:, k] for k in range(4))
    b1 = B.min_image_disp(h, pos[b] - pos[a])
    b2 = B.min_image_disp(h, pos[c] - pos[b])
    b3 = B.min_image_disp(h, pos[d] - pos[c])
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    m1 = jnp.cross(n1, b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True))
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(y, x)


def dihedral_energy(pos, h, topo: Topology, par: BondedParams) -> jax.Array:
    if topo.dihedrals.shape[0] == 0:
        return jnp.asarray(0.0, pos.dtype)
    phi = _dihedral_angle(pos, h, topo.dihedrals)
    t = jnp.clip(topo.dihedral_type, 0, par.dihedral_k.shape[0] - 1)
    K = par.dihedral_k[t]  # (nd, 4)
    e = 0.5 * (
        K[:, 0] * (1.0 + jnp.cos(phi))
        + K[:, 1] * (1.0 - jnp.cos(2.0 * phi))
        + K[:, 2] * (1.0 + jnp.cos(3.0 * phi))
        + K[:, 3] * (1.0 - jnp.cos(4.0 * phi))
    )
    return jnp.sum(jnp.where(topo.dihedral_type >= 0, e, 0.0))


def improper_energy(pos, h, topo: Topology, par: BondedParams) -> jax.Array:
    if topo.impropers.shape[0] == 0:
        return jnp.asarray(0.0, pos.dtype)
    chi = _dihedral_angle(pos, h, topo.impropers)
    t = jnp.clip(topo.improper_type, 0, par.improper_k.shape[0] - 1)
    e = par.improper_k[t] * (chi - par.improper_chi0[t]) ** 2
    return jnp.sum(jnp.where(topo.improper_type >= 0, e, 0.0))


def bonded_energy(pos, h, topo: Topology, par: BondedParams) -> jax.Array:
    return (
        bond_energy(pos, h, topo, par)
        + angle_energy(pos, h, topo, par)
        + dihedral_energy(pos, h, topo, par)
        + improper_energy(pos, h, topo, par)
    )
