"""SHAKE/RATTLE bond-length constraints.

reference physics: ``fix shake 0.001 20 1000 m 1.0`` in the OPLS strain and
homogenization scripts (in.strain.lammps, ELASTIC/in.homogenization.lammps)
— bonds involving hydrogens held rigid so a 2 fs timestep is stable.

Implementation: Jacobi-style parallel SHAKE — each iteration computes the
Lagrange correction for every constraint from the *current* positions and
applies all of them with under-relaxation via segment-sum (atoms shared by
several constraints, e.g. CH2 hydrogens, converge in a few sweeps).  A
fixed iteration count keeps shapes static (the reference uses 20).
RATTLE projects relative velocities along the constrained bonds to zero.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import box as B


class Constraints(NamedTuple):
    idx: jax.Array  # (nc, 2) int32 atom pairs
    d0: jax.Array  # (nc,) target lengths
    mask: jax.Array  # (nc,) bool (padding rows False)


def from_bonds(bonds, lengths, n_constraints=None):
    bonds = jnp.asarray(bonds, dtype=jnp.int32)
    lengths = jnp.asarray(lengths)
    nc = bonds.shape[0]
    return Constraints(idx=bonds, d0=lengths, mask=jnp.ones((nc,), dtype=bool))


def shake_positions(
    cons: Constraints,
    pos_old: jax.Array,
    pos_new: jax.Array,
    h: jax.Array,
    inv_mass: jax.Array,  # (N,) 1/m (any consistent unit)
    n_iters: int = 20,
    relax: float = 0.8,
) -> jax.Array:
    """Project updated positions back onto the constraint manifold."""
    if cons.idx.shape[0] == 0:
        return pos_new
    i, j = cons.idx[:, 0], cons.idx[:, 1]
    r_old = B.min_image_disp(h, pos_old[j] - pos_old[i])  # reference dirs
    w = (inv_mass[i] + inv_mass[j])[:, None]
    n = pos_new.shape[0]

    def sweep(_, pos):
        r_new = B.min_image_disp(h, pos[j] - pos[i])
        diff = jnp.sum(r_new * r_new, axis=-1) - cons.d0**2
        denom = 2.0 * jnp.sum(r_new * r_old, axis=-1) * w[:, 0] + 1e-30
        g = jnp.where(cons.mask, relax * diff / denom, 0.0)
        corr = g[:, None] * r_old  # (nc, 3)
        dpos_i = jax.ops.segment_sum(corr * inv_mass[i][:, None], i, num_segments=n)
        dpos_j = jax.ops.segment_sum(-corr * inv_mass[j][:, None], j, num_segments=n)
        return pos + dpos_i + dpos_j

    return jax.lax.fori_loop(0, n_iters, sweep, pos_new)


def rattle_velocities(
    cons: Constraints,
    pos: jax.Array,
    vel: jax.Array,
    h: jax.Array,
    inv_mass: jax.Array,
    n_iters: int = 10,
    relax: float = 0.8,
) -> jax.Array:
    """Remove relative-velocity components along constrained bonds."""
    if cons.idx.shape[0] == 0:
        return vel
    i, j = cons.idx[:, 0], cons.idx[:, 1]
    r = B.min_image_disp(h, pos[j] - pos[i])
    r2 = jnp.sum(r * r, axis=-1)
    w = inv_mass[i] + inv_mass[j]
    n = vel.shape[0]

    def sweep(_, vel):
        dv = vel[j] - vel[i]
        k = jnp.where(
            cons.mask, relax * jnp.sum(dv * r, axis=-1) / (r2 * w + 1e-30), 0.0
        )
        corr = k[:, None] * r
        dvi = jax.ops.segment_sum(corr * inv_mass[i][:, None], i, num_segments=n)
        dvj = jax.ops.segment_sum(-corr * inv_mass[j][:, None], j, num_segments=n)
        return vel + dvi + dvj

    return jax.lax.fori_loop(0, n_iters, sweep, vel)
