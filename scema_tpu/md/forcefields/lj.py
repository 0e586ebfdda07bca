"""Lennard-Jones (cut) pair potential with per-type parameters.

reference physics: ``pair_style lj/cut/coul/long 12.0 9.0`` (OPLS scripts,
in.set.lammps) — the LJ part here; Coulomb lives in coulomb.py/ewald.py.
No energy shift at the cutoff (LAMMPS default), matching the reference.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from .. import neighbor as NB


@dataclass(frozen=True)
class LJ:
    epsilon: jax.Array  # (ntypes, ntypes)
    sigma: jax.Array  # (ntypes, ntypes)
    cutoff: float
    types: jax.Array  # (N,) int32 atom types
    # pair weights for bonded exclusions (OPLS special_bonds); None = all 1
    special_weight_fn: object = None

    def energy(self, pos: jax.Array, h: jax.Array, nbr: NB.NeighborList) -> jax.Array:
        dr = NB.neighbor_disp(pos, h, nbr)  # (N, K, 3)
        r2 = jnp.sum(dr * dr, axis=-1)
        mask = nbr.mask & (r2 < self.cutoff**2)
        r2 = jnp.where(mask, r2, 1.0)  # avoid NaN grads on masked entries
        # close-range clamp: overlapping beads in unequilibrated inputs
        # would overflow (sig/r)^12 in float32
        r2 = jnp.maximum(r2, 0.25)

        ti = self.types[:, None]
        tj = self.types[nbr.idx]
        eps = self.epsilon[ti, tj]
        sig = self.sigma[ti, tj]

        s2 = sig * sig / r2
        s6 = s2 * s2 * s2
        e = 4.0 * eps * (s6 * s6 - s6)
        if self.special_weight_fn is not None:
            e = e * self.special_weight_fn(jnp.arange(pos.shape[0])[:, None], nbr.idx)
        # full neighbor list counts each pair twice
        return 0.5 * jnp.sum(jnp.where(mask, e, 0.0))


def single_type(epsilon: float, sigma: float, cutoff: float, n_atoms: int,
                dtype=jnp.float64) -> LJ:
    return LJ(
        epsilon=jnp.full((1, 1), epsilon, dtype=dtype),
        sigma=jnp.full((1, 1), sigma, dtype=dtype),
        cutoff=cutoff,
        types=jnp.zeros((n_atoms,), dtype=jnp.int32),
    )
