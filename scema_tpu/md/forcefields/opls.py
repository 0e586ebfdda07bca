"""Composite OPLS-style force field: LJ + Coulomb (Ewald) + bonded terms
with special-bonds exclusions.

reference physics (lammps_scripts_opls/in.set.lammps): ``pair_style
lj/cut/coul/long 12.0 9.0`` + harmonic bonds/angles + opls dihedrals +
``kspace_style pppm 0.0001``; ``special_bonds`` left at the LAMMPS default
(lj/coul 0 0 0: 1-2, 1-3, 1-4 pairs fully excluded), configurable here.

The exclusion machinery builds static per-atom neighbor-order lists (1-2,
1-3, 1-4) from the topology at setup (host-side numpy); at evaluation the
pair weight enters as a masked lookup against the neighbor list.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import neighbor as NB
from . import bonded as BD
from .coulomb import Ewald, coulomb_cut_energy


def build_exclusions(
    n_atoms: int, bonds: np.ndarray, max_per_atom: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Per-atom (1-2, 1-3, 1-4) partner lists from the bond graph.

    Returns (excl (N, 3, max_per_atom) int32 padded with -1, counts).
    """
    adj: list[set[int]] = [set() for _ in range(n_atoms)]
    for a, b in np.asarray(bonds):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))

    excl = np.full((n_atoms, 3, max_per_atom), -1, dtype=np.int32)
    for i in range(n_atoms):
        one2 = adj[i]
        one3 = set()
        for j in one2:
            one3 |= adj[j]
        one3 -= one2 | {i}
        one4 = set()
        for j in one3:
            one4 |= adj[j]
        one4 -= one3 | one2 | {i}
        for order, s in enumerate((one2, one3, one4)):
            lst = sorted(s)[:max_per_atom]
            excl[i, order, : len(lst)] = lst
    return excl, None


@dataclass(frozen=True)
class OPLS:
    """Full OPLS-style force field over a fixed topology."""

    types: jax.Array  # (N,) int32
    charges: jax.Array  # (N,)
    lj_epsilon: jax.Array  # (ntypes, ntypes) pre-mixed
    lj_sigma: jax.Array
    lj_cutoff: float
    coul_cutoff: float
    topo: BD.Topology
    bonded: BD.BondedParams
    excl: jax.Array  # (N, 3, max_excl) int32, -1 padded
    special_lj: tuple = (0.0, 0.0, 0.0)  # 1-2, 1-3, 1-4 weights
    special_coul: tuple = (0.0, 0.0, 0.0)
    ewald: Optional[Ewald] = None  # None = coul/cut

    @property
    def cutoff(self) -> float:
        return max(self.lj_cutoff, self.coul_cutoff)

    def _pair_weights(self, nbr: NB.NeighborList, special):
        """(N, K) weights from the special-bonds exclusion lists."""
        w = jnp.ones(nbr.idx.shape, dtype=self.charges.dtype)
        for order in range(3):
            partners = self.excl[:, order, :]  # (N, max_excl)
            hit = jnp.any(
                nbr.idx[:, :, None] == partners[:, None, :], axis=-1
            ) & (partners.shape[1] > 0)
            w = jnp.where(hit, special[order], w)
        return w

    def energy(self, pos: jax.Array, h: jax.Array, nbr: NB.NeighborList) -> jax.Array:
        dr = NB.neighbor_disp(pos, h, nbr)
        r2 = jnp.sum(dr * dr, axis=-1)

        # LJ with special weights
        lj_mask = nbr.mask & (r2 < self.lj_cutoff**2)
        r2s = jnp.where(lj_mask, r2, 1.0)
        r2s = jnp.maximum(r2s, 0.25)  # float32 overflow guard (see lj.py)
        ti = self.types[:, None]
        tj = self.types[nbr.idx]
        eps = self.lj_epsilon[ti, tj]
        sig = self.lj_sigma[ti, tj]
        s2 = sig * sig / r2s
        s6 = s2 * s2 * s2
        wlj = self._pair_weights(nbr, self.special_lj)
        e_lj = 0.5 * jnp.sum(jnp.where(lj_mask, wlj * 4.0 * eps * (s6 * s6 - s6), 0.0))

        # Coulomb
        wq = self._pair_weights(nbr, self.special_coul)
        if self.ewald is not None:
            e_q = self.ewald.real_space_energy(pos, h, nbr, weights=wq)
            e_q = e_q + self.ewald.reciprocal_energy(pos, h) + self.ewald.self_energy()
            # remove reciprocal-space contributions of excluded pairs
            excl_flat = self.excl.reshape(self.excl.shape[0], -1)
            # weight-specific: only fully/partially excluded orders corrected
            corr_mask = excl_flat >= 0
            # scale correction by (1 - w) per order
            wcorr = jnp.concatenate(
                [
                    jnp.full(
                        (self.excl.shape[0], self.excl.shape[2]),
                        1.0 - self.special_coul[o],
                        dtype=pos.dtype,
                    )
                    for o in range(3)
                ],
                axis=1,
            )
            idx_safe = jnp.maximum(excl_flat, 0)
            from .. import box as B

            drx = B.min_image_disp(h, pos[idx_safe] - pos[:, None, :])
            r2x = jnp.sum(drx * drx, axis=-1)
            rx = jnp.sqrt(jnp.where(corr_mask, r2x, 1.0))
            qq = self.charges[:, None] * self.charges[idx_safe]
            ecorr = (
                -self.ewald.qqr2e
                * wcorr
                * qq
                * jax.scipy.special.erf(self.ewald.alpha * rx)
                / rx
            )
            e_q = e_q + 0.5 * jnp.sum(jnp.where(corr_mask, ecorr, 0.0))
        else:
            e_q = coulomb_cut_energy(
                self.charges, pos, h, nbr, self.coul_cutoff, weights=wq
            )

        e_bonded = BD.bonded_energy(pos, h, self.topo, self.bonded)
        return e_lj + e_q + e_bonded


def mix_geometric(eps_diag, sig_diag) -> tuple[jnp.ndarray, jnp.ndarray]:
    """OPLS geometric mixing for both epsilon and sigma."""
    eps_diag = jnp.asarray(eps_diag)
    sig_diag = jnp.asarray(sig_diag)
    return (
        jnp.sqrt(eps_diag[:, None] * eps_diag[None, :]),
        jnp.sqrt(sig_diag[:, None] * sig_diag[None, :]),
    )
