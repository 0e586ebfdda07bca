"""Force fields for the on-device MD engine.

Each force field is a frozen dataclass exposing

    energy(pos, h, nbr) -> scalar potential energy

in the active unit system.  Forces and the potential virial are derived by
automatic differentiation (md/engine.py:forces_and_virial) — exact for any
functional form including three-body terms, so no hand-written force
kernels can disagree with their energies.

Implemented: lj (pair LJ cut + optional cut Coulomb), sw (Stillinger-
Weber), opls (bonded harmonic bonds/angles + OPLS dihedrals over a fixed
topology).  reference physics: lammps_scripts_*/in.set.lammps.
"""
from . import lj  # noqa: F401
from . import sw  # noqa: F401
