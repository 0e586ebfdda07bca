"""Unit systems for the MD engine (LAMMPS 'real' and 'metal' conventions).

The reference force-field scripts run under ``units real``
(lammps_scripts_*/in.set.lammps): distance angstrom, time fs, mass g/mol,
energy kcal/mol, temperature K, pressure atm.  The shipped Si example loads
a metal-units .sw file under real units — LAMMPS interprets file energies
in the *active* unit system, and the reference inherits that quirk; the
engine does the same so the example reproduces.

Pressure-to-pascal conversion for homogenization: the reference converts
LAMMPS atm to Pa with -1.01325e5 (stmd_problem.h:335-341).
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class UnitSystem:
    name: str
    boltz: float  # kB in energy/K
    ftm2v: float  # (force/mass) -> velocity/time
    nktv2p: float  # energy/volume -> pressure unit
    pressure_to_pa: float  # 1 pressure unit in Pa
    time_unit_fs: float  # 1 time unit in femtoseconds


# LAMMPS 'real': A, fs, g/mol, kcal/mol, K, atm
REAL = UnitSystem(
    name="real",
    boltz=0.0019872067,
    ftm2v=1.0 / 48.88821291 / 48.88821291,
    nktv2p=68568.415,
    pressure_to_pa=101325.0,
    time_unit_fs=1.0,
)

# LAMMPS 'metal': A, ps, g/mol, eV, K, bar
METAL = UnitSystem(
    name="metal",
    boltz=8.617343e-5,
    ftm2v=1.0 / 1.0364269e-4,
    nktv2p=1.6021765e6,
    pressure_to_pa=1.0e5,
    time_unit_fs=1000.0,
)

# ATM -> Pa with the reference's sign flip (compression-positive pressure to
# tension-positive stress), stmd_problem.h:340.
ATM_TO_PA = 1.01325e5


def get(name: str) -> UnitSystem:
    return {"real": REAL, "metal": METAL}[name]
