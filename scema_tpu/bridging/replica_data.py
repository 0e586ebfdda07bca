"""Per-replica nanostructure metadata + equilibration-data loading.

reference: STMDSync::load_replica_generation_data (stmd_sync.h:280-359)
reads ``<nanoscale input>/<mat>_<n>.json`` — relative_density, Nsheets and
(for single-flake composites) the flake normal vector, from which the
replica -> common-ground rotation tensor is computed against the config's
"rotation common ground vector".  load_replica_equilibration_data
(stmd_sync.h:361-489) then reads ``init.<mat>_<n>.{length,stress,stiff}``
measured by a prior init_material run.

Here both are optional per replica: a missing JSON falls back to identity
orientation (the reference exits), and missing init files fall back to
the on-device equilibrate+measure pipeline (which replaces the separate
init_material executable).  The LAMMPS binary restart (init.<mat>_<n>.bin)
is read by md/lammps_restart.py — when present (and parseable) it seeds
the replica's microstate exactly as the reference's ``read_restart``
does (stmd_problem.h:185-207), skipping on-device equilibration.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..utils import io_tensors as io
from ..utils import tensors as T


@dataclass
class ReplicaMeta:
    """One replica's nanostructure + equilibration data (ReplicaData,
    stmd_sync.h:41-51)."""

    rotam: np.ndarray  # (3, 3) replica frame -> common ground
    rho: Optional[float] = None  # kg/m^3 from relative_density * 1000
    length: Optional[np.ndarray] = None  # (3,)
    stress: Optional[np.ndarray] = None  # (6,) Voigt, Pa
    stiff: Optional[np.ndarray] = None  # (6, 6) Pa
    micro: object = None  # lammps_restart.LammpsRestart (init.*.bin)


def _rotation_from_json(pt: dict, cg_vector) -> np.ndarray:
    """stmd_sync.h:338-359: single-flake replicas rotate normal -> cg."""
    nflakes = int(pt.get("Nsheets", 0))
    nv = pt.get("normal_vector") or {}
    if nflakes == 1 and "1" in nv:
        v = nv["1"]
        nvec = np.array([float(v["x"]), float(v["y"]), float(v["z"])])
        nvec = nvec / np.linalg.norm(nvec)
        cg = np.asarray(cg_vector, dtype=float)
        cg = cg / np.linalg.norm(cg)
        import jax.numpy as jnp

        return np.asarray(T.compute_rotation_tensor(jnp.asarray(nvec),
                                                    jnp.asarray(cg)))
    return np.eye(3)


def load_replica_metadata(
    nano_dir: str,
    materials,
    n_repl: int,
    cg_vector=(1.0, 0.0, 0.0),
) -> list[list[ReplicaMeta]]:
    """[(material)][(replica)] metadata; silent identity fallbacks."""
    out = []
    for mat in materials:
        rows = []
        for r in range(n_repl):
            meta = ReplicaMeta(rotam=np.eye(3))
            jpath = os.path.join(nano_dir, f"{mat}_{r + 1}.json")
            if os.path.exists(jpath):
                with open(jpath) as f:
                    pt = json.load(f)
                meta.rotam = _rotation_from_json(pt, cg_vector)
                if "relative_density" in pt:
                    meta.rho = float(pt["relative_density"]) * 1000.0
            base = os.path.join(nano_dir, f"init.{mat}_{r + 1}")
            if os.path.exists(base + ".length"):
                meta.length = io.read_vector(base + ".length")
            if os.path.exists(base + ".stress"):
                sym = io.read_sym2(base + ".stress")
                meta.stress = np.array([sym[0, 0], sym[1, 1], sym[2, 2],
                                        sym[0, 1], sym[0, 2], sym[1, 2]])
            if os.path.exists(base + ".stiff"):
                import jax.numpy as jnp

                c4 = io.read_sym4(base + ".stiff")
                meta.stiff = np.asarray(T.rank4_to_c66(jnp.asarray(c4)))
            if os.path.exists(base + ".bin"):
                from ..md import lammps_restart as LRS

                try:
                    meta.micro = LRS.read_restart(base + ".bin")
                except ValueError as e:
                    import warnings

                    warnings.warn(f"skipping unreadable LAMMPS restart "
                                  f"{base}.bin: {e}")
            rows.append(meta)
        out.append(rows)
    return out
