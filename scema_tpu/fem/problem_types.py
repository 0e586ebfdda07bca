"""Problem geometries and boundary conditions: dogbone / dropweight / compact.

reference: FE_problem_type.h:28-111 (virtual interface), dogbone.h,
drop_weight.h, compact_tension.h.  DOF numbering is ``node * 3 + component``.

Boundary conditions are expressed as three static device arrays plus two
jit-traceable functions of the timestep:

* ``fixed_mask``  — dofs pinned to zero incremental velocity every step;
* ``loaded_mask`` — dofs that receive the prescribed loading value;
* ``bc_inc_velocity(timestep)`` — the incremental-velocity vector imposed at
  the start of a step (set_boundary_values, FE_problem.h:715-729);
* ``constrained_mask(timestep)`` — dofs whose velocity update is zeroed in
  the solve (boundary_conditions_to_zero + apply_boundary_values,
  FE_problem.h:862-871).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..config import HMMConfig
from .mesh import HexMesh, build_cuboid, read_msh, reposition_for_dogbone


def _min_edge(mesh: HexMesh) -> float:
    """Minimum vertex distance within cells (cell->minimum_vertex_distance)."""
    xyz = mesh.nodes[mesh.cells]  # (n_cells, 8, 3)
    d = np.linalg.norm(xyz[:, :, None, :] - xyz[:, None, :, :], axis=-1)
    d = np.where(d == 0.0, np.inf, d)
    return float(d.min())


@dataclass(frozen=True)
class Problem:
    mesh: HexMesh
    fixed_mask: jnp.ndarray  # (n_dofs,) bool
    loaded_mask: jnp.ndarray  # (n_dofs,) bool
    bc_inc_velocity: Callable  # (timestep) -> (n_dofs,) array
    constrained_mask: Callable  # (timestep) -> (n_dofs,) bool

    @property
    def n_dofs(self) -> int:
        return self.mesh.n_nodes * 3


def _masks_from_dof_lists(n_dofs, fixed, loaded):
    fixed_mask = np.zeros(n_dofs, dtype=bool)
    loaded_mask = np.zeros(n_dofs, dtype=bool)
    fixed_mask[np.asarray(sorted(set(fixed)), dtype=int)] = True
    if loaded:
        loaded_mask[np.asarray(sorted(set(loaded)), dtype=int)] = True
    return jnp.asarray(fixed_mask), jnp.asarray(loaded_mask)


def make_dogbone(cfg: HMMConfig, dtype=jnp.float64) -> Problem:
    """Uniaxial-stretch dogbone (dogbone.h).

    Base (z=0) fully fixed; top (z=Lz) fixed in x,y and pulled in z with the
    constant value ``strain_rate * Lz / dt`` imposed as the incremental
    velocity at timestep 1 only (dogbone.h:128-162).
    """
    m = cfg.mesh
    if m.style == "cuboid":
        mesh = build_cuboid(m.x_length, m.y_length, m.z_length, m.x_cells, m.y_cells, m.z_cells)
    elif "2" in m.style:  # file2D: quad mesh extruded along z
        from .mesh import read_msh_quads, extrude_quads_to_hexes

        nodes2d, quads = read_msh_quads(m.mesh_file)
        mesh = reposition_for_dogbone(
            extrude_quads_to_hexes(nodes2d, quads, m.extrude_length, m.extrude_points)
        )
    else:
        mesh = reposition_for_dogbone(read_msh(m.mesh_file))
    zmax = mesh.limits(2)[1]
    delta = _min_edge(mesh) / 10.0

    z = mesh.nodes[:, 2]
    base_nodes = np.where(np.abs(z) < delta)[0]
    top_nodes = np.where(np.abs(z - zmax) < delta)[0]

    fixed = [int(n) * 3 + c for n in base_nodes for c in range(3)]
    fixed += [int(n) * 3 + c for n in top_nodes for c in (0, 1)]
    loaded = [int(n) * 3 + 2 for n in top_nodes]

    n_dofs = mesh.n_nodes * 3
    fixed_mask, loaded_mask = _masks_from_dof_lists(n_dofs, fixed, loaded)
    load_value = cfg.problem.strain_rate * zmax / cfg.time.timestep_length
    both = fixed_mask | loaded_mask

    def bc_inc_velocity(timestep):
        val = jnp.where(timestep == 1, load_value, 0.0).astype(dtype)
        return jnp.where(loaded_mask, val, 0.0)

    def constrained_mask(timestep):
        return both

    return Problem(mesh, fixed_mask, loaded_mask, bc_inc_velocity, constrained_mask)


def make_dropweight(cfg: HMMConfig, dtype=jnp.float64) -> Problem:
    """Drop-weight impact (drop_weight.h).

    Cuboid centred on (0,0) with the top face at z=0; vertices within the
    weight diameter are driven downward by ``-acceleration * dt`` for the
    first ``steps to accelerate`` steps; the four side edges are fully fixed.
    """
    m = cfg.mesh
    base = build_cuboid(m.x_length, m.y_length, m.z_length, m.x_cells, m.y_cells, m.z_cells)
    mesh = base.shifted((-m.x_length / 2.0, -m.y_length / 2.0, -m.z_length))
    delta = _min_edge(mesh) / 10.0

    x, y = mesh.nodes[:, 0], mesh.nodes[:, 1]
    r = np.sqrt(x * x + y * y)
    loaded_nodes = np.where(r < cfg.problem.diameter / 2.0)[0]
    on_edge = (
        (np.abs(x - m.x_length / 2) < delta)
        | (np.abs(x + m.x_length / 2) < delta)
        | (np.abs(y - m.y_length / 2) < delta)
        | (np.abs(y + m.y_length / 2) < delta)
    )
    edge_nodes = np.where(on_edge)[0]

    fixed = [int(n) * 3 + c for n in edge_nodes for c in range(3)]
    loaded = [int(n) * 3 + 2 for n in loaded_nodes]

    n_dofs = mesh.n_nodes * 3
    fixed_mask, loaded_mask = _masks_from_dof_lists(n_dofs, fixed, loaded)
    vel_inc = -cfg.problem.acceleration * cfg.time.timestep_length
    n_acc = cfg.problem.steps_to_accelerate

    def bc_inc_velocity(timestep):
        val = jnp.where(timestep <= n_acc, vel_inc, 0.0).astype(dtype)
        return jnp.where(loaded_mask, val, 0.0)

    def constrained_mask(timestep):
        return fixed_mask | (loaded_mask & (timestep <= n_acc))

    return Problem(mesh, fixed_mask, loaded_mask, bc_inc_velocity, constrained_mask)


def make_compact_tension(cfg: HMMConfig, dtype=jnp.float64) -> Problem:
    """Compact-tension specimen (compact_tension.h) on an imported GMSH mesh.

    y=0 plane fixed in y, z=0 plane fixed in z, upper pin-hole ring loaded
    in y at constant velocity (imposed at timestep 1).
    """
    m = cfg.mesh
    mesh = read_msh(m.mesh_file)
    delta = _min_edge(mesh) / 10.0

    x, y, z = mesh.nodes[:, 0], mesh.nodes[:, 1], mesh.nodes[:, 2]
    ww = 2.0 * m.calculi_B
    ss = 0.55 * ww
    dd = 0.25 * ww
    cx, cy = ww, ss / 2.0
    dist = np.sqrt((x - cx) ** 2 + (y - cy) ** 2)

    fixed = [int(n) * 3 + 1 for n in np.where(np.abs(y) < delta)[0]]
    fixed += [int(n) * 3 + 2 for n in np.where(np.abs(z) < delta)[0]]
    loaded_nodes = np.where((np.abs(dist - dd / 2.0) < delta) & (y > cy))[0]
    loaded = [int(n) * 3 + 1 for n in loaded_nodes]

    n_dofs = mesh.n_nodes * 3
    fixed_mask, loaded_mask = _masks_from_dof_lists(n_dofs, fixed, loaded)
    load_value = cfg.problem.velocity / cfg.time.timestep_length
    both = fixed_mask | loaded_mask

    def bc_inc_velocity(timestep):
        val = jnp.where(timestep == 1, load_value, 0.0).astype(dtype)
        return jnp.where(loaded_mask, val, 0.0)

    def constrained_mask(timestep):
        return both

    return Problem(mesh, fixed_mask, loaded_mask, bc_inc_velocity, constrained_mask)


def make_problem(cfg: HMMConfig, dtype=jnp.float64) -> Problem:
    """Dispatch on 'problem type.class' (FE_problem.h:120-166)."""
    cls = cfg.problem.cls
    if cls == "dogbone":
        return make_dogbone(cfg, dtype)
    if cls in ("dropweight", "drop weight"):
        return make_dropweight(cfg, dtype)
    if cls in ("compact", "compact tension"):
        return make_compact_tension(cfg, dtype)
    raise ValueError(f"unknown problem type class: {cls!r}")
