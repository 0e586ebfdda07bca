"""Hexahedral meshes: cuboid generator, GMSH import, dogbone repositioning.

reference:
* cuboid generation — GridGenerator::subdivided_hyper_rectangle call in
  dogbone.h:59-78 / drop_weight.h:16-40;
* GMSH import + 2D extrusion — FE_problem_type.h:71-109;
* longest-axis-to-z rotation and shift-to-z=0 for the dogbone test —
  dogbone.h:14-57 ``mesh_manipulation_for_bc_application``.

Vertex numbering inside a hex follows the bit pattern
``index = x_bit + 2*y_bit + 4*z_bit`` (deal.II convention), and cells of the
structured cuboid mesh are numbered x-fastest so that the reference's
``qp_id = cell_index * n_qp + q`` (FE_problem.h:485) enumerates quadrature
points identically.

Meshes are host-side (numpy); device arrays are produced once by the
geometry precompute in fem/shapes.py.
"""
from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np


@dataclass(frozen=True)
class HexMesh:
    nodes: np.ndarray  # (n_nodes, 3) float64
    cells: np.ndarray  # (n_cells, 8) int32, bit-ordered vertices

    @property
    def n_nodes(self) -> int:
        return self.nodes.shape[0]

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    def limits(self, axis: int) -> tuple[float, float]:
        """Min/max vertex coordinate on an axis (math_calc.h:212-239)."""
        return float(self.nodes[:, axis].min()), float(self.nodes[:, axis].max())

    def extent(self, axis: int) -> float:
        lo, hi = self.limits(axis)
        return hi - lo

    def shifted(self, offset) -> "HexMesh":
        return replace(self, nodes=self.nodes + np.asarray(offset)[None, :])

    def rotated_axis_to_z(self, axis: int) -> "HexMesh":
        """Rotate 90 degrees so `axis` maps onto z (GridTools::rotate analog)."""
        nodes = self.nodes.copy()
        if axis == 2:
            return self
        if axis == 0:  # rotate about y: x -> z
            x, z = nodes[:, 0].copy(), nodes[:, 2].copy()
            nodes[:, 2], nodes[:, 0] = x, -z
        elif axis == 1:  # rotate about x: y -> z
            y, z = nodes[:, 1].copy(), nodes[:, 2].copy()
            nodes[:, 2], nodes[:, 1] = y, -z
        return replace(self, nodes=nodes)


def build_cuboid(
    x_length: float,
    y_length: float,
    z_length: float,
    x_cells: int,
    y_cells: int,
    z_cells: int,
) -> HexMesh:
    """Structured hex mesh of [0,xl]x[0,yl]x[0,zl] (dogbone.h:66-78)."""
    nx, ny, nz = x_cells + 1, y_cells + 1, z_cells + 1
    xs = np.linspace(0.0, x_length, nx)
    ys = np.linspace(0.0, y_length, ny)
    zs = np.linspace(0.0, z_length, nz)
    # node index = ix + nx*iy + nx*ny*iz (x fastest)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    nodes = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)

    def nid(ix, iy, iz):
        return ix + nx * (iy + ny * iz)

    cells = np.empty((x_cells * y_cells * z_cells, 8), dtype=np.int32)
    c = 0
    for iz in range(z_cells):
        for iy in range(y_cells):
            for ix in range(x_cells):
                verts = []
                for zb in (0, 1):
                    for yb in (0, 1):
                        for xb in (0, 1):
                            verts.append(nid(ix + xb, iy + yb, iz + zb))
                cells[c] = verts
                c += 1
    return HexMesh(nodes=nodes, cells=cells)


# GMSH element type 5 = 8-node hexahedron; gmsh vertex order ->
# bit order (x + 2y + 4z):
_GMSH_HEX_TO_BIT = np.array([0, 1, 3, 2, 4, 5, 7, 6])


def read_msh(path: str) -> HexMesh:
    """Minimal GMSH v2 ASCII reader for hex meshes (FE_problem_type.h:94-109).

    Reads $Nodes and the hexahedral entries of $Elements; other element
    types (points/lines/quads used for physical groups) are skipped.
    Uses the native C++ parser (native/scema_native.cpp) when built.
    """
    from ..native import read_msh_native

    native = read_msh_native(path)
    if native is not None:
        return _prune_unused(HexMesh(nodes=native[0], cells=native[1]))
    nodes = {}
    hexes = []
    with open(path) as f:
        lines = iter(f.read().splitlines())
    for line in lines:
        if line.startswith("$Nodes"):
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split()
                nodes[int(parts[0])] = [float(parts[1]), float(parts[2]), float(parts[3])]
        elif line.startswith("$Elements"):
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split()
                etype = int(parts[1])
                ntags = int(parts[2])
                conn = [int(p) for p in parts[3 + ntags:]]
                if etype == 5:
                    hexes.append(conn)
    if not hexes:
        raise ValueError(f"no hexahedra found in {path}")
    ids = sorted(nodes)
    remap = {gid: i for i, gid in enumerate(ids)}
    node_arr = np.asarray([nodes[g] for g in ids])
    cell_arr = np.asarray([[remap[g] for g in h] for h in hexes], dtype=np.int32)
    cell_arr = cell_arr[:, np.argsort(_GMSH_HEX_TO_BIT)]
    return _prune_unused(HexMesh(nodes=node_arr, cells=cell_arr))


def _prune_unused(mesh: HexMesh) -> HexMesh:
    """Drop nodes not referenced by any hex (gmsh files carry surface-only
    nodes, which would have zero lumped mass -> NaN velocities)."""
    used = np.unique(mesh.cells)
    remap = np.full(mesh.n_nodes, -1, dtype=np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)
    return HexMesh(nodes=mesh.nodes[used], cells=remap[mesh.cells])


def read_msh_quads(path: str) -> tuple[np.ndarray, np.ndarray]:
    """GMSH v2 ASCII reader for 2D quad meshes (element type 3).

    Returns (nodes (n, 3), quads (m, 4)) for extrusion
    (FE_problem_type.h:71-91 import_2Dmesh).
    """
    nodes = {}
    quads = []
    with open(path) as f:
        lines = iter(f.read().splitlines())
    for line in lines:
        if line.startswith("$Nodes"):
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split()
                nodes[int(parts[0])] = [float(parts[1]), float(parts[2]), float(parts[3])]
        elif line.startswith("$Elements"):
            n = int(next(lines))
            for _ in range(n):
                parts = next(lines).split()
                etype = int(parts[1])
                ntags = int(parts[2])
                conn = [int(p) for p in parts[3 + ntags:]]
                if etype == 3:
                    quads.append(conn)
    if not quads:
        raise ValueError(f"no quads found in {path}")
    ids = sorted(nodes)
    remap = {gid: i for i, gid in enumerate(ids)}
    node_arr = np.asarray([nodes[g] for g in ids])
    quad_arr = np.asarray([[remap[g] for g in q] for q in quads], dtype=np.int32)
    return node_arr, quad_arr


def extrude_quads_to_hexes(
    nodes2d: np.ndarray, quads: np.ndarray, length: float, n_layers: int
) -> HexMesh:
    """Extrude a 2D quad mesh along z (FE_problem_type.h:71-91 analog)."""
    n2 = nodes2d.shape[0]
    zs = np.linspace(0.0, length, n_layers + 1)
    nodes = np.concatenate(
        [
            np.concatenate([nodes2d[:, :2], np.full((n2, 1), z)], axis=1)
            for z in zs
        ],
        axis=0,
    )
    cells = []
    for k in range(n_layers):
        lo, hi = k * n2, (k + 1) * n2
        for q in quads:
            # quad vertices assumed counter-clockwise: map to bit order
            a, b, c, d = (int(v) for v in q)
            cells.append([lo + a, lo + b, lo + d, lo + c, hi + a, hi + b, hi + d, hi + c])
    return HexMesh(nodes=nodes, cells=np.asarray(cells, dtype=np.int32))


def reposition_for_dogbone(mesh: HexMesh) -> HexMesh:
    """Rotate longest axis to z, then shift so min z = 0 (dogbone.h:14-57)."""
    lens = [mesh.extent(a) for a in range(3)]
    if lens[0] > lens[1] and lens[0] > lens[2]:
        mesh = mesh.rotated_axis_to_z(0)
    elif lens[1] > lens[0] and lens[1] > lens[2]:
        mesh = mesh.rotated_axis_to_z(1)
    zmin, _ = mesh.limits(2)
    return mesh.shifted((0.0, 0.0, -zmin))
