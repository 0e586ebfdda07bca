"""Visualisation and analytics outputs: VTK XML, PVD time series, CSVs.

reference: FE_problem.h output stack —
* ``output_visualisation_solution`` (:2126-2254): per-rank .vtu + .pvtu/
  .visit/.pvd masters with displacement/velocity;
* ``output_visualisation_history`` (:2050-2121): qp history fields
  projected to the mesh (here: cell-averaged tensors as VTK cell data);
* ``output_lhistory`` (:1984-2045): per-qp strain/stress CSV;
* ``output_lbc_force`` (:1941-1980): loaded-boundary reaction-force CSV.

Single-process SPMD writes one .vtu per step (no per-rank sharding needed)
referenced from a .pvd collection.
"""
from __future__ import annotations

import os

import numpy as np

# bit-ordered hex vertices -> VTK_HEXAHEDRON (type 12) ordering
_BIT_TO_VTK = (0, 1, 3, 2, 4, 5, 7, 6)


def write_vtu(
    path: str,
    nodes: np.ndarray,
    cells: np.ndarray,
    point_data: dict[str, np.ndarray] | None = None,
    cell_data: dict[str, np.ndarray] | None = None,
) -> None:
    """ASCII VTK XML unstructured grid of hexahedra."""
    nodes = np.asarray(nodes)
    cells = np.asarray(cells)[:, _BIT_TO_VTK]
    n_pts, n_cells = len(nodes), len(cells)

    def data_arrays(data, n_expected):
        out = []
        for name, arr in (data or {}).items():
            arr = np.asarray(arr)
            if arr.ndim == 1:
                arr = arr[:, None]
            assert arr.shape[0] == n_expected, (name, arr.shape, n_expected)
            ncomp = arr.shape[1]
            body = "\n".join(" ".join(f"{v:.9g}" for v in row) for row in arr)
            out.append(
                f'<DataArray type="Float64" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii">\n{body}\n</DataArray>'
            )
        return "\n".join(out)

    points = "\n".join(" ".join(f"{v:.9g}" for v in p) for p in nodes)
    conn = "\n".join(" ".join(str(v) for v in c) for c in cells)
    offsets = " ".join(str(8 * (i + 1)) for i in range(n_cells))
    types = " ".join("12" for _ in range(n_cells))

    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
<UnstructuredGrid>
<Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">
<Points>
<DataArray type="Float64" NumberOfComponents="3" format="ascii">
{points}
</DataArray>
</Points>
<Cells>
<DataArray type="Int32" Name="connectivity" format="ascii">
{conn}
</DataArray>
<DataArray type="Int32" Name="offsets" format="ascii">
{offsets}
</DataArray>
<DataArray type="UInt8" Name="types" format="ascii">
{types}
</DataArray>
</Cells>
<PointData>
{data_arrays(point_data, n_pts)}
</PointData>
<CellData>
{data_arrays(cell_data, n_cells)}
</CellData>
</Piece>
</UnstructuredGrid>
</VTKFile>
"""
    with open(path, "w") as f:
        f.write(xml)


def write_pvd(path: str, entries: list[tuple[float, str]]) -> None:
    """ParaView .pvd collection (the reference's .pvd master,
    FE_problem.h:2232-2253)."""
    lines = [
        '<?xml version="1.0"?>',
        '<VTKFile type="Collection" version="0.1" byte_order="LittleEndian">',
        "<Collection>",
    ]
    for t, fname in entries:
        lines.append(f'<DataSet timestep="{t:.10g}" group="" part="0" file="{fname}"/>')
    lines += ["</Collection>", "</VTKFile>", ""]
    with open(path, "w") as f:
        f.write("\n".join(lines))


class OutputWriter:
    """Stateful output manager for an HMM run (frequencies from config
    'output data', dealammps.cc:286-291)."""

    def __init__(self, outdir: str, nodes: np.ndarray, cells: np.ndarray):
        self.outdir = outdir
        self.nodes = np.asarray(nodes)
        self.cells = np.asarray(cells)
        self.pvd_entries: list[tuple[float, str]] = []
        os.makedirs(outdir, exist_ok=True)
        self._lbc_path = os.path.join(outdir, "loaded_boundary_force.csv")
        with open(self._lbc_path, "w") as f:
            f.write("timestep,time,reaction_force\n")

    def write_visualisation(self, fe_state, timestep: int, time: float) -> str:
        n_qp_per_cell = len(np.asarray(fe_state.qp.new_strain)) // len(self.cells)
        u = np.asarray(fe_state.u).reshape(-1, 3)
        v = np.asarray(fe_state.v).reshape(-1, 3)
        strain = np.asarray(fe_state.qp.new_strain).reshape(len(self.cells), n_qp_per_cell, 6)
        stress = np.asarray(fe_state.qp.new_stress).reshape(len(self.cells), n_qp_per_cell, 6)
        mat = np.asarray(fe_state.qp.material).reshape(len(self.cells), n_qp_per_cell)
        fname = f"solution-{timestep:06d}.vtu"
        point_data = {"displacement": u, "velocity": v}
        cell_data = {
            "strain": strain.mean(axis=1),
            "stress": stress.mean(axis=1),
            "material": mat[:, 0].astype(float),
            "von_mises": _von_mises(stress.mean(axis=1)),
        }
        # production-size meshes use the native binary-appended writer
        # (native/scema_native.cpp); small meshes stay human-readable ASCII
        path = os.path.join(self.outdir, fname)
        wrote = False
        if len(self.cells) >= 4096:
            from ..native import write_vtu_native

            wrote = write_vtu_native(path, self.nodes, self.cells, point_data, cell_data)
        if not wrote:
            write_vtu(path, self.nodes, self.cells, point_data, cell_data)
        self.pvd_entries.append((time, fname))
        write_pvd(os.path.join(self.outdir, "solution.pvd"), self.pvd_entries)
        return fname

    def write_lbc_force(self, timestep: int, time: float, force: float) -> None:
        with open(self._lbc_path, "a") as f:
            f.write(f"{timestep},{time:.10g},{force:.10g}\n")

    def write_lhistory(self, fe_state, timestep: int) -> str:
        """Per-qp analytics CSV (pr_<p>.lhistory.csv analog)."""
        path = os.path.join(self.outdir, f"lhistory-{timestep:06d}.csv")
        strain = np.asarray(fe_state.qp.new_strain)
        stress = np.asarray(fe_state.qp.new_stress)
        with open(path, "w") as f:
            f.write(
                "qp,eps_xx,eps_yy,eps_zz,eps_xy,eps_xz,eps_yz,"
                "sig_xx,sig_yy,sig_zz,sig_xy,sig_xz,sig_yz\n"
            )
            for q in range(strain.shape[0]):
                row = ",".join(f"{x:.9g}" for x in np.concatenate([strain[q], stress[q]]))
                f.write(f"{q},{row}\n")
        return path


def _von_mises(sig6: np.ndarray) -> np.ndarray:
    xx, yy, zz, xy, xz, yz = (sig6[:, k] for k in range(6))
    return np.sqrt(
        0.5 * ((xx - yy) ** 2 + (yy - zz) ** 2 + (zz - xx) ** 2)
        + 3.0 * (xy**2 + xz**2 + yz**2)
    )
